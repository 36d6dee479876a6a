package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.DotProduct

/** The library's `SparkSessionExtensions` installer — the supported way
  * to ship Catalyst extensions to a cluster you don't own: set
  * `spark.sql.extensions=graft.GraftExtensions` and every session gets
  *
  *  - [[graft.plans.SimplifyLiteralCaseFilter]], the optimizer rule that
  *    turns bucket-predicate filters (`dpd_bucket = '90+'` over a CASE
  *    banding) into pushdown-able range comparisons;
  *  - `graft_dot(array<float>, array<float>)` as a SQL-callable function
  *    (the [[DotProduct]] codegen expression), so the pure-SQL surface
  *    can run the embedding math with the same plan the DataFrame API
  *    gets.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.SimplifyLiteralCaseFilter)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_dot takes 2 arguments, got ${children.size}")
        DotProduct(children(0), children(1))
      }))
  }
}
