// This file lives under org.apache.spark.sql (the conventional home for
// third-party Catalyst plan nodes) because the whole-operator extension
// surface (Dataset.ofRows, ExpressionUtils, SparkStrategy planning) is
// private[sql]/private[spark]. It is graft's code, not Spark's.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY.md §4.4 level (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, injected via
  * `SparkSessionExtensions.injectPlannerStrategy`): top-k rows per group.
  *
  * Honest rationale vs the DataFrame/SQL spelling (re-measured r21 —
  * the r20 claim that the window "shuffles EVERY row" was overstated):
  * since Spark 3.5, `row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * gets a map-side `WindowGroupLimit(Partial)` that already prunes each
  * partition to k rows per group BEFORE the exchange, so the shuffled
  * byte count is the same for both spellings. The remaining difference
  * is the map-side mechanism: WindowGroupLimit SORTS each input
  * partition (O(n log n) per partition), this operator keeps a
  * hash-of-bounded-heaps (O(n log k), no sort). A 2×2 idle-box A/B on
  * the ten knn_cosine searchers at sf0.1 measured PARITY within noise
  * (heap totals 24.36/26.39 s vs window 24.71/26.97 s) — the heap is
  * kept as default for the asymptotic no-sort argument at 100 TB
  * partition sizes, and `SPARK_GRAFT_WINDOW_TOPK=1` switches the
  * searchers back to the window spelling (identical rows: every call
  * site supplies a total order). This operator plans as two physical
  * stages mirroring partial aggregation:
  *
  *   TopKPerGroupExec(final)      — per-group bounded heap, post-shuffle
  *     +- Exchange hashpartitioning(groupExprs)   [inserted by
  *     |    EnsureRequirements via requiredChildDistribution]
  *     +- TopKPerGroupExec(partial) — per-group bounded heap, MAP-SIDE
  *
  * The map-side stage prunes each input partition to at most k rows per
  * group before anything shuffles — correct because the global top-k of
  * a group is contained in the union of per-partition top-k's (the same
  * containment that justifies partial min/max). At 100 TB with bounded k
  * and group cardinality ≪ row count, the exchange moves
  * O(groups·k·partitions) rows instead of O(rows): for the canonical
  * "latest k observations per loan" query the shuffle shrinks by the
  * observations-per-loan/k ratio (~180/3 at reference snapshot density).
  *
  * Memory contract: one (group-key, k-row heap) entry per DISTINCT group
  * per task — the same working-set shape as hash aggregation, spill-free
  * by the bounded k. Ties: callers must supply a TOTAL order (every
  * registered query does) or ties at rank k resolve arbitrarily — same
  * contract as the reference's `row_number` dedup (SURVEY §2.6 W1).
  */
object TopKPerGroup {

  /** Public entry: `topK(df, Seq(col("g")), Seq(col("v").desc), 3)`.
    * Unresolved columns are fine — the analyzer resolves expressions in
    * custom nodes like in any built-in operator. */
  def topK(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(orderBy.nonEmpty, "orderBy must be non-empty")
    // EAGER ColumnNode→Expression conversion: ExpressionUtils.expression
    // would hand back a lazy ColumnNodeExpression wrapper, which survives
    // into the physical plan's task closure and is not serializable (the
    // analyzer converts wrappers only at the Dataset API boundary, not
    // inside hand-built plan nodes)
    val groupExprs = groupBy.map(c => ColumnNodeToExpressionConverter(c.node))
    val order = orderBy.map(c => ColumnNodeToExpressionConverter(c.node)).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    Dataset.ofRows(spark,
      TopKPerGroupPlan(groupExprs, order, k, df.queryExecution.analyzed))
  }
}

case class TopKPerGroupPlan(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Plans the logical node as final-over-partial with the exchange left
  * to EnsureRequirements (so AQE still owns partition counts). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      val ordering = RowOrdering.create(orderE, schema)
      // max-heap under the sort order: the root is the WORST row kept,
      // so a better-than-root incoming row replaces it in O(log k)
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        // the projection reuses its output buffer — copy only when the
        // key is first seen; stored rows are copies for the same reason
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, cmp)
          heaps.put(key.copy(), q)
        }
        if (q.size < kk) q.add(row.copy())
        else if (ordering.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }
      // heap emission order is arbitrary; per-group rank, if wanted,
      // is a cheap downstream sort over ≤ groups·k rows
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }
}
