package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, NumericType}

/** Optimizer rule: a filter on a CASE expression with boolean-literal
  * branch values — the shape Catalyst itself produces from
  * `bucket_column = 'literal'` when the bucket is a CASE banding
  * (reference `stg_arrears_daily.sql:14-20`) — is rewritten into the flat
  * AND/OR/NOT combination of the branch conditions.
  *
  * Why it matters at scale: the CASE form is opaque to data-source filter
  * translation, so `WHERE dpd_bucket = '90+'` over a staging model scans
  * EVERY row group of a 100 TB snapshot table; the rewritten form is
  * ordinary comparisons on the underlying column, which reach
  * `PushedFilters` and let parquet skip row groups / pages. Catalyst's
  * own BooleanSimplification then collapses the Not-chains (e.g. to
  * `days_past_due > 90`) in the same fixed-point batch.
  *
  * Null soundness: CASE treats a NULL condition as not-matched and falls
  * through to ELSE, while in a boolean expression NULL propagates. The
  * rewrite is therefore gated on every branch condition being a
  * null-intolerant tree over ONE common attribute — then a condition is
  * NULL iff the attribute is NULL, and a single `IsNull(attr)` disjunct
  * (emitted only when the ELSE value is true) reproduces the
  * fall-through exactly. CaseWhens are only rewritten in the positive
  * AND/OR tree of a Filter condition, where NULL and FALSE are
  * indistinguishable (both drop the row); under a NOT they differ, so
  * those are left alone.
  *
  * Registered through [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`).
  */
object SimplifyLiteralCaseFilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = rewriteTop(cond)
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }

  /** Descend only through the positive AND/OR structure (see object doc). */
  private def rewriteTop(e: Expression): Expression = e match {
    case And(l, r) => And(rewriteTop(l), rewriteTop(r))
    case Or(l, r) => Or(rewriteTop(l), rewriteTop(r))
    case cw: CaseWhen => rewriteCase(cw).getOrElse(cw)
    case other => other
  }

  /** "NULL iff the attribute is NULL" needs more than Spark's
    * `nullIntolerant` flag: that only promises null-in → null-out, NOT
    * non-null-in → non-null-out. Extraction nodes (a stored null struct
    * field), `Divide`/`Pmod` (x/0 → NULL), string casts and null
    * literals all produce NULL from non-null inputs while flying a
    * nullIntolerant flag somewhere in the tree. So the gate is a
    * WHITELIST of expressions that provably cannot introduce a null:
    * attributes, non-null literals, comparisons, overflow-free
    * arithmetic, floor/ceil/abs/negate, and NON-DECIMAL numeric→numeric
    * casts. Decimal is excluded everywhere a value is computed: with
    * ANSI off, decimal casts and decimal add/subtract/multiply NULL on overflow
    * (integer/float ops wrap or go infinite instead, and ANSI throws —
    * neither yields NULL). */
  private def safeNum(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.isInstanceOf[NumericType] && !dt.isInstanceOf[org.apache.spark.sql.types.DecimalType]

  private def nullIntolerantTree(e: Expression): Boolean = e match {
    case _: Attribute => true
    case l: Literal => l.value != null
    case c: Cast =>
      safeNum(c.child.dataType) && safeNum(c.dataType) && nullIntolerantTree(c.child)
    case _: EqualTo | _: LessThan | _: LessThanOrEqual |
         _: GreaterThan | _: GreaterThanOrEqual =>
      e.deterministic && e.children.forall(nullIntolerantTree)
    case _: Add | _: Subtract | _: Multiply | _: UnaryMinus |
         _: Floor | _: Ceil | _: Abs =>
      safeNum(e.dataType) && e.deterministic && e.children.forall(nullIntolerantTree)
    case _ => false
  }

  private def rewriteCase(cw: CaseWhen): Option[Expression] = {
    if (cw.branches.isEmpty) return None
    val branchVals: Seq[Option[Boolean]] = cw.branches.map(_._2 match {
      case Literal(v: Boolean, BooleanType) => Some(v)
      case _ => None
    })
    val elseVal: Option[Boolean] = cw.elseValue match {
      case None => Some(false) // NULL result ≡ FALSE in a positive filter context
      case Some(Literal(null, BooleanType)) => Some(false)
      case Some(Literal(v: Boolean, BooleanType)) => Some(v)
      case _ => None
    }
    if (branchVals.exists(_.isEmpty) || elseVal.isEmpty) return None
    val conds = cw.branches.map(_._1)
    // EVERY condition must reference exactly the one shared attribute —
    // a collective check would admit a reference-free condition (never
    // NULL even when the attribute is), breaking the invariant
    val refSets = conds.map(_.references)
    if (refSets.exists(_.size != 1) || refSets.map(_.head.exprId).distinct.size != 1)
      return None
    if (!conds.forall(nullIntolerantTree)) return None
    val attr = refSets.head.head

    val nots = conds.map(Not(_))
    // branch i fires iff no earlier condition matched and c_i is true
    val hits = branchVals.zipWithIndex.collect { case (Some(true), i) =>
      (nots.take(i) :+ conds(i)).reduce(And)
    }
    val elseHits =
      if (elseVal.contains(true)) Seq(nots.reduce(And), IsNull(attr)) else Nil
    val all = hits ++ elseHits
    Some(if (all.isEmpty) Literal.FalseLiteral else all.reduce(Or))
  }
}
