package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: the audit diff between two keyed snapshots of
  * the same relation (source vs replicated mart, yesterday vs today, two
  * pipeline versions) — the dbt-audit / data-diff shape.
  *
  * Emits one row per DIVERGENT key only — `added` (right only),
  * `removed` (left only), `changed` (both sides, any tracked attr
  * differs null-safely) with the offending column names — so the output
  * is proportional to the drift, not the table. Identical rows never
  * leave the join.
  *
  * Scale shape: one full-outer equi-join on the key — both sides shuffle
  * once on their natural key, the comparison is a narrow projection, and
  * there is no per-attr re-join (the N attr comparisons ride the same
  * joined row). At 100 TB this is the cheapest exact diff available;
  * pair it with a partition filter to reconcile one day/month slice. */
object Reconcile {

  def diff(left: DataFrame, right: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    require((key +: attrs).forall(left.columns.contains),
      s"left must carry ${(key +: attrs).mkString(", ")}; has ${left.columns.mkString(", ")}")
    require((key +: attrs).forall(right.columns.contains),
      s"right must carry ${(key +: attrs).mkString(", ")}; has ${right.columns.mkString(", ")}")
    val l = left.select(col(key).as("__l_key") +: attrs.map(a => col(a).as(s"__l_$a")): _*)
    val r = right.select(col(key).as("__r_key") +: attrs.map(a => col(a).as(s"__r_$a")): _*)
    val j = l.join(r, col("__l_key") === col("__r_key"), "full_outer")
    val anyChanged = attrs.map(a => !(col(s"__l_$a") <=> col(s"__r_$a"))).reduce(_ || _)
    // concat_ws drops NULL pieces, so equal attrs vanish from the list
    val changedCols = concat_ws(",",
      attrs.map(a => when(!(col(s"__l_$a") <=> col(s"__r_$a")), lit(a))): _*)
    j.filter(col("__l_key").isNull || col("__r_key").isNull || anyChanged)
      .select(
        coalesce(col("__l_key"), col("__r_key")).as(key),
        when(col("__l_key").isNull, lit("added"))
          .when(col("__r_key").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change_type"),
        when(col("__l_key").isNotNull && col("__r_key").isNotNull, changedCols)
          .otherwise(lit("")).as("changed_cols"))
  }
}
