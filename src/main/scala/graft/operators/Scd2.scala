package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD-2 dimension maintenance: merge an incoming attribute snapshot
  * into a slowly-changing dimension (the `MERGE`/dbt-snapshot semantics
  * the reference's warehouse world implies — dbt `snapshot` blocks
  * produce exactly this valid_from/valid_to/is_current shape — but no
  * existing operator here exposed as a reusable transform).
  *
  * Contract: `dim` carries `key`, the tracked `attrs`, `valid_from`
  * (date), `valid_to` (date, NULL = open) and `is_current` (boolean);
  * `incoming` carries `key` + `attrs`, every row effective at
  * `effectiveDate`. One incoming row per key (assert upstream — two
  * versions of a key in one batch have no defined order).
  *
  * Merge outcome per key:
  *  - closed history rows pass through untouched (they never join);
  *  - current row, no incoming row → unchanged (absence is not delete);
  *  - current row, incoming attrs all equal (null-safe) → unchanged;
  *  - current row, any attr differs → the current version closes at
  *    `effectiveDate` AND a new open version starts there;
  *  - incoming key with no current row (brand-new, or all versions
  *    already closed) → a new open version.
  *
  * Scale shape: ONE equi-join shuffle on the key — only the CURRENT
  * slice joins (history is a filter + union, no exchange), and the
  * incoming batch is typically the small side (AQE broadcasts it). The
  * 1-or-2 output rows per matched key are produced in the SAME pass by
  * exploding a computed struct array — no second join, no second
  * shuffle, so the merge costs what one fact×dim join costs at any
  * scale. */
object Scd2 {

  def merge(dim: DataFrame, incoming: DataFrame, key: String,
      attrs: Seq[String], effectiveDate: Column): DataFrame = {
    val outCols = (key +: attrs) ++ Seq("valid_from", "valid_to", "is_current")
    require(outCols.forall(dim.columns.contains),
      s"dim must carry ${outCols.mkString(", ")}; has ${dim.columns.mkString(", ")}")
    require((key +: attrs).forall(incoming.columns.contains),
      s"incoming must carry ${(key +: attrs).mkString(", ")}; has ${incoming.columns.mkString(", ")}")

    val cur  = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    val inc = incoming.select(
      col(key).as("__i_key") +: attrs.map(a => col(a).as(s"__i_$a")): _*)

    val j = cur.join(inc, col(key) === col("__i_key"), "full_outer")
    val matched  = col(key).isNotNull && col("__i_key").isNotNull
    val changed  = attrs.map(a => !(col(a) <=> col(s"__i_$a"))).reduce(_ || _)

    def ver(k: Column, attrCols: Seq[Column], from: Column, to: Column,
        current: Column): Column =
      struct((k.as(key) +: attrCols.zip(attrs).map { case (c, a) => c.as(a) }) ++
        Seq(from.as("valid_from"), to.as("valid_to"), current.as("is_current")): _*)

    val keep = ver(col(key), attrs.map(col),
      col("valid_from"), col("valid_to"), col("is_current"))
    val closedOld = ver(col(key), attrs.map(col),
      col("valid_from"), effectiveDate, lit(false))
    val openNew = ver(coalesce(col(key), col("__i_key")),
      attrs.map(a => col(s"__i_$a")), effectiveDate, lit(null).cast("date"), lit(true))

    // 1-or-2 rows per joined key, chosen once, emitted in one pass
    val versions =
      when(matched && changed, array(closedOld, openNew))
        .when(matched, array(keep))            // equal attrs → no-op
        .when(col("__i_key").isNull, array(keep)) // current, nothing incoming
        .otherwise(array(openNew))             // incoming only → insert
    j.select(explode(versions).as("__v"))
      .select(outCols.map(c => col(s"__v.$c").as(c)): _*)
      .unionByName(hist)
  }
}
