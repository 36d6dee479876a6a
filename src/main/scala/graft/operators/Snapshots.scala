package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CreditFunctions.monthOf

/** Snapshot / time-series operators shared across the marts.
  *
  * The core idiom is the month-end dedup (reference W1: `row_number() over
  * (partition by loan_id, date_trunc('month',as_of_date) order by
  * as_of_date desc) ... where rn = 1`, duplicated verbatim in
  * fct_roll_rate_monthly.sql:1-12, fct_cure_rate_monthly.sql:1-12 and
  * fct_vintage_mob.sql:1-11). We build it ONCE and reuse the resulting
  * DataFrame — Catalyst will not merge three textually separate
  * window+shuffle subtrees, so sharing here removes two full shuffles
  * (SURVEY.md §4.3). At 100 TB the window shuffle partitions by
  * (loan_id, month), which is also the natural downstream join/agg key,
  * so the exchange is reused by AQE rather than repeated.
  */
object Snapshots {

  /** Keep the top-1 row per group under `orderBy` (descending-priority
    * columns supplied by the caller, who must make the ordering TOTAL —
    * nondeterministic ties would break oracle parity; SURVEY.md §4.3).
    */
  def topOnePerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    // Collision-safe internal name: a caller-supplied `rn` column must
    // survive the dedup untouched.
    val rn = "__graft_rn"
    require(!df.columns.contains(rn), s"input already has internal column $rn")
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Month-end snapshot: last row per (idCol, month(dateCol)).
    * `tiebreakers` extend the `dateCol desc` ordering to a total order
    * when (id, date) is not unique (the reference's arrears table is
    * unique per (loan_id, as_of_date) so it needs none; the events-analog
    * passes ts/event_id). Adds a `month` DateType column (fails fast if
    * the input already carries one — silent overwrite would corrupt it).
    */
  def monthEnd(df: DataFrame, idCol: Column, dateCol: Column, tiebreakers: Column*): DataFrame = {
    require(!df.columns.contains("month"), "input already has a `month` column")
    topOnePerGroup(
      df.withColumn("month", monthOf(dateCol)),
      partitionBy = Seq(idCol, col("month")),
      orderBy = dateCol.desc +: tiebreakers.map(_.desc)
    )
  }

  /** Reference W2: previous observed-month value per id —
    * `lag(valueCol) over (partition by id order by month)`. A calendar gap
    * makes "prev" the last OBSERVED month, faithfully to the reference
    * (fct_roll_rate_monthly.sql:17; do not "fix" gaps — SURVEY.md §7.3.5).
    */
  def withPrev(df: DataFrame, idCol: Column, monthCol: Column, valueCol: Column, prevName: String): DataFrame =
    df.withColumn(prevName, lag(valueCol, 1).over(Window.partitionBy(idCol).orderBy(monthCol)))

  /** Daily densification (reference G8/D5: one row per day from `startCol`
    * to `endCol` inclusive, generator loop pg_oltp_synth.py:667-692) as a
    * relational explode — no driver-side loops, scales linearly with
    * output rows. Caller guarantees endCol >= startCol.
    */
  def densifyDaily(df: DataFrame, startCol: Column, endCol: Column, dayName: String): DataFrame =
    df.withColumn(dayName, explode(sequence(startCol, endCol)))

  /** Linear interpolation between sparse daily observations: for each
    * key, every calendar day between consecutive observed days gets a
    * value on the straight line joining them (the time-series gap-fill a
    * metrics mart wants when the upstream only emits on-change rows;
    * complements [[densifyDaily]], which carries values forward).
    *
    * Determinism contract: `valueCol` must be EXACT (integer — cents,
    * counts), because the interpolated double is defined as
    * `v0 + ((v1-v0)*(day-d0)) / (d1-d0)` with the numerator computed in
    * exact int64 and ONE IEEE division — bit-reproducible by any engine
    * that follows the same formula, unlike a naive `v0 + (v1-v0)*frac`
    * chain whose two roundings depend on evaluation order.
    *
    * Shape: one (key, date) window exchange for lead(), then a narrow
    * per-row explode of `sequence(0, gap-1)` — output scales with emitted
    * days, never materializing a calendar×keys cross join. The final
    * observation of each key closes its own segment (offset-0 only).
    * Input must be unique per (key, date) — aggregate first; duplicate
    * dates degrade to pass-through rows (guarded below), not phantoms. */
  def interpolateDaily(df: DataFrame, keyCol: Column, dateCol: Column,
      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("d0"))
    val withNext = df.select(
        keyCol.as("k"), dateCol.as("d0"), valueCol.cast("long").as("v0"))
      .withColumn("d1", lead(col("d0"), 1).over(w))
      .withColumn("v1", lead(col("v0"), 1).over(w))
    val gap = datediff(col("d1"), col("d0"))
    withNext
      // gap <= 0 (duplicate (key, date) input rows — a contract breach)
      // degrades to offset-0 pass-through rather than feeding
      // sequence(0, -1), whose inferred NEGATIVE step would emit a
      // phantom day-before-observation row
      .withColumn("off",
        explode(when(col("d1").isNull || gap <= 0, sequence(lit(0), lit(0)))
          .otherwise(sequence(lit(0), gap - 1))))
      .select(
        col("k"),
        date_add(col("d0"), col("off")).as("day"),
        // offset 0 short-circuits to v0 exactly (also covers the last
        // observation of a key, where d1/gap are NULL)
        when(col("off") === 0, col("v0").cast("double"))
          .otherwise(col("v0").cast("double") +
            ((col("v1") - col("v0")) * col("off")).cast("double") /
              datediff(col("d1"), col("d0")).cast("double"))
          .as("value_interp"),
        (col("off") === 0).as("is_observed"))
  }

  /** Gaps-and-islands interval compression: collapse consecutive rows
    * with an unchanged state into one validity range — daily snapshots
    * become SCD-2-style (state, valid_from, valid_to, n_rows) intervals,
    * the compaction a daily fact wants at scale (a loan that sits in one
    * DPD bucket for a year is 365 rows of storage for one fact).
    *
    * Shape: change marker (null-safe lag compare) + running change count
    * (the island id) share ONE (keys, order) window exchange, and the
    * island groupBy's clustering is satisfied by that same partitioning
    * (keys ⊆ group keys), so the whole operator is a single shuffle.
    * State comparison is null-safe (`<=>`): a NULL state equals itself,
    * so all-NULL runs compress too. `orderCol` must be unique per key
    * (snapshot grain). */
  def compressIntervals(df: DataFrame, keys: Seq[String], orderCol: String,
      stateCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && stateCols.nonEmpty, "keys and stateCols must be non-empty")
    val island = "__graft_island"
    val chg = "__graft_chg"
    val outNames = Seq("valid_from", "valid_to", "n_rows")
    require(!df.columns.exists(c => c == island || c == chg),
      "input already has internal island columns")
    require(!df.columns.exists(outNames.contains),
      s"input already has one of the output columns ${outNames.mkString(", ")} — " +
        "rename it first (re-compressing an SCD-2 frame needs fresh names)")
    val state = struct(stateCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val run = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn(chg,
        when(lag(state, 1).over(w) <=> state, lit(0L)).otherwise(lit(1L)))
      .withColumn(island, sum(col(chg)).over(run))
      .groupBy((keys ++ stateCols).map(col) :+ col(island): _*)
      .agg(
        min(col(orderCol)).as("valid_from"),
        max(col(orderCol)).as("valid_to"),
        count(lit(1)).as("n_rows"))
      .drop(island)
  }
}
