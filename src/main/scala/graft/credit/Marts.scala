package graft.credit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CreditFunctions._
import graft.operators.Snapshots

/** The seven fact transforms of the reference mart layer
  * (dbt/credit_mart/models/marts/&#42;.sql), re-expressed as pure
  * DataFrame->DataFrame functions over canonical staging schemas:
  *
  *   arrears : loan_id, as_of_date date, days_past_due int,
  *             dpd_bucket string, npl_flag boolean [, tiebreaker cols]
  *   loans   : loan_id, product_type, currency, origination_date date,
  *             exposure decimal [, ...]
  *   payments: loan_id, payment_date date, currency,
  *             amount_received decimal
  *   writeoff: loan_id, writeoff_date date, recovery_date date?,
  *             writeoff_amount_{principal,interest,fees} decimal?,
  *             recovery_amount decimal?
  *
  * Because the transforms are plain function composition, Catalyst inlines
  * the whole tree and re-optimizes per query — exactly like Postgres
  * inlining the reference's layered views (SURVEY.md §3 EP2).
  *
  * Scale posture (100 TB):
  *  - the loans dim is small relative to the snapshot fact, but broadcast
  *    is left to AQE/`autoBroadcastJoinThreshold` (no forced hint): small
  *    dim -> BHJ with no fact shuffle; oversized dim -> graceful shuffle
  *    join instead of an OOM;
  *  - monthly aggregates group by (month, product, currency) — tiny result
  *    cardinality, partial aggregation map-side combines before the
  *    exchange;
  *  - the month-end dedup window is computed once and shared by
  *    roll/cure/vintage (see [[graft.operators.Snapshots.monthEnd]]).
  *
  * Money sums are computed exactly in DecimalType and converted to double
  * only in the final projection — one deterministic IEEE conversion, no
  * order-dependent float accumulation (oracle bit-parity, SURVEY.md §7.3.1).
  */
object Marts {

  /** fct_dpd_daily.sql:1-14 — arrears snapshots enriched with the loan dim
    * (inner equi-join USING(loan_id), J1 + rename projection P8), matching
    * the reference column set exactly: as_of_date, loan_id, borrower_id,
    * product_type, currency, origination_date, exposure, days_past_due,
    * dpd_bucket, npl_flag, past_due_amount_total.
    *
    * No forced `broadcast()`: at 100 TB the loan dim is not guaranteed to
    * fit an executor, and an explicit hint bypasses AQE's size check —
    * `autoBroadcastJoinThreshold`/AQE still picks BHJ when the dim is
    * actually small, and degrades to a shuffle join instead of OOM when
    * it is not. */
  def dpdDaily(arrears: DataFrame, loans: DataFrame): DataFrame =
    arrears.join(
      loans.select(
        col("loan_id"), col("borrower_id"), col("product_type"), col("currency"),
        col("origination_date"), col("exposure")),
      Seq("loan_id"), "inner")
      .select(
        col("as_of_date"), col("loan_id"), col("borrower_id"),
        col("product_type"), col("currency"), col("origination_date"),
        col("exposure"), col("days_past_due"), col("dpd_bucket"),
        col("npl_flag"), col("past_due_amount_total"))

  /** fct_npl_monthly.sql — monthly exposure + NPL exposure + guarded ratio
    * (A1/A2/A6, D1). Input is the dpdDaily fact. */
  def nplMonthly(dpd: DataFrame): DataFrame =
    dpd
      .groupBy(
        monthOf(col("as_of_date")).as("month"),
        col("product_type"), col("currency"))
      .agg(
        sum(col("exposure")).as("total_exposure_dec"),
        sum(when(col("npl_flag"), col("exposure")).otherwise(lit(0))).as("npl_exposure_dec"))
      .select(
        col("month"), col("product_type"), col("currency"),
        col("total_exposure_dec").cast(DoubleType).as("total_exposure"),
        col("npl_exposure_dec").cast(DoubleType).as("npl_exposure"),
        guardedRatio(col("npl_exposure_dec"), col("total_exposure_dec")).as("npl_ratio"))

  /** The shared month-end snapshot (W1) with observed-month lag (W2):
    * loan_id, month, prev_bucket, curr_bucket — the common input of
    * roll-rate and cure-rate. `tiebreakers` make the intra-day order
    * total when (loan_id, as_of_date) is not unique. */
  def bucketTransitions(arrears: DataFrame, tiebreakers: Column*): DataFrame = {
    val me = Snapshots.monthEnd(arrears, col("loan_id"), col("as_of_date"), tiebreakers: _*)
    Snapshots
      .withPrev(me.select(col("loan_id"), col("month"), col("dpd_bucket")),
        col("loan_id"), col("month"), col("dpd_bucket"), "prev_bucket")
      .select(col("loan_id"), col("month"), col("prev_bucket"), col("dpd_bucket").as("curr_bucket"))
      .filter(col("prev_bucket").isNotNull)
  }

  /** fct_roll_rate_monthly.sql — transition counts by (month, prev, curr). */
  def rollRateMonthly(transitions: DataFrame): DataFrame =
    transitions
      .groupBy(col("month"), col("prev_bucket"), col("curr_bucket"))
      .agg(count(lit(1)).as("loans_cnt"))

  /** fct_cure_rate_monthly.sql — filtered counts (A4) + guarded ratio. */
  def cureRateMonthly(transitions: DataFrame): DataFrame =
    transitions
      .groupBy(col("month"))
      .agg(
        count(when(col("prev_bucket") =!= "0", lit(1))).as("prev_delinquent_cnt"),
        count(when(col("prev_bucket") =!= "0" && col("curr_bucket") === "0", lit(1))).as("cured_cnt"))
      .select(
        col("month"), col("prev_delinquent_cnt"), col("cured_cnt"),
        guardedRatio(col("cured_cnt"), col("prev_delinquent_cnt")).as("cure_rate"))

  /** fct_vintage_mob.sql — origination-quarter cohort curves by
    * months-on-book (D2/D3, A5/A6). Takes the shared month-end snapshot. */
  def vintageMob(monthEnd: DataFrame, loans: DataFrame): DataFrame =
    monthEnd
      .select(col("loan_id"), col("month"), col("days_past_due"))
      .join(loans.select(col("loan_id"), col("origination_date")), Seq("loan_id"), "inner")
      .select(
        quarterOf(col("origination_date")).as("cohort_q"),
        monthsOnBook(col("month"), col("origination_date")).as("mob"),
        (col("days_past_due") > 0).as("delinquent_flag"),
        (col("days_past_due") > 90).as("npl_flag"))
      .filter(col("mob") >= 0)
      .groupBy(col("cohort_q"), col("mob"))
      .agg(
        count(lit(1)).as("loans_cnt"),
        sum(flagAsInt(col("delinquent_flag"))).as("delinquent_cnt"),
        sum(flagAsInt(col("npl_flag"))).as("npl_cnt"))
      .select(
        col("cohort_q"), col("mob"), col("loans_cnt"),
        col("delinquent_cnt"), col("npl_cnt"),
        guardedRatio(col("delinquent_cnt"), col("loans_cnt")).as("delinquent_rate"),
        guardedRatio(col("npl_cnt"), col("loans_cnt")).as("npl_rate"))

  /** fct_writeoff_recovery_monthly.sql — coalesced-date monthly rollup of
    * coalesced amount parts (P4/A7/A8). */
  def writeoffRecoveryMonthly(writeoff: DataFrame): DataFrame =
    writeoff
      .groupBy(monthOf(coalesce(col("recovery_date"), col("writeoff_date"))).as("month"))
      .agg(
        sum(coalesce(col("writeoff_amount_principal"), lit(0))
          + coalesce(col("writeoff_amount_interest"), lit(0))
          + coalesce(col("writeoff_amount_fees"), lit(0))).as("writeoff_total_dec"),
        sum(coalesce(col("recovery_amount"), lit(0))).as("recovery_total_dec"))
      .select(
        col("month"),
        col("writeoff_total_dec").cast(DoubleType).as("writeoff_total"),
        col("recovery_total_dec").cast(DoubleType).as("recovery_total"))

  /** fct_collections_monthly.sql — payments enriched with the loan dim,
    * monthly collected amount by (month, product_type, currency) (J3/A8). */
  def collectionsMonthly(payments: DataFrame, loans: DataFrame): DataFrame =
    payments
      .join(loans.select(col("loan_id"), col("product_type")), Seq("loan_id"), "inner")
      .groupBy(
        monthOf(col("payment_date")).as("month"),
        col("product_type"), col("currency"))
      .agg(sum(col("amount_received")).as("collected_amount_dec"))
      .select(
        col("month"), col("product_type"), col("currency"),
        col("collected_amount_dec").cast(DoubleType).as("collected_amount"))
}
