package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar credit-domain functions, expressed as native Column expressions
  * (never Scala UDFs) so they stay inside whole-stage codegen and remain
  * visible to Catalyst for pushdown/folding.
  *
  * Semantics mirror the reference models / generator helpers:
  *  - DPD banding: `dbt/credit_mart/models/staging/stg_arrears_daily.sql:14-20`
  *    (Python twin `airflows/generator/pg_oltp_synth.py:76-85` — note the
  *    generator stores ">90" but staging recomputes "90+"; staging wins).
  *  - NPL flag: `stg_arrears_daily.sql:22`.
  *  - Guarded ratios: `fct_npl_monthly.sql:15`, `fct_cure_rate_monthly.sql:25-26`.
  *  - Months-on-book: `fct_vintage_mob.sql:17` (Postgres age()-based whole
  *    calendar months — matches floor(months_between)).
  *  - Annuity / penalty / clamps: `pg_oltp_synth.py:88-96`.
  */
object CreditFunctions {

  /** Ordinal DPD banding: 0 / 1-30 / 31-60 / 61-90 / 90+. */
  def dpdBucket(dpd: Column): Column =
    when(dpd <= 0, lit("0"))
      .when(dpd <= 30, lit("1-30"))
      .when(dpd <= 60, lit("31-60"))
      .when(dpd <= 90, lit("61-90"))
      .otherwise(lit("90+"))

  /** Null-guarded boolean-OR NPL flag:
    * coalesce(nonperforming,false) OR coalesce(default,false) OR dpd > 90.
    */
  def nplFlag(nonperforming: Column, defaultFlag: Column, dpd: Column): Column =
    coalesce(nonperforming, lit(false)) || coalesce(defaultFlag, lit(false)) || (dpd > 90)

  /** num/den with divide-by-zero -> NULL, computed in double after the
    * operands are exact (bigint counts or decimal sums) so the single IEEE
    * division is bit-deterministic across engines.
    */
  def guardedRatio(num: Column, den: Column): Column =
    when(den === 0 || den.isNull, lit(null).cast(DoubleType))
      .otherwise(num.cast(DoubleType) / den.cast(DoubleType))

  /** Whole calendar months between `asOf` and `origination` (Postgres
    * `age()` year*12+month semantics). age() truncates toward ZERO, not
    * -inf: a loan observed month-start in its origination month with
    * origination day > 1 has months_between in (-1, 0) and age() yields 0
    * (kept by `mob >= 0`), where floor would give -1 and drop the mob=0
    * cohort. Int cast truncates toward zero, matching age(). */
  def monthsOnBook(asOf: Column, origination: Column): Column =
    months_between(asOf, origination).cast(IntegerType)

  /** Month-start truncation returning DateType. */
  def monthOf(d: Column): Column = trunc(d, "month")

  /** Quarter-start truncation returning DateType (vintage cohorts). */
  def quarterOf(d: Column): Column = trunc(d, "quarter")

  /** Annuity installment: P * r(1+r)^n / ((1+r)^n - 1), r = annualRate/12;
    * falls back to P/n when the rate is ~0 (reference guard at
    * pg_oltp_synth.py:88-92). */
  def annuityPayment(principal: Column, annualRate: Column, termMonths: Column): Column = {
    val r = annualRate / lit(12.0)
    val pow = org.apache.spark.sql.functions.pow(lit(1.0) + r, termMonths)
    when(abs(r) < lit(1e-9), principal / termMonths)
      .otherwise(principal * r * pow / (pow - lit(1.0)))
  }

  /** Daily penalty accrual: due * (annualPenaltyRate/365) * daysLate. */
  def dailyPenalty(totalDue: Column, annualPenaltyRate: Column, daysLate: Column): Column =
    totalDue * (annualPenaltyRate / lit(365.0)) * daysLate

  /** max(0, x) clamp used throughout the generator. */
  def clampNonNeg(x: Column): Column = greatest(lit(0.0), x)

  /** Boolean column counted as 0/1 (reference `flag::int`). */
  def flagAsInt(flag: Column): Column = flag.cast(IntegerType)
}
