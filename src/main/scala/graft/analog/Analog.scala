package graft.analog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.CreditFunctions._

/** Maps the driver's TPC-H-ish testdata onto the canonical credit staging
  * schemas (SURVEY.md §7.0 domain→testdata analogy), so the very same
  * [[graft.credit.Marts]] transforms run against the DuckDB oracle:
  *
  *   events   ≙ arrears_dpd_status  (user_id≙loan_id, ts≙as_of_date,
  *              floor(value)≙days_past_due, event_type='error'≙default_flag)
  *   customer ≙ loan_contract dim   (c_custkey≙loan_id, c_mktsegment≙
  *              product_type, nationkey≙currency, c_acctbal≙exposure,
  *              derived deterministic origination_date)
  *   lineitem×orders ≙ repayment_payment (l_shipdate≙payment_date,
  *              l_extendedprice≙amount_received, o_custkey≙loan_id)
  *   orders   ≙ write_off_and_recovery (status-derived nullable recovery)
  *
  * All money doubles are cast to DecimalType at the scan boundary — the
  * staging cast-projection idiom (P1) — making every downstream sum exact
  * and order-independent.
  */
object Analog {

  val Money: DecimalType = DecimalType(18, 2)

  /** events → stg_arrears_daily shape. (loan_id, as_of_date) is NOT unique
    * here (several events per user-day), so ts/event_id ride along as
    * window tiebreakers for the month-end dedup.
    *
    * The raw events span a single month, which made every
    * month-over-month mart (bucket transitions, roll/cure rates) vacuous
    * on this tier — so the analog derives a MULTI-month observation date
    * deterministically, spreading each event `event_id % 6` months
    * forward (same spirit as the derived origination_date in [[loans]]);
    * both engines clamp month-add day overflow identically. */
  def arrears(td: Tables): DataFrame =
    td.events.select(
        col("user_id").as("loan_id"),
        // ts is nanos-since-epoch (see Tables.events); `div` keeps the
        // micros conversion exact (a double roundtrip would round >2^53).
        add_months(to_date(timestamp_micros(expr("ts div 1000"))),
          (col("event_id") % 6).cast(IntegerType)).as("as_of_date"),
        col("ts"),
        col("event_id"),
        floor(col("value")).cast(IntegerType).as("days_past_due"),
        col("value").cast(Money).as("past_due_amount_total"),
        col("event_type"))
      .withColumn("dpd_bucket", dpdBucket(col("days_past_due")))
      .withColumn("npl_flag",
        nplFlag(col("event_type") === "error", lit(null).cast(BooleanType), col("days_past_due")))

  /** customer → stg_loan_contract dim shape. origination_date is a
    * deterministic derivation (2015-01-01 + 7*custkey days) so vintage
    * cohorts are reproducible in the SQL oracle. */
  def loans(td: Tables): DataFrame =
    td.customer.select(
      col("c_custkey").as("loan_id"),
      (lit(10000L) + col("c_custkey")).as("borrower_id"),
      col("c_mktsegment").as("product_type"),
      concat(lit("C"), col("c_nationkey").cast(StringType)).as("currency"),
      date_add(to_date(lit("2015-01-01")), (col("c_custkey") * 7).cast(IntegerType))
        .as("origination_date"),
      col("c_acctbal").cast(Money).as("exposure"))

  /** lineitem enriched with its order's customer → stg_payments shape. */
  def payments(td: Tables): DataFrame =
    td.lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast(DateType).as("payment_date"),
        col("l_extendedprice").cast(Money).as("amount_received"),
        col("l_returnflag").as("currency"))
      .join(td.orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey").as("loan_id")),
        Seq("l_orderkey"), "inner")

  /** orders → stg_writeoff_recovery shape: 'F' orders have a recovery
    * 30 days later of 10% of the principal part; amount parts split
    * 70/20/10 with nullif-created NULLs exercising the coalesce path. */
  def writeoffs(td: Tables): DataFrame = {
    val price = col("o_totalprice").cast(Money)
    td.orders.select(
      col("o_orderkey").as("loan_id"),
      col("o_orderdate").cast(DateType).as("writeoff_date"),
      when(col("o_orderstatus") === "F",
        date_add(col("o_orderdate").cast(DateType), 30)).as("recovery_date"),
      (price * lit(0.70).cast(DecimalType(4, 2))).as("writeoff_amount_principal"),
      (price * lit(0.20).cast(DecimalType(4, 2))).as("writeoff_amount_interest"),
      nullif(price * lit(0.10).cast(DecimalType(4, 2)), lit(0).cast(DecimalType(20, 4)))
        .as("writeoff_amount_fees"),
      when(col("o_orderstatus") === "F", price * lit(0.10).cast(DecimalType(4, 2)))
        .as("recovery_amount"))
  }
}
