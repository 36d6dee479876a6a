package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.CreditFunctions._

/** Edge-case specs for the scalar credit functions (SURVEY.md §5):
  * bucket boundaries exactly at the reference's CASE edges
  * (stg_arrears_daily.sql:14-20), months-on-book against Postgres age()
  * truncate-toward-zero semantics (fct_vintage_mob.sql:17), and the
  * null-guarded ratio. */
class CreditFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dpdBucket: reference CASE edges 0/1/30/31/60/61/90/91 and negatives") {
    val got = Seq(-5, 0, 1, 30, 31, 60, 61, 90, 91, 365).toDF("dpd")
      .select(dpdBucket(col("dpd"))).as[String].collect().toSeq
    assert(got == Seq("0", "0", "1-30", "1-30", "31-60", "31-60", "61-90", "61-90", "90+", "90+"))
  }

  test("nplFlag: null guards and the dpd>90 arm") {
    val df = Seq(
      (Some(true), None: Option[Boolean], 0),   // nonperforming wins
      (None, Some(true), 0),                    // default wins
      (None, None, 91),                         // dpd arm
      (None, None, 90),                         // all-null/false -> false
      (Some(false), Some(false), 0)
    ).toDF("npf", "dft", "dpd")
    val got = df.select(nplFlag(col("npf"), col("dft"), col("dpd"))).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true, false, false))
  }

  test("monthsOnBook: age()-style truncate toward zero, month-start vs mid-month origination") {
    val df = Seq(
      ("2015-02-01", "2015-01-15"), // 17 days -> 0 whole months (floor would give -1... via negative fraction)
      ("2015-01-01", "2015-01-15"), // observed before origination, same month -> 0 (kept by mob>=0)
      ("2015-03-01", "2015-01-15"), // 1 month 17 days -> 1
      ("2015-02-01", "2015-01-01"), // exact month -> 1
      ("2016-01-01", "2015-01-01")  // exact year -> 12
    ).toDF("m", "o").select(monthsOnBook(to_date(col("m")), to_date(col("o"))))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 1, 12))
  }

  test("guardedRatio: zero and null denominators -> null, otherwise exact division") {
    val df = Seq((1L, 2L)).toDF("n", "d").select(
      guardedRatio(col("n"), col("d")),
      guardedRatio(col("n"), lit(0L)),
      guardedRatio(col("n"), lit(null).cast("long")))
    assert(df.collect().head == Row(0.5, null, null))
  }

  test("annuityPayment: zero-rate falls back to principal/term; positive rate exceeds it") {
    val df = Seq((1200.0, 0.0, 12), (1200.0, 0.12, 12)).toDF("p", "r", "n")
      .select(annuityPayment(col("p"), col("r"), col("n")))
    val Seq(zero, pos) = df.as[Double].collect().toSeq
    assert(math.abs(zero - 100.0) < 1e-9)
    assert(pos > 100.0 && pos < 112.0) // 1% monthly on 1200 over 12 months
  }

  test("dailyPenalty and clampNonNeg") {
    val df = Seq((1000.0, 0.12, 30, -3.5)).toDF("due", "rate", "days", "x")
      .select(dailyPenalty(col("due"), col("rate"), col("days")), clampNonNeg(col("x")))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 1000.0 * 0.12 / 365 * 30) < 1e-9)
    assert(r.getDouble(1) == 0.0)
  }
}
