package graft

import org.apache.spark.sql.functions._

import graft.synth.Synth

/** Conservation-law and semantic specs for the synthesizer (SURVEY.md §5):
  * the integer-cents design makes these EXACT equalities, not tolerances
  * (the annuity recurrence included — it runs in fixed-point cents; the
  * remaining tolerances only absorb double SUM rounding over the exact
  * per-row values). */
class SynthSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cfg = Synth.Config(nLoans = 120)
  private lazy val loans = Synth.loans(spark, cfg).cache()
  private lazy val sched = Synth.scheduleLinear(loans).cache()
  private lazy val pays = Synth.payments(sched).cache()

  test("schemas: all 17 OLTP tables declared with typed columns") {
    import graft.schema.Schemas
    assert(Schemas.oltp.size == 17)
    assert(Schemas.oltp("loan_contract").fieldNames.contains("principal_current"))
    assert(Schemas.oltp("arrears_dpd_status").fieldNames.contains("days_past_due"))
    // an empty frame constructed against each schema round-trips its types
    Schemas.oltp.values.foreach { st =>
      val df = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      assert(df.schema == st)
    }
  }

  test("borrowers/applications: chronology contract and FK domains") {
    val b = Synth.borrowers(spark)
    val a = Synth.applications(spark)
    assert(b.count() == 2000 && a.count() == 3000)
    // created_at strictly before application_date (G11): offset hours >= 3
    assert(a.filter(col("created_hours_before") < 3).count() == 0)
    // FK domain: every application borrower_id exists
    assert(a.join(b, Seq("borrower_id"), "left_anti").count() == 0)
  }

  test("loans: domains and determinism") {
    val l = loans.collect()
    assert(l.length == 120)
    assert(loans.select(col("term_months")).as[Int].collect().forall(t => t >= 6 && t <= 72))
    assert(loans.select(col("principal")).as[Double].collect().forall(p => p >= 500.0 && p < 50000.0))
    assert(loans.select(col("annual_rate")).as[Double].collect().forall(r => r >= 0.03 && r < 0.22))
    // same config twice -> identical world (arithmetic PRNG, no rand())
    val again = Synth.loans(spark, cfg).collect()
    assert(l.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("linear schedule: principal dues sum EXACTLY to the principal (cents)") {
    val bad = sched.groupBy(col("loan_id"))
      .agg(sum(col("principal_due_cents")).as("s"))
      .join(loans.select(col("loan_id"), col("principal_cents")), "loan_id")
      .filter(col("s") =!= col("principal_cents"))
    assert(bad.count() == 0)
  }

  test("linear schedule: closing balance chains to zero and never goes negative") {
    val last = sched.filter(col("installment_no") === col("term_months"))
    assert(last.filter(col("closing_balance") =!= 0.0).count() == 0)
    assert(sched.filter(col("closing_balance") < 0.0).count() == 0)
    assert(sched.filter(col("opening_balance") <= 0.0).count() == 0)
  }

  test("payments: defaulted loans stop paying after 30% of term; delays within 1..90") {
    val joined = pays.join(loans.select(col("loan_id"), col("is_default"), col("term_months")
      .as("tm")), "loan_id")
    val offenders = joined.filter(col("is_default") &&
      col("installment_no") > expr("(tm * 3) div 10"))
    assert(offenders.count() == 0)
    assert(pays.filter(col("delay_days") < 0 || col("delay_days") > 90).count() == 0)
    assert(pays.filter(!col("late_inst") && col("delay_days") =!= 0).count() == 0)
  }

  test("waterfall conserves the payment exactly and respects priority order") {
    val w = Synth.waterfall(pays)
    val notConserved = w.filter(
      abs(col("alloc_penalty") + col("alloc_fees") + col("alloc_interest")
        + col("alloc_principal") + col("alloc_other") - col("amount")) > 1e-9)
    assert(notConserved.count() == 0)
    // a claim class is only partially paid if every senior class is exhausted:
    // nonzero interest alloc requires penalty+fees fully covered
    val j = w.join(pays.select(col("loan_id"), col("installment_no"),
      (col("penalty_cents").cast("double") / 100.0).as("penalty_due"),
      (col("fee_cents").cast("double") / 100.0).as("fee_due")), Seq("loan_id", "installment_no"))
    val bad = j.filter(col("alloc_interest") > 0 &&
      (col("alloc_penalty") < col("penalty_due") || col("alloc_fees") < col("fee_due")))
    assert(bad.count() == 0)
  }

  test("dpd snapshots: one row per day, capped at 180, flags follow dpd") {
    val snaps = Synth.dpdSnapshots(pays)
    assert(snaps.filter(col("days_past_due") < 0 || col("days_past_due") > 180).count() == 0)
    // per installment: row count == min(delay, 180) + 1
    val cnt = snaps.groupBy(col("loan_id"), col("installment_no")).count()
      .join(pays.select(col("loan_id"), col("installment_no"),
        least(col("delay_days"), lit(180)).as("cap")), Seq("loan_id", "installment_no"))
    assert(cnt.filter(col("count") =!= col("cap") + 1).count() == 0)
    assert(snaps.filter(col("nonperforming_flag") =!= (col("days_past_due") > 90)).count() == 0)
  }

  test("rate schedule: SCD-2 intervals tile without overlap; last is open-ended") {
    val rs = Synth.rateSchedule(loans).cache()
    val openEnded = rs.groupBy(col("loan_id"))
      .agg(sum(col("effective_to").isNull.cast("int")).as("nulls"))
    assert(openEnded.filter(col("nulls") =!= 1).count() == 0)
    // effective_to + 1 day == next effective_from (gap-free tiling)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("loan_id")).orderBy(col("event_no"))
    val gaps = rs.withColumn("next_from", lead(col("effective_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        date_add(col("effective_to"), 1) =!= col("next_from"))
    assert(gaps.count() == 0)
  }

  test("annuity schedule: balance retires to ~0, constant payment, dues conserve principal") {
    val a = Synth.scheduleAnnuity(loans).toDF().cache()
    val lastBal = a.groupBy(col("loan_id")).agg(min(col("closing_balance")).as("mn"),
      max(col("closing_balance")).as("mx"))
    // final closing balance is exactly the retire-the-remainder 0.0
    val last = a.join(loans.select(col("loan_id"), col("term_months")), "loan_id")
      .filter(col("installment_no") === col("term_months"))
    assert(last.filter(abs(col("closing_balance")) > 1e-6).count() == 0)
    // principal dues sum to the principal within fp tolerance
    val sums = a.groupBy(col("loan_id")).agg(sum(col("principal_due")).as("s"))
      .join(loans.select(col("loan_id"), col("principal")), "loan_id")
    assert(sums.filter(abs(col("s") - col("principal")) > 1e-4).count() == 0)
    // payments are constant across installments (except the last, which retires)
    val pay = a.join(loans.select(col("loan_id"), col("term_months")), "loan_id")
      .filter(col("installment_no") < col("term_months"))
      .groupBy(col("loan_id")).agg((max(col("payment")) - min(col("payment"))).as("spread"))
    assert(pay.filter(col("spread") > 1e-6).count() == 0)
    assert(lastBal.count() > 0)
  }
}
