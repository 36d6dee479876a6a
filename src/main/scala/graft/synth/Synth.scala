package graft.synth

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's OLTP synthesizer (`airflows/generator/pg_oltp_synth.py`,
  * G1–G11 in SURVEY.md §2.9) re-expressed as a deterministic, fully
  * relational Spark program: `spark.range` mints entities, column
  * arithmetic replaces Python's `random`, `explode(sequence(...))`
  * replaces the per-loan while-loops, and a window `lead` builds the
  * SCD-2 rate intervals. No driver-side loops, no UDFs (the one stateful
  * recurrence — the annuity balance — uses a typed `flatMap`, SURVEY.md
  * §2.11).
  *
  * Determinism & oracle parity:
  *  - randomness is [[Rng.u]], a three-round (two affine + one quadratic
  *    mixing) LCG over (id, salt) — pure integer arithmetic reproducible
  *    bit-exactly in ANSI SQL (unlike `rand(seed)`, which is
  *    partitioning-dependent and engine-private);
  *  - money is integer CENTS end-to-end; division is integer `div` with
  *    the remainder folded into the last installment, so conservation
  *    laws (sum of principal dues == principal; waterfall allocations
  *    sum to the payment) hold EXACTLY, not up-to-rounding;
  *  - doubles appear only as final `cents/100.0` projections.
  *
  * Scale posture: generation is embarrassingly parallel over loan ids
  * (`spark.range` partitions), the schedule/payment/snapshot expansions
  * are narrow per-partition flatMaps/explodes (no shuffle until a
  * downstream agg), and row counts grow linearly with `nLoans` — the
  * same program shapes a 1000-executor 100 TB synthesis run.
  *
  * Reference sites: volumes `pg_oltp_synth.py:26-28`; behavior rates
  * `:39-45`; schedule unrolling `:391-473`; payment derivation
  * `:562-644`; waterfall `:647-661`; snapshot expansion `:667-692`;
  * SCD-2 rates `:344-388`; chronology rules `README.MD:55-82`.
  */
object Synth {

  /** Engine-agnostic deterministic uniform [0,1): two LCG rounds over a
    * non-negative integer key plus a salt, then a NONLINEAR mixing round
    * (`h1*h2 mod M` — quadratic in the key). The quadratic round matters:
    * a purely affine chain makes `u(key+c, s2)` a CONSTANT shift (mod 1)
    * of `u(key, s1)`, so any draw conditioned on another draw's interval
    * (e.g. case stage given `is_default`) collapses to a single value.
    * The key is reduced mod 2^31 BEFORE the first multiply, so any
    * non-negative int64 key is safe (an unreduced key over ~10⁹ — e.g.
    * loan_id·200 installment keys in a billion-loan synthesis — would
    * overflow key·A, which Spark silently wraps to a NEGATIVE draw while
    * the SQL twin errors). After reduction every intermediate stays
    * below 2^63 (h0,h1,h2 < 2^31), evaluating without overflow — and
    * bit-identically — in any int64 SQL engine; for keys already < 2^31
    * the reduction is the identity, so values are unchanged. */
  object Rng {
    val M = 2147483648L // 2^31
    val A = 1103515245L
    val C = 12345L
    def u(key: Column, salt: Long): Column = {
      val h0 = key % lit(M)
      val h1 = (h0 * lit(A) + lit(salt)) % lit(M)
      val h2 = (h1 * lit(A) + lit(C)) % lit(M)
      ((h1 * h2 + lit(C)) % lit(M)).cast(DoubleType) / lit(M.toDouble)
    }
    /** SQL twin of [[u]] for the DuckDB oracle. */
    def uSql(key: String, salt: Long): String = {
      val h1 = s"(((($key) % $M) * $A + $salt) % $M)"
      val h2 = s"(($h1 * $A + $C) % $M)"
      s"CAST(($h1 * $h2 + $C) % $M AS DOUBLE) / $M.0"
    }
  }

  final case class Config(
      nBorrowers: Int = 2000,
      nApplications: Int = 3000,
      nLoans: Int = 1500,
      startDate: String = "2015-01-01",
      spanDays: Int = 3652,      // -> 2024-12-31
      minTerm: Int = 6,
      maxTerm: Int = 72,
      minPrincipalCents: Long = 50000L,       // 500.00
      principalRangeCents: Long = 4950000L,   // ..50,000.00
      minRateBp: Long = 300L,                 // 3%
      rateRangeBp: Long = 1900L,              // ..22%
      pLate: Double = 0.18,
      pPartial: Double = 0.10,
      pDefault: Double = 0.03,
      pVariableRate: Double = 0.35,
      snapshotCapDays: Int = 180)

  import Rng.u

  // Salts (one per independent draw — mirrored in the oracle SQL).
  val SaltBorrower = 1L;  val SaltApplication = 2L; val SaltProduct = 3L
  val SaltCurrency = 4L;  val SaltOrigDate = 5L;    val SaltTerm = 6L
  val SaltPrincipal = 7L; val SaltRate = 8L;        val SaltDefault = 9L
  val SaltLate = 10L;     val SaltPartial = 11L;    val SaltMethod = 12L
  val SaltVariable = 13L; val SaltNEvents = 14L;    val SaltEvtRate = 15L
  val SaltCreatedH = 16L
  val SaltInstLate = 21L; val SaltInstDelay = 22L;  val SaltInstPartial = 23L
  val SaltInstFrac = 24L; val SaltInstFee = 25L
  val SaltBirth = 40L;    val SaltSegment = 41L;    val SaltAppDate = 42L
  val SaltChannel = 43L;  val SaltReqAmount = 44L;  val SaltAppStatus = 45L
  val SaltAppBorrower = 46L; val SaltAppCreatedH = 47L
  val SaltDirectDebit = 48L; val SaltForbearance = 49L; val SaltCapitalize = 50L
  val SaltDisbChannel = 51L; val SaltInstrStatus = 52L; val SaltCaseStage = 53L
  val SaltCaseRecovery = 54L; val SaltMandateStatus = 55L
  val SaltGrace = 56L;    val SaltDisbDelay = 57L
  val SaltWriteoff = 58L; val SaltWoDate = 59L;      val SaltWoPrincipal = 60L
  val SaltWoInterest = 61L; val SaltWoFees = 62L

  /** G1: the borrower dimension (ids floored at 10000 like the
    * reference's restarted sequences). */
  def borrowers(spark: SparkSession, cfg: Config = Config()): DataFrame = {
    val id = col("id")
    spark.range(cfg.nBorrowers).select(
      (lit(10000L) + id).as("borrower_id"),
      concat(lit("B-"), id.cast(StringType)).as("full_name"),
      date_add(to_date(lit("1950-01-01")),
        floor(u(id, SaltBirth) * 18262).cast(IntegerType)).as("birth_date"), // ..2000
      element_at(array(lit("retail"), lit("premium"), lit("sme")),
        (floor(u(id, SaltSegment) * 3) + 1).cast(IntegerType)).as("segment"))
  }

  /** G1+G2+G11: applications with random borrower FKs and the README's
    * chronology contract (created strictly BEFORE the application date,
    * modeled as a positive hour offset). */
  def applications(spark: SparkSession, cfg: Config = Config()): DataFrame = {
    val id = col("id")
    val start = to_date(lit(cfg.startDate))
    spark.range(cfg.nApplications).select(
      (lit(100000000L) + id).as("application_id"),
      (lit(10000L) + floor(u(id, SaltAppBorrower) * cfg.nBorrowers).cast(LongType)).as("borrower_id"),
      date_add(start, floor(u(id, SaltAppDate) * cfg.spanDays).cast(IntegerType)).as("application_date"),
      element_at(array(lit("branch"), lit("online"), lit("broker")),
        (floor(u(id, SaltChannel) * 3) + 1).cast(IntegerType)).as("channel"),
      ((lit(50000L) + floor(u(id, SaltReqAmount) * cfg.principalRangeCents).cast(LongType))
        .cast(DoubleType) / 100.0).as("requested_amount"),
      element_at(array(lit("approved"), lit("rejected"), lit("withdrawn")),
        (floor(u(id, SaltAppStatus) * 3) + 1).cast(IntegerType)).as("status"),
      (lit(3L) + floor(u(id, SaltAppCreatedH) * 69).cast(LongType)).as("created_hours_before"))
      // the actual ingestion timestamp (D6/G11): 3–72h before the
      // application date, as TIMESTAMP_NTZ (wall-clock semantics — the
      // tz-adjusted TimestampType would diverge from a naive SQL twin)
      .withColumn("created_at",
        expr("timestampadd(HOUR, -cast(created_hours_before AS INT), cast(application_date AS TIMESTAMP_NTZ))"))
  }

  /** G1–G4 + G11: the loan_contract dimension with behavior tags.
    * Columns mirror `stg_loan_contract.sql` plus the generator's hidden
    * behavior flags. */
  def loans(spark: SparkSession, cfg: Config = Config()): DataFrame = {
    val id = col("id")
    val start = to_date(lit(cfg.startDate))
    spark.range(cfg.nLoans).select(
      (id + 1).as("loan_id"),
      (lit(10000L) + floor(u(id, SaltBorrower) * cfg.nBorrowers).cast(LongType)).as("borrower_id"),
      (lit(100000000L) + floor(u(id, SaltApplication) * cfg.nApplications).cast(LongType)).as("application_id"),
      element_at(
        array(lit("consumer"), lit("auto"), lit("mortgage"), lit("sme")),
        (floor(u(id, SaltProduct) * 4) + 1).cast(IntegerType)).as("product_type"),
      element_at(
        array(lit("EUR"), lit("USD"), lit("GBP")),
        (floor(u(id, SaltCurrency) * 3) + 1).cast(IntegerType)).as("currency"),
      date_add(start, floor(u(id, SaltOrigDate) * cfg.spanDays).cast(IntegerType)).as("origination_date"),
      (lit(cfg.minTerm) + floor(u(id, SaltTerm) * (cfg.maxTerm - cfg.minTerm + 1)).cast(IntegerType)).as("term_months"),
      (lit(cfg.minPrincipalCents) + floor(u(id, SaltPrincipal) * cfg.principalRangeCents).cast(LongType)).as("principal_cents"),
      (lit(cfg.minRateBp) + floor(u(id, SaltRate) * cfg.rateRangeBp).cast(LongType)).as("rate_bp"),
      (u(id, SaltDefault) < cfg.pDefault).as("is_default"),
      (u(id, SaltLate) < cfg.pLate).as("is_late"),
      (u(id, SaltPartial) < cfg.pPartial).as("is_partial"),
      element_at(
        array(lit("linear"), lit("annuity"), lit("interest_only"), lit("balloon")),
        (floor(u(id, SaltMethod) * 4) + 1).cast(IntegerType)).as("repayment_method"),
      when(u(id, SaltVariable) < cfg.pVariableRate, lit("variable")).otherwise(lit("fixed")).as("interest_rate_type"),
      (lit(3L) + floor(u(id, SaltCreatedH) * 69).cast(LongType)).as("created_hours_before"),
      // grace: 0 with p=0.85, else 1..3 (reference pg_oltp_synth.py:259),
      // single draw: floor(u*20) in 17..19 -> 1..3
      when(floor(u(id, SaltGrace) * 20) < 17, lit(0))
        .otherwise((floor(u(id, SaltGrace) * 20) - 16).cast(IntegerType)).as("grace_period_months"),
      lit("monthly").as("payment_frequency"))
      .withColumn("disbursement_date",
        date_add(col("origination_date"), floor(u(col("loan_id") - 1, SaltDisbDelay) * 8).cast(IntegerType)))
      .withColumn("created_at",
        expr("timestampadd(HOUR, -cast(created_hours_before AS INT), cast(origination_date AS TIMESTAMP_NTZ))"))
      .withColumn("status", when(col("is_default"), lit("defaulted")).otherwise(lit("active")))
      .withColumn("principal", col("principal_cents").cast(DoubleType) / 100.0)
      .withColumn("annual_rate", col("rate_bp").cast(DoubleType) / 10000.0)
      .withColumn("maturity_date", add_months(col("origination_date"), col("term_months")))
  }

  /** G5 (linear amortization, closed form — M2): one row per installment.
    * `principal_due` is `principal div term` cents with the remainder on
    * the final installment, so the dues sum EXACTLY to the principal;
    * interest is declining-balance on the exact opening-balance closed
    * form (M3 without recursion). */
  def scheduleLinear(loans: DataFrame): DataFrame = {
    val pdCents = expr("principal_cents div term_months")
    loans
      .withColumn("installment_no", explode(sequence(lit(1), col("term_months"))))
      .withColumn("pd_cents_base", pdCents)
      .withColumn("opening_cents", col("principal_cents") - col("pd_cents_base") * (col("installment_no") - 1))
      .withColumn("principal_due_cents",
        when(col("installment_no") === col("term_months"),
          col("principal_cents") - col("pd_cents_base") * (col("term_months") - 1))
          .otherwise(col("pd_cents_base")))
      .withColumn("interest_due_cents", expr("(opening_cents * rate_bp) div 120000"))
      .withColumn("total_due_cents", col("principal_due_cents") + col("interest_due_cents"))
      // payment start shifts by the grace period (reference first_due =
      // origination + 1 + grace, then monthly: due_n = orig + grace + n)
      .withColumn("due_date",
        add_months(col("origination_date"), col("grace_period_months") + col("installment_no")))
      .select(
        col("loan_id"), col("installment_no"), col("due_date"),
        (col("principal_due_cents").cast(DoubleType) / 100.0).as("principal_due"),
        (col("interest_due_cents").cast(DoubleType) / 100.0).as("interest_due"),
        (col("total_due_cents").cast(DoubleType) / 100.0).as("total_due"),
        (col("opening_cents").cast(DoubleType) / 100.0).as("opening_balance"),
        ((col("opening_cents") - col("principal_due_cents")).cast(DoubleType) / 100.0).as("closing_balance"),
        col("principal_due_cents"), col("interest_due_cents"), col("total_due_cents"),
        col("is_default"), col("is_late"), col("is_partial"),
        col("term_months"), col("rate_bp"))
  }

  /** G5 for the three closed-form methods (M2: linear / interest_only /
    * balloon, reference semantics `pg_oltp_synth.py:428-437`): linear
    * amortizes `P div n` cents per installment; interest_only never
    * retires principal (closing stays P — reference quirk preserved);
    * balloon pays interest on the full balance and retires it entirely
    * at the final installment. Annuity loans (sequential recurrence) go
    * through [[scheduleAnnuity]]. */
  def scheduleByMethod(loans: DataFrame): DataFrame =
    loans.filter(col("repayment_method") =!= "annuity")
      .withColumn("installment_no", explode(sequence(lit(1), col("term_months"))))
      .withColumn("pd_base", expr("principal_cents div term_months"))
      .withColumn("principal_due_cents",
        when(col("repayment_method") === "linear",
          when(col("installment_no") === col("term_months"),
            col("principal_cents") - col("pd_base") * (col("term_months") - 1))
            .otherwise(col("pd_base")))
        .when(col("repayment_method") === "balloon",
          when(col("installment_no") === col("term_months"), col("principal_cents"))
            .otherwise(lit(0L)))
        .otherwise(lit(0L))) // interest_only
      .withColumn("opening_cents",
        when(col("repayment_method") === "linear",
          col("principal_cents") - col("pd_base") * (col("installment_no") - 1))
          .otherwise(col("principal_cents")))
      .withColumn("interest_due_cents", expr("(opening_cents * rate_bp) div 120000"))
      .withColumn("due_date",
        add_months(col("origination_date"), col("grace_period_months") + col("installment_no")))
      .select(
        col("loan_id"), col("repayment_method"), col("installment_no"), col("due_date"),
        (col("principal_due_cents").cast(DoubleType) / 100.0).as("principal_due"),
        (col("interest_due_cents").cast(DoubleType) / 100.0).as("interest_due"),
        ((col("principal_due_cents") + col("interest_due_cents")).cast(DoubleType) / 100.0).as("total_due"),
        (col("opening_cents").cast(DoubleType) / 100.0).as("opening_balance"),
        ((col("opening_cents") - col("principal_due_cents")).cast(DoubleType) / 100.0).as("closing_balance"))

  /** Per-installment draw key: unique, < 2^31 for any realistic nLoans. */
  private def instKey: Column = col("loan_id") * 200 + col("installment_no")

  /** G6: payment events derived from the schedule + behavior tags —
    * on-time/late (1–90d)/partial (30–80%)/skipped-after-default, plus a
    * flat late fee and the M4 daily penalty accrual (both integer cents). */
  def payments(schedule: DataFrame): DataFrame =
    schedule
      .withColumn("default_after", expr("(term_months * 3) div 10"))
      .filter(!col("is_default") || col("installment_no") <= col("default_after"))
      .withColumn("late_inst", col("is_late") && (u(instKey, SaltInstLate) < 0.5))
      .withColumn("delay_days",
        when(col("late_inst"), (lit(1) + floor(u(instKey, SaltInstDelay) * 90)).cast(IntegerType))
          .otherwise(lit(0)))
      .withColumn("payment_date", date_add(col("due_date"), col("delay_days")))
      .withColumn("fee_cents",
        when(col("late_inst"), lit(500L) + floor(u(instKey, SaltInstFee) * 3500).cast(LongType))
          .otherwise(lit(0L)))
      // M4: total_due * (12%/365) * days_late, in exact cents
      .withColumn("penalty_cents", expr("(total_due_cents * 12 * delay_days) div 36500"))
      .withColumn("owed_cents", col("total_due_cents") + col("fee_cents") + col("penalty_cents"))
      .withColumn("partial_inst", col("is_partial") && (u(instKey, SaltInstPartial) < 0.5))
      .withColumn("frac_ppm",
        when(col("partial_inst"), lit(300000L) + floor(u(instKey, SaltInstFrac) * 500001).cast(LongType))
          .otherwise(lit(1000000L)))
      .withColumn("amount_cents", expr("(owed_cents * frac_ppm) div 1000000"))
      .select(
        col("loan_id"), col("installment_no"), col("due_date"), col("payment_date"),
        col("delay_days"), col("late_inst"), col("partial_inst"),
        col("principal_due_cents"), col("interest_due_cents"), col("total_due_cents"),
        col("fee_cents"), col("penalty_cents"), col("amount_cents"),
        (col("amount_cents").cast(DoubleType) / 100.0).as("amount_received"))

  /** G7: the payment-allocation waterfall — penalty → fees → interest →
    * principal → other, each `least(remaining, due)`, exact in cents so
    * the allocations sum to the payment by construction
    * (`pg_oltp_synth.py:647-661`; the reference's discarded careful
    * waterfall is the real operator, its random re-split is noise —
    * SURVEY.md §2.9 G7). */
  def waterfall(payments: DataFrame): DataFrame = {
    val p = payments
      .withColumn("alloc_penalty", least(col("amount_cents"), col("penalty_cents")))
      .withColumn("rem1", col("amount_cents") - col("alloc_penalty"))
      .withColumn("alloc_fees", least(col("rem1"), col("fee_cents")))
      .withColumn("rem2", col("rem1") - col("alloc_fees"))
      .withColumn("alloc_interest", least(col("rem2"), col("interest_due_cents")))
      .withColumn("rem3", col("rem2") - col("alloc_interest"))
      .withColumn("alloc_principal", least(col("rem3"), col("principal_due_cents")))
      .withColumn("alloc_other", col("rem3") - col("alloc_principal"))
    p.select(
      col("loan_id"), col("installment_no"),
      (col("amount_cents").cast(DoubleType) / 100.0).as("amount"),
      (col("alloc_penalty").cast(DoubleType) / 100.0).as("alloc_penalty"),
      (col("alloc_fees").cast(DoubleType) / 100.0).as("alloc_fees"),
      (col("alloc_interest").cast(DoubleType) / 100.0).as("alloc_interest"),
      (col("alloc_principal").cast(DoubleType) / 100.0).as("alloc_principal"),
      (col("alloc_other").cast(DoubleType) / 100.0).as("alloc_other"))
  }

  /** G8 (+D5): daily DPD snapshot expansion — one row per day from the
    * due date to min(payment date, due+cap), dpd = days elapsed, with the
    * generator's flag rules (early: 5<=dpd<=30, npl: dpd>90, default
    * after the loan's default installment). */
  def dpdSnapshots(payments: DataFrame, capDays: Int = 180): DataFrame =
    payments
      .withColumn("snap_end", least(col("payment_date"), date_add(col("due_date"), capDays)))
      .withColumn("as_of_date", explode(sequence(col("due_date"), col("snap_end"))))
      .withColumn("days_past_due", datediff(col("as_of_date"), col("due_date")))
      .select(
        col("loan_id"), col("installment_no"), col("as_of_date"), col("days_past_due"),
        graft.functions.CreditFunctions.dpdBucket(col("days_past_due")).as("dpd_bucket"),
        (col("days_past_due") >= 5 && col("days_past_due") <= 30).as("early_arrears_flag"),
        (col("days_past_due") > 90).as("nonperforming_flag"))

  /** The synth world's `stg_arrears_daily` twin: worst DPD per
    * (loan_id, as_of_date) across concurrently-open installments, so the
    * frame is UNIQUE per loan-day like the reference arrears table and
    * feeds [[graft.credit.Marts.bucketTransitions]] / the month-end
    * window without tiebreakers. Scale: one shuffle on the natural
    * (loan_id, as_of_date) key with map-side combine. */
  def arrearsDaily(snapshots: DataFrame): DataFrame =
    snapshots
      .groupBy(col("loan_id"), col("as_of_date"))
      .agg(max(col("days_past_due")).as("days_past_due"))
      .withColumn("dpd_bucket",
        graft.functions.CreditFunctions.dpdBucket(col("days_past_due")))

  /** G9: SCD-2 variable-rate schedule — 1–3 effective-dated events per
    * variable-rate loan, `effective_to = next_from - 1 day` (NULL on the
    * open-ended last interval) via a `lead` window. */
  def rateSchedule(loans: DataFrame): DataFrame = {
    val v = loans.filter(col("interest_rate_type") === "variable")
      .withColumn("n_events", (lit(1) + floor(u(col("loan_id"), SaltNEvents) * 3)).cast(IntegerType))
      .withColumn("event_no", explode(sequence(lit(0), col("n_events") - 1)))
      .withColumn("effective_from",
        add_months(col("origination_date"), expr("(event_no * term_months) div n_events")))
      .withColumn("rate_bp_event",
        lit(300L) + floor(u(col("loan_id") * 10 + col("event_no"), SaltEvtRate) * 1900).cast(LongType))
    val w = Window.partitionBy(col("loan_id")).orderBy(col("event_no"))
    v.withColumn("effective_to", date_sub(lead(col("effective_from"), 1).over(w), 1))
      .select(
        col("loan_id"), col("event_no"), col("effective_from"), col("effective_to"),
        (col("rate_bp_event").cast(DoubleType) / 10000.0).as("annual_rate"))
  }

  /** G11: chronology audit over the generated world — the README's DQ
    * probes (`README.MD:31-53`) as violation counts. The chronology
    * contract is `created_at` 3–72 hours BEFORE the application date
    * (`README.MD:55-82`), modeled as the `created_hours_before` offset:
    * the probe fires if the generator ever emits an offset outside that
    * window (i.e. a created_at at or after the application timestamp, or
    * unrealistically early). */
  def chronologyAudit(loans: DataFrame, applications: DataFrame): DataFrame = {
    import graft.dq.Checks.counted
    Seq(
      counted("created_not_3_to_72h_before_application",
        applications.filter(col("created_hours_before") < 3 || col("created_hours_before") > 72)),
      counted("origination_after_maturity",
        loans.filter(col("origination_date") > col("maturity_date"))),
      counted("nonpositive_term", loans.filter(col("term_months") <= 0)),
      counted("application_date_before_epoch",
        applications.filter(col("application_date") < to_date(lit("2015-01-01"))))
    ).reduce(_.union(_))
  }

  /** The reference's long-format `payment_allocation` table: one row per
    * (payment, claim class) from the waterfall, via `stack` (unpivot). */
  def paymentAllocations(waterfall: DataFrame): DataFrame =
    waterfall.select(
      (col("loan_id") * 200 + col("installment_no")).as("payment_id"),
      col("loan_id"),
      expr("""stack(5,
        'penalty', alloc_penalty,
        'fees', alloc_fees,
        'interest', alloc_interest,
        'principal', alloc_principal,
        'other', alloc_other) AS (allocated_to, amount_allocated)"""))
      .withColumn("allocation_id",
        col("payment_id") * 8 + when(col("allocated_to") === "penalty", 0)
          .when(col("allocated_to") === "fees", 1)
          .when(col("allocated_to") === "interest", 2)
          .when(col("allocated_to") === "principal", 3).otherwise(4))
      .select(col("allocation_id"), col("payment_id"), col("loan_id"),
        col("allocated_to"), col("amount_allocated"))

  /** Remaining OLTP entity tables (SURVEY.md §1.4) — all pure
    * deterministic projections off loans/payments, so the whole 17-table
    * world is oracle-reproducible. */
  def loanDisbursements(loans: DataFrame): DataFrame =
    loans.select(
      col("loan_id").as("disbursement_id"),
      col("loan_id"),
      col("origination_date").as("disbursement_date"),
      col("principal").as("amount"),
      element_at(array(lit("sepa"), lit("swift"), lit("internal")),
        (floor(u(col("loan_id"), SaltDisbChannel) * 3) + 1).cast(IntegerType)).as("channel"))

  def feesAndCharges(payments: DataFrame): DataFrame =
    payments.filter(col("fee_cents") > 0).select(
      instKey.as("fee_id"),
      col("loan_id"),
      lit("late_fee").as("fee_type"),
      col("payment_date").as("fee_date"),
      (col("fee_cents").cast(DoubleType) / 100.0).as("amount"),
      (u(instKey, SaltCapitalize) < 0.2).as("capitalization_flag"))

  def penaltyInterestEvents(payments: DataFrame): DataFrame =
    payments.filter(col("penalty_cents") > 0).select(
      instKey.as("penalty_id"),
      col("loan_id"),
      col("payment_date").as("event_date"),
      (col("total_due_cents").cast(DoubleType) / 100.0).as("base_amount"),
      lit(0.12).as("penalty_rate"),
      col("delay_days").as("days_late"),
      (col("penalty_cents").cast(DoubleType) / 100.0).as("penalty_amount"))

  /** Direct-debit mandates for ~55% of loans (p_direct_debit,
    * `pg_oltp_synth.py:43`), with templated references (M7). */
  def directDebitMandates(loans: DataFrame): DataFrame =
    loans.filter(u(col("loan_id"), SaltDirectDebit) < 0.55).select(
      (lit(500000L) + col("loan_id")).as("mandate_id"),
      col("borrower_id"),
      col("loan_id"),
      concat(lit("DD-"), col("loan_id").cast(StringType), lit("-"),
        floor(u(col("loan_id"), SaltDirectDebit) * 1000000).cast(LongType).cast(StringType))
        .as("mandate_reference"),
      concat(lit("DE89**********"),
        lpad((col("loan_id") % 10000).cast(StringType), 4, "0")).as("iban_masked"),
      when(u(col("loan_id"), SaltMandateStatus) < 0.9, lit("active"))
        .otherwise(lit("revoked")).as("status"),
      date_sub(col("origination_date"), 7).as("signed_date"))

  /** One collection instruction per payment of a direct-debit loan. */
  def collectionInstructions(payments: DataFrame, mandates: DataFrame): DataFrame =
    payments
      .join(mandates.select(col("loan_id"), col("mandate_id")), Seq("loan_id"), "inner")
      .select(
        instKey.as("instruction_id"),
        col("loan_id"),
        col("mandate_id"),
        col("due_date"),
        (col("amount_cents").cast(DoubleType) / 100.0).as("amount"),
        when(u(instKey, SaltInstrStatus) < 0.93, lit("executed"))
          .otherwise(lit("returned")).as("status"),
        when(u(instKey, SaltInstrStatus) >= 0.93, lit("insufficient_funds"))
          .cast(StringType).as("return_reason"))

  /** Forbearance/restructure events for ~5% of loans (p_forbearance). */
  def forbearanceEvents(loans: DataFrame): DataFrame =
    loans.filter(u(col("loan_id"), SaltForbearance) < 0.05).select(
      col("loan_id").as("event_id"),
      col("loan_id"),
      lit("restructure").as("event_type"),
      add_months(col("origination_date"), expr("term_months div 2")).as("event_date"),
      concat(lit("term="), col("term_months").cast(StringType)).as("old_terms"),
      concat(lit("term="), (col("term_months") + 12).cast(StringType)).as("new_terms"),
      (u(col("loan_id"), SaltForbearance) < 0.025).as("probation_flag"))

  /** Collections cases opened for defaulted loans 30 days after their
    * last paid installment. */
  def collectionsCases(loans: DataFrame): DataFrame =
    loans.filter(col("is_default")).select(
      (lit(900000L) + col("loan_id")).as("case_id"),
      col("loan_id"),
      date_add(add_months(col("origination_date"), expr("(term_months * 3) div 10")), 30)
        .as("opened_date"),
      lit(null).cast(DateType).as("closed_date"),
      element_at(array(lit("soft"), lit("field"), lit("legal")),
        (floor(u(col("loan_id"), SaltCaseStage) * 3) + 1).cast(IntegerType)).as("stage"),
      (u(col("loan_id"), SaltCaseRecovery) < 0.5).as("recovery_expected_flag"))

  /** The 17th OLTP table, `write_off_and_recovery` (reference
    * `pg_oltp_synth.py:907-939`): ~35% of collections cases get a
    * write-off with principal/interest/fees parts and an optional later
    * recovery when the case expects one. The reference stamps
    * `date.today()` minus a random offset; determinism requires an anchor
    * INSIDE the data, so the write-off date hangs off the case's
    * opened_date instead. Cents columns ride along so the downstream mart
    * can sum exactly in decimal. */
  def writeOffAndRecovery(cases: DataFrame): DataFrame = {
    val id = col("loan_id")
    cases.filter(u(id, SaltWriteoff) < 0.35)
      .withColumn("writeoff_date",
        date_add(col("opened_date"), (lit(1) + floor(u(id, SaltWoDate) * 180)).cast(IntegerType)))
      .withColumn("wo_principal_cents", lit(10000L) + floor(u(id, SaltWoPrincipal) * 190001).cast(LongType))
      .withColumn("wo_interest_cents", floor(u(id, SaltWoInterest) * 30001).cast(LongType))
      .withColumn("wo_fees_cents", floor(u(id, SaltWoFees) * 20001).cast(LongType))
      .withColumn("recovery_amount_cents",
        when(col("recovery_expected_flag"), expr("wo_principal_cents div 2")))
      .withColumn("recovery_date",
        when(col("recovery_expected_flag"), date_add(col("writeoff_date"), 90)))
      .select(
        col("loan_id").as("writeoff_id"),
        col("loan_id"),
        col("writeoff_date"),
        (col("wo_principal_cents").cast(DoubleType) / 100.0).as("writeoff_amount_principal"),
        (col("wo_interest_cents").cast(DoubleType) / 100.0).as("writeoff_amount_interest"),
        (col("wo_fees_cents").cast(DoubleType) / 100.0).as("writeoff_amount_fees"),
        col("recovery_expected_flag"),
        col("case_id").as("recovery_case_id"),
        lit(null).cast(LongType).as("recovery_payment_id"),
        (col("recovery_amount_cents").cast(DoubleType) / 100.0).as("recovery_amount"),
        col("recovery_date"),
        col("wo_principal_cents"), col("wo_interest_cents"), col("wo_fees_cents"),
        col("recovery_amount_cents"))
  }

  /** G10 + M7: the append-only audit/ops log — a union of per-stage
    * projections with templated reference strings (`pg_oltp_synth.py:
    * 491-492,694`; ref formats `:502,573-581`). Every column is
    * arithmetic/concat over already-deterministic inputs. */
  def auditLog(loans: DataFrame, payments: DataFrame): DataFrame = {
    val loanEvents = loans.select(
      lit("loan_contract").as("entity_type"),
      col("loan_id").as("entity_id"),
      lit("created").as("event"),
      col("origination_date").as("event_date"),
      concat(lit("LN-"), col("loan_id").cast(StringType),
        lit("-"), col("term_months").cast(StringType)).as("reference"),
      concat(lit("DE89**********"),
        lpad((col("loan_id") % 10000).cast(StringType), 4, "0")).as("masked_iban"))
    val paymentEvents = payments.select(
      lit("repayment_payment").as("entity_type"),
      col("loan_id").as("entity_id"),
      lit("posted").as("event"),
      col("payment_date").as("event_date"),
      concat(lit("EXT-"), col("loan_id").cast(StringType),
        lit("-"), col("installment_no").cast(StringType)).as("reference"),
      lit(null).cast(StringType).as("masked_iban"))
    loanEvents.union(paymentEvents)
      // intraday event time: deterministic hour/minute offsets off the
      // entity id (reference stamps now(); see D6 — modeled arithmetic)
      .withColumn("event_timestamp",
        expr("""timestampadd(MINUTE, cast((entity_id * 13) % 60 AS INT),
               |timestampadd(HOUR, cast((entity_id * 7) % 24 AS INT),
               |cast(event_date AS TIMESTAMP_NTZ)))""".stripMargin))
  }

  // ------------------------------------------------------------ annuity

  final case class LoanRow(
      loan_id: Long, principal_cents: Long, rate_bp: Long, term_months: Int,
      grace_period_months: Int, origination_date: java.sql.Date)

  final case class ScheduleRow(
      loan_id: Long, installment_no: Int, due_date: java.sql.Date,
      payment: Double, principal_due: Double, interest_due: Double,
      opening_balance: Double, closing_balance: Double)

  /** Fixed-point scale for the (1+r)^n factor: 1e9 keeps every
    * intermediate below 2^63 for term<=72, rate<22% while holding ~9
    * digits of precision. */
  val AnnuityScale = 1000000000L

  /** G5 annuity variant (M1+M3), exact integer cents: the (1+r)^n rate
    * factor is built in [[AnnuityScale]] fixed point by iterated
    * multiplication and the balance recurrence runs in cents, so the
    * schedule is bit-exactly reproducible by a DuckDB `WITH RECURSIVE`
    * twin — no `pow`, whose rounding is engine-divergent. The recurrence
    * is inherently sequential per loan, so it runs as a typed per-loan
    * `flatMap` (narrow, partition-parallel over loans — SURVEY.md
    * §7.3.4). The final installment retires the exact remaining balance:
    * closing_balance ends at exactly 0 and principal dues conserve the
    * principal to the cent. Due dates shift by the grace period exactly
    * like the closed-form methods (due_k = origination + grace + k). */
  def scheduleAnnuity(loans: DataFrame): Dataset[ScheduleRow] = {
    val spark = loans.sparkSession
    import spark.implicits._
    loans.select(col("loan_id"), col("principal_cents"), col("rate_bp"),
        col("term_months"), col("grace_period_months"), col("origination_date"))
      .as[LoanRow]
      .flatMap { l =>
        val S = AnnuityScale
        val n = l.term_months
        val rS = l.rate_bp * S / 120000L // monthly rate in S units
        var f = S // (1 + r)^k in S units
        var k0 = 0
        while (k0 < n) { f = f * (S + rS) / S; k0 += 1 }
        // pay = P * r * f/(f-1), ordered so every intermediate < 2^63:
        // ((P*rS) div 1e3) * ((f*1e6) div (f-S)) div 1e12
        val payCents =
          if (rS == 0L) l.principal_cents / n
          else l.principal_cents * rS / 1000L * (f * 1000000L / (f - S)) / 1000000000000L
        val orig = l.origination_date.toLocalDate
        var bal = l.principal_cents
        (1 to n).map { k =>
          val interest = bal * rS / S
          val principal = if (k == n) bal else payCents - interest
          val closing = bal - principal
          val row = ScheduleRow(
            l.loan_id, k,
            java.sql.Date.valueOf(orig.plusMonths((l.grace_period_months + k).toLong)),
            (principal + interest).toDouble / 100.0,
            principal.toDouble / 100.0, interest.toDouble / 100.0,
            bal.toDouble / 100.0, closing.toDouble / 100.0)
          bal = closing
          row
        }
      }
  }
}
