package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Snapshots}

/** Window/snapshot operator specs: month-end top-1 dedup with total-order
  * tiebreakers, lag over OBSERVED months (gaps preserved — reference
  * fct_roll_rate_monthly.sql:17 semantics), daily densification, and the
  * internal-column collision guards. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def arrears = Seq(
    // (loan, date, tiebreak, bucket) — loan 1 has two rows on the month-end day
    (1L, "2021-01-05", 1L, "0"),
    (1L, "2021-01-28", 2L, "1-30"),
    (1L, "2021-01-28", 3L, "31-60"), // wins on tiebreak desc
    (1L, "2021-03-10", 4L, "0"),     // February gap
    (2L, "2021-01-15", 5L, "61-90")
  ).toDF("loan_id", "d", "tb", "dpd_bucket")
    .withColumn("as_of_date", to_date(col("d"))).drop("d")

  test("monthEnd keeps exactly the last row per (loan, month) with tiebreak") {
    val me = Snapshots.monthEnd(arrears, col("loan_id"), col("as_of_date"), col("tb"))
    val got = me.select(col("loan_id"), col("month").cast("string"), col("dpd_bucket"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "2021-01-01", "31-60"),
      (1L, "2021-03-01", "0"),
      (2L, "2021-01-01", "61-90")))
  }

  test("withPrev lags over observed months — a calendar gap is NOT filled") {
    val me = Snapshots.monthEnd(arrears, col("loan_id"), col("as_of_date"), col("tb"))
    val prev = Snapshots.withPrev(me.select(col("loan_id"), col("month"), col("dpd_bucket")),
      col("loan_id"), col("month"), col("dpd_bucket"), "prev_bucket")
    val march = prev.filter(col("month") === "2021-03-01")
      .select(col("prev_bucket")).as[String].collect().toSeq
    assert(march == Seq("31-60")) // prev is January (last OBSERVED), not February
  }

  test("monthEnd fails fast when the input already has a month column") {
    val bad = arrears.withColumn("month", lit(1))
    val e = intercept[IllegalArgumentException] {
      Snapshots.monthEnd(bad, col("loan_id"), col("as_of_date"))
    }
    assert(e.getMessage.contains("month"))
  }

  test("densifyDaily emits one row per day inclusive") {
    val df = Seq(("2021-01-01", "2021-01-04")).toDF("s", "e")
      .select(to_date(col("s")).as("s"), to_date(col("e")).as("e"))
    val out = Snapshots.densifyDaily(df, col("s"), col("e"), "day")
    assert(out.count() == 4)
    assert(out.select(min(col("day")).cast("string"), max(col("day")).cast("string"))
      .as[(String, String)].collect().head == ("2021-01-01", "2021-01-04"))
  }

  test("asOfJoin: latest right row at-or-before each left time; null before first; inclusive tie") {
    val sched = Seq(
      (1L, 1, "2021-02-15"), // after first rate
      (1L, 2, "2021-05-01"), // EXACTLY at the second rate's effective_from -> inclusive
      (1L, 3, "2021-08-01"), // after second
      (2L, 1, "2020-12-31"), // before loan 2's only rate -> null
      (3L, 1, "2021-07-01")  // matched row has a NULL value field
    ).toDF("loan_id", "installment_no", "d")
      .withColumn("due_date", to_date(col("d"))).drop("d")
    val rates = Seq(
      (1L, "2021-01-01", Some(0.05)), (1L, "2021-05-01", Some(0.07)),
      (2L, "2021-01-01", Some(0.03)),
      (3L, "2021-01-01", Some(0.04)), (3L, "2021-06-01", None)
    ).toDF("loan_id", "ef", "annual_rate")
      .withColumn("effective_from", to_date(col("ef"))).drop("ef")
    val got = AsOf.asOfJoin(sched, rates, Seq("loan_id"), "due_date", "effective_from")
      .select(col("loan_id"), col("installment_no"), col("annual_rate"))
      .as[(Long, Int, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 1, Some(0.05)), (1L, 2, Some(0.07)), (1L, 3, Some(0.07)),
      (2L, 1, None),
      // the June row MATCHES and its null field must come through — not
      // be resurrected from the older January row
      (3L, 1, None)))
  }

  test("asOfJoin: duplicate right timestamps resolve deterministically (largest bundle wins)") {
    val left = Seq((1L, 1, "2021-06-01")).toDF("loan_id", "installment_no", "d")
      .withColumn("due_date", to_date(col("d"))).drop("d")
    // two right rows at the SAME effective_from: the bundle tiebreaker
    // must pick the larger value struct, identically on every run
    val rates = Seq((1L, "2021-01-01", 0.03), (1L, "2021-01-01", 0.09))
      .toDF("loan_id", "ef", "annual_rate")
      .withColumn("effective_from", to_date(col("ef"))).drop("ef")
    (1 to 3).foreach { _ =>
      val got = AsOf.asOfJoin(left, rates, Seq("loan_id"), "due_date", "effective_from")
        .select(col("annual_rate")).as[Double].collect().toSeq
      assert(got == Seq(0.09), s"expected the max-bundle survivor, got $got")
    }
  }

  test("asOfJoinForward: earliest right row at-or-after; inclusive tie; tolerance nulls the bundle") {
    val left = Seq((1L, 10L, 100L), (1L, 11L, 250L), (1L, 12L, 300L), (2L, 13L, 50L))
      .toDF("k", "lid", "lt")
    val right = Seq((1L, 250L, "a"), (1L, 400L, "b"))
      .toDF("k", "rt2", "v")
    val noTol = AsOf.asOfJoinForward(left, right, Seq("k"), "lt", "rt2")
      .select(col("lid"), col("v")).as[(Long, Option[String])].collect().toMap
    // 100 -> first at/after is 250; 250 -> inclusive; 300 -> 400;
    // key 2 has no right rows -> null
    assert(noTol == Map(10L -> Some("a"), 11L -> Some("a"),
      12L -> Some("b"), 13L -> None))
    val tol = AsOf.asOfJoinForward(left, right, Seq("k"), "lt", "rt2", Some(120L))
      .select(col("lid"), col("v")).as[(Long, Option[String])].collect().toMap
    // 250-100=150 > 120 -> nulled; 250-250=0 and 400-300=100 within
    assert(tol == Map(10L -> None, 11L -> Some("a"), 12L -> Some("b"), 13L -> None))
  }

  test("sessionize: quiet gaps split sessions per key; numbering 1-based in event order") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 40L, 2L), (1L, 200L, 3L), // 40<=gap joins; 160>gap splits
      (2L, 500L, 4L)
    ).toDF("user_id", "ts", "event_id")
    val got = graft.operators.Sessions
      .sessionize(df, col("user_id"), col("ts"), 50L, Seq(col("ts").asc, col("event_id").asc))
      .select(col("user_id"), col("event_id"), col("session_no"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("samplePerGroup: exact k per stratum, whole small strata, partition-independent") {
    val df = ((1L to 100L).map(i => (i, "big")) ++ Seq((200L, "small"), (201L, "small")))
      .toDF("id", "stratum")
    def ids(d: org.apache.spark.sql.DataFrame) = graft.operators.Sampling
      .samplePerGroup(d, Seq(col("stratum")), col("id"), 10)
      .select(col("id")).as[Long].collect().toSet
    val a = ids(df)
    assert(a.count(_ <= 100L) == 10 && a.count(_ >= 200L) == 2)
    assert(ids(df.repartition(13)) == a) // hash-ranked: layout-independent
  }

  test("topOnePerGroup is deterministic under a total order") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "ord", "v")
    val top = Snapshots.topOnePerGroup(df, Seq(col("k")), Seq(col("ord").desc))
    assert(top.select(col("k"), col("v")).as[(Long, String)].collect().toSet ==
      Set((1L, "b"), (2L, "c")))
  }

  test("compressIntervals collapses runs, splits on change, and handles NULL states") {
    val rows = Seq(
      (1L, 1, Some("a")), (1L, 2, Some("a")), (1L, 3, Some("b")),
      (1L, 4, Some("a")),                       // back to a: NEW island
      (2L, 1, None), (2L, 2, None),             // all-NULL run compresses
      (2L, 3, Some("x"))
    ).toDF("k", "t", "state")
    val got = Snapshots.compressIntervals(rows, Seq("k"), "t", Seq("state"))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Int]("valid_from")) ->
        ((r.getAs[String]("state"), r.getAs[Int]("valid_to"), r.getAs[Long]("n_rows"))))
      .toMap
    assert(got == Map(
      (1L, 1) -> (("a", 2, 2L)),
      (1L, 3) -> (("b", 3, 1L)),
      (1L, 4) -> (("a", 4, 1L)),
      (2L, 1) -> ((null, 2, 2L)),
      (2L, 3) -> (("x", 3, 1L))))
    // the whole operator is ONE shuffle: windows + grouping share the key
    val ex = "Exchange hashpartitioning".r.findAllIn(
      Snapshots.compressIntervals(rows, Seq("k"), "t", Seq("state"))
        .queryExecution.executedPlan.toString).length
    assert(ex == 1, s"compressIntervals planned $ex exchanges, want 1")
  }

  test("histogramQuantile interpolates the cumulative grid deterministically") {
    import spark.implicits._
    // 100 uniform values 0..99, one group: width 10 -> p50 lands at the
    // bucket-4/5 boundary, interpolation gives exactly 50.0; p95 -> 95.0
    val df = (0 until 100).map(v => ("g", v.toDouble)).toDF("k", "value")
    val got = graft.operators.Quantiles
      .histogramQuantile(df, Seq("k"), "value", 10.0,
        Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().head
    assert(got.getAs[Double]("p50") == 50.0 && got.getAs[Double]("p95") == 95.0)
    // partition-layout independent (the determinism t-digest can't give)
    val re = graft.operators.Quantiles
      .histogramQuantile(df.repartition(13), Seq("k"), "value", 10.0,
        Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().head
    assert(re.getAs[Double]("p50") == 50.0 && re.getAs[Double]("p95") == 95.0)
    // within one bucket width of the exact percentile on a skewed group,
    // and NULLs are excluded like any SQL aggregate
    val skew = (1 to 1000).map(v => ("s", Some(v * v / 1000.0))) :+ (("s", Option.empty[Double]))
    val sdf = skew.toDF("k", "value")
    val est = graft.operators.Quantiles
      .histogramQuantile(sdf, Seq("k"), "value", 5.0, Seq("p50" -> 0.5))
      .collect().head.getAs[Double]("p50")
    val exact = sdf.selectExpr("percentile(value, 0.5) AS p").collect().head.getAs[Double]("p")
    assert(math.abs(est - exact) <= 5.0, s"est=$est exact=$exact")
  }

  test("interpolateDaily fills gaps on the straight line, endpoints exact") {
    val obs = Seq(
      (1L, "2021-01-01", 100L),
      (1L, "2021-01-05", 300L), // 4-day gap: 150/200/250 interpolated
      (1L, "2021-01-06", 280L), // adjacent days: no synthetic rows
      (2L, "2021-02-01", 7L)    // singleton key: one observed row
    ).toDF("k0", "d", "v")
      .withColumn("day0", to_date(col("d")))
    val got = Snapshots
      .interpolateDaily(obs, col("k0"), col("day0"), col("v"))
      .select(col("k"), col("day").cast("string"), col("value_interp"), col("is_observed"))
      .as[(Long, String, Double, Boolean)].collect().toSet
    assert(got == Set(
      (1L, "2021-01-01", 100.0, true),
      (1L, "2021-01-02", 150.0, false),
      (1L, "2021-01-03", 200.0, false),
      (1L, "2021-01-04", 250.0, false),
      (1L, "2021-01-05", 300.0, true),
      (1L, "2021-01-06", 280.0, true),
      (2L, "2021-02-01", 7.0, true)))
  }
}
