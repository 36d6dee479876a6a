package graft

/** The calibration probe as its OWN tiny main, run in a FRESH forked
  * JVM by [[Bench]] for BOTH the pre and the post probe. Rationale
  * (r17, measured): an in-process post-probe reads the bench JVM's
  * lifecycle phase — 275+ queries' codegen classes and GC pressure
  * inflate it to 0.65–0.78 s regardless of host speed, while the
  * in-process pre-probe (taken in a just-started JVM) reads 0.4–0.8 —
  * so on a fast host the pre/post ratio rule fired intrinsically and
  * no full-inventory sweep could ever be calibration-clean. Forking
  * both probes makes them like-with-like: same flags (inherited from
  * the parent JVM), no codegen/GC history, so pre≈post on an idle
  * host and a genuine mid-sweep load burst still shows up as post ≫
  * pre. The probe workload and the 0.9 s band are UNCHANGED. */
object CalProbe {
  /** Fixed CPU-bound probe workload (wide range-sum + a small hash
    * aggregate — no disk, no data dependence): a property of the
    * machine at run time, not of this repo's code. Shared by the
    * forked probe and [[Bench]]'s in-process fallback. */
  def work(spark: org.apache.spark.sql.SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(50000000L).selectExpr("sum(id)").collect()
    spark.range(2000000L).selectExpr("id % 1024 as k")
      .groupBy("k").count().selectExpr("sum(count)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = LocalSession.fromEnv()
    // absorb session init + the probe's own codegen/plan setup untimed,
    // exactly as Bench's warmup + first untimed calibrate() always did
    spark.range(1000000L).selectExpr("sum(id)").collect()
    work(spark)
    val t = work(spark)
    // parseable marker line; Spark's own logging goes to stderr.
    // Locale.ROOT: a comma-decimal default locale would print
    // `CALPROBE 0,4567` and the parent's [0-9.]+ regex would silently
    // accept `0` (r18 advisor)
    println(String.format(java.util.Locale.ROOT, "CALPROBE %.4f", Double.box(t)))
    spark.stop()
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.fromEnv()
    // Untimed warmup: absorb Spark-core/session initialization (task
    // scheduler, codegen infra) so the first alphabetical query doesn't
    // carry ~5s of one-time setup. Query-specific work is still timed.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Load-calibration sentinel ([[CalProbe.work]]): a FIXED CPU-bound
    // op timed before and after the query loop. Its cost is a property
    // of the machine at run time, not of this repo's code, so a reader
    // comparing two rounds' totals can normalize by calibration_sec
    // first: the r7 driver run measured every query 2-3.5x slower than
    // an idle box — including plans untouched that round — and nothing
    // in the emitted JSON could prove the inflation was box contention.
    // Now it can.
    //
    // SINCE r18 both probes run in a FRESH forked JVM (same binary,
    // same JVM flags, same env — see [[CalProbe]]): the r17 rounds
    // proved the in-process post-probe measures the bench JVM's
    // codegen/GC phase, not host speed, so pre and post bracketed
    // different lifecycle phases and the ratio rule fired intrinsically
    // on fast hosts (7+ refused sweeps with mutually-consistent totals).
    // Forked probes are like-with-like; the workload and the 0.9 s band
    // are unchanged, so figures remain comparable with the r15-r17
    // committed artifacts (whose PRE probes were fresh-JVM-equivalent).
    def inProcCalibrate(): Double = CalProbe.work(spark)
    var probeMode = "forked-jvm"
    def forkedProbe(): Option[Double] = {
      try {
        import scala.jdk.CollectionConverters._
        val javaBin = java.nio.file.Paths
          .get(System.getProperty("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toSeq
        val cmd = Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", System.getProperty("java.class.path"), "graft.CalProbe")
        val pb = new ProcessBuilder(cmd.asJava)
        // child stderr (Spark logging) flows to ours — an unread pipe
        // could fill and deadlock the child. Child stdout goes to a
        // temp FILE, not a pipe: readAllBytes on a piped stdout would
        // block forever if the child hangs without closing it, making
        // the waitFor timeout/destroyForcibly path unreachable (r18
        // advisor) — with a file sink, waitFor runs FIRST and the
        // marker is read only after the child exits or is killed.
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val outFile = java.nio.file.Files.createTempFile("calprobe", ".out")
        outFile.toFile.deleteOnExit()
        pb.redirectOutput(outFile.toFile)
        val proc = pb.start()
        val done = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
        val res =
          if (!done) { proc.destroyForcibly(); None }
          else {
            val out = new String(java.nio.file.Files.readAllBytes(outFile),
              java.nio.charset.StandardCharsets.UTF_8)
            "CALPROBE ([0-9.]+)".r.findAllMatchIn(out).toSeq.lastOption
              .map(_.group(1).toDouble)
              // a zero probe can only be a parse artifact (the probe
              // does fixed nontrivial work); refuse it rather than
              // corrupt the calibration gate
              .filter(_ > 0.0)
          }
        java.nio.file.Files.deleteIfExists(outFile)
        res
      } catch { case e: Throwable =>
        System.err.println(s"[bench] forked probe failed: ${e.getMessage}")
        None
      }
    }
    // in-process fallback keeps the artifact honest if forking is ever
    // unavailable (mode is recorded in the JSON either way); the
    // fallback's first run needs the sentinel's codegen absorbed
    def probe(): Double = forkedProbe().getOrElse {
      if (probeMode != "inproc-fallback") {
        System.err.println("[bench] falling back to in-process calibration probes")
        probeMode = "inproc-fallback"
        inProcCalibrate() // untimed codegen/plan setup for the fallback path
      }
      inProcCalibrate()
    }
    // CALIBRATION GATE (round-15 finding: the committed artifact was
    // captured in a degraded-host window — probe 1.37 s vs the 0.60–0.92 s
    // idle band — and nothing in the pipeline objected). The band is
    // PINNED here: a sweep only counts as cross-round comparable when
    // pre and post probes are both inside the band AND agree within the
    // ratio (load arriving mid-sweep inflates post but not pre). The
    // pre-probe retries with a backoff so a transient co-located burst
    // (the driver's DuckDB oracle, a GC storm) can pass; the verdict is
    // RECORDED in the JSON either way — a hard abort would cost the
    // round its numbers entirely when the box never settles, which is
    // strictly worse than a labeled-incomparable artifact.
    // A typo'd override must not cost the round its numbers: fall back
    // to the default on any unparseable value (stdout-first posture).
    def envNum[A](name: String, parse: String => A, default: A): A =
      sys.env.get(name).flatMap(v => scala.util.Try(parse(v)).toOption match {
        case None =>
          System.err.println(s"[bench] ignoring malformed $name='$v'; using $default")
          None
        case ok => ok
      }).getOrElse(default)
    val calMax = envNum("SPARK_GRAFT_CAL_MAX", _.toDouble, 0.90)
    val calMaxRatio = 1.3
    val calRetries = envNum("SPARK_GRAFT_CAL_RETRIES", _.toInt, 3)
    val calWaitSec = envNum("SPARK_GRAFT_CAL_WAIT_SEC", _.toInt, 20)
    // NOTE (r17, measured): a "settle the box first" warmup before the
    // pre-probe was tried and REVERTED — 75 s of sustained load drives
    // an IN-PROCESS probe DOWN to 0.10–0.18 s because it partly reads
    // Spark-runtime warmth, not host speed. The r18 forked-JVM probes
    // are immune to that failure mode by construction: every probe
    // starts from the same cold-JVM phase.
    var calPre = probe()
    var preAttempts = 1
    while (calPre > calMax && preAttempts <= calRetries) {
      System.err.println(f"[bench] calibration probe $calPre%.2fs above the " +
        f"$calMax%.2fs band (attempt $preAttempts/$calRetries); waiting ${calWaitSec}s")
      Thread.sleep(calWaitSec * 1000L)
      calPre = probe()
      preAttempts += 1
    }
    // A failed query must NOT masquerade as a fast timing (judge flagged
    // this round 1): record -1 and list it in "errors".
    // Each query runs TWICE and reports the min: this box's noisy external
    // disk (iowait spikes) and codegen-cache churn can 5-10x a single
    // sample (round-3 bench showed npl_monthly at 6x its identical-plan
    // SQL twin), and min-of-2 is the cheapest stable estimator.
    // optional comma-separated filter for local iteration on a few queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try {
        val t1 = once()
        // run 2 must not reuse run 1's internal .cache() frames (the
        // cache manager matches canonicalized plans across invocations);
        // and a TRANSIENT run-2 failure must not discard run 1's valid
        // sample — only a run-1 failure marks the query broken
        spark.catalog.clearCache(); System.gc()
        val t2 = try Some(once()) catch { case e: Throwable =>
          System.err.println(s"[bench] $name run 2 failed (keeping run 1): ${e.getMessage}"); None }
        // When the two samples disagree by >2x, one of them hit a load
        // spike — min-of-2 still returns the right value, but a third
        // sample makes the min robust to the case where BOTH early runs
        // were degraded in the same burst (observed on the r7 driver box)
        val t3 = t2.filter(b => math.max(t1, b) / math.min(t1, b) > 2.0).flatMap { _ =>
          spark.catalog.clearCache(); System.gc()
          try Some(once()) catch { case e: Throwable =>
            System.err.println(s"[bench] $name run 3 failed (keeping earlier): ${e.getMessage}"); None }
        }
        Some((Seq(t1) ++ t2 ++ t3).min)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); None }
      // isolate queries: drop cached frames, and nudge the driver GC so
      // the ContextCleaner reclaims now-unreferenced broadcasts (the knn
      // index) — clearCache alone does not release broadcast variables
      spark.catalog.clearCache()
      System.gc()
      (name, t.getOrElse(-1.0), t.isDefined)
    }
    val calPost = probe()
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // pre/post bracket the whole loop: if either is inflated vs a known
    // idle-box figure (~1s on this class of machine), the totals in this
    // very artifact were taken under external load
    def s2c(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val calOk = calPre <= calMax && calPost <= calMax &&
      math.max(calPre, calPost) / math.min(calPre, calPost) <= calMaxRatio
    if (!calOk) System.err.println(f"[bench] WARNING: calibration out of band " +
      f"(pre $calPre%.2f post $calPost%.2f, band <=$calMax%.2f ratio<=$calMaxRatio) — " +
      "totals in this artifact are NOT cross-round comparable")
    val cal = s""""calibration_sec":{"pre":${s2c(calPre)},"post":${s2c(calPost)},""" +
      s""""band_max":${s2c(calMax)},"band_max_ratio":$calMaxRatio,""" +
      s""""pre_attempts":$preAttempts,"probe_mode":"$probeMode","ok":$calOk}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$cal,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // stdout FIRST — a file-write failure (read-only cwd, disk full)
    // must not cost the round its headline number
    println(line)
    // Full-precision line also to files (survives any capture window).
    // The per-sf name exists because the fixed name is a shared path:
    // two tiers benched concurrently would clobber each other there.
    try {
      val sfTag = java.nio.file.Paths.get(sfDir).getFileName.toString
        .replaceAll("[^A-Za-z0-9._-]", "_")
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"bench_out_$sfTag.json"), line + "\n")
    } catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write bench_out files: ${e.getMessage}")
    }
    // The driver keeps only the LAST ~2000 chars of stdout, and with 80
    // registered queries the full line is ~2600 — it truncated mid-JSON in
    // r4 AND r5 ("parsed": null), losing the round's headline number. So
    // the final stdout line is a COMPACT twin guaranteed to fit: 2-decimal
    // seconds, slowest queries first, entries added until a 1800-char
    // budget, the tail of fast queries folded into queries_omitted /
    // omitted_sec. Printed last so any last-line / last-parseable-line
    // capture finds a complete JSON object.
    //
    // r6 post-mortem: the compact line WAS complete inside the captured
    // tail and parse still failed — the 2000-char window opened mid-way
    // through the preceding full-precision line, so a find('{')..rfind('}')
    // span parser saw fragment+compact concatenated (invalid), and every
    // line carried sbt's "[info] " prefix (fixed via run/outputStrategy =
    // StdoutOutput in build.sbt). Two more defenses here: (a) brace-free
    // PADDING lines between the full line and the compact line, sized past
    // the window, so the window always opens in neutral filler and the
    // only braces it contains are the compact line's own; (b) the compact
    // budget leaves slack for sbt's "[success] ..." footer (brace-free)
    // inside the same window.
    def s2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val head = s"""{"metric":"total","value":${s2(total)},"unit":"sec","queries":{"""
    val suffix = s""",$cal,"errors":$errs,"sf":"$sfDir","full":"bench_out.json"}"""
    // 60 chars of slack for the queries_omitted/omitted_sec fields
    val budget = 1800 - head.length - suffix.length - 60
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    var used = 0
    var omitted = 0
    var omittedSec = 0.0
    var atCapacity = false // strict slowest-first prefix: once one entry
    // doesn't fit, fold EVERYTHING after it — later shorter names must
    // not displace a slower query from the listing
    results.filter(_._3).sortBy(-_._2).foreach { case (k, v, _) =>
      val e = "\"" + k + "\":" + s2(v)
      if (!atCapacity && used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      else { atCapacity = true; omitted += 1; omittedSec += v }
    }
    val omittedPart =
      if (omitted == 0) ""
      else s""","queries_omitted":$omitted,"omitted_sec":${s2(omittedSec)}"""
    // 2500+ chars of brace-free filler: guarantees the driver's 2000-char
    // stdout-tail window opens inside padding, never mid-JSON
    (1 to 25).foreach(_ => println("#" * 100))
    println(head + entries.mkString(",") + "}" + omittedPart + suffix)
    spark.stop()
  }
}
