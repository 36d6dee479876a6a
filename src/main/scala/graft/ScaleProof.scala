package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.synth.Synth

/** Bench-only 100× synthesis scale proof (not a correctness query — no
  * oracle; the same pipeline at 1× is hash-checked as
  * `synth_npl_monthly`).
  *
  * The generator's scale posture claim (Synth.scala object doc) is that
  * generation is embarrassingly parallel over loan ids and row counts
  * grow linearly with `nLoans`, so the SAME program shapes a
  * 1000-executor synthesis run. This main demonstrates it: the full
  * generator → staging → `Marts.nplMonthly` loop at 1× / 10× / 100× the
  * reference volumes (nLoans 1,500 → 150,000; reference config
  * `pg_oltp_synth.py:26-28`), asserting
  *  - wall-time grows at most ~linearly (t_100x ≤ 100 × t_1x × slack,
  *    and sublinearly in practice since fixed overhead amortizes);
  *  - the physical plan keeps the SAME shuffle count at every factor
  *    (no new exchange appears as data grows — scaling changes task
  *    counts, never the plan shape);
  *  - driver heap stays flat (the expansion happens in executor-side
  *    narrow flatMaps/explodes; nothing is collected).
  *
  * Prints one JSON line; recorded in BASELINE.md / COVERAGE.md.
  */
object ScaleProof {

  private def pipeline(spark: SparkSession, factor: Int): DataFrame = {
    val cfg = Synth.Config(
      nBorrowers = 2000 * factor,
      nApplications = 3000 * factor,
      nLoans = 1500 * factor)
    val loans = Synth.loans(spark, cfg)
    val snaps = Synth.dpdSnapshots(Synth.payments(Synth.scheduleLinear(loans)))
    val dpd = snaps
      .join(loans.select(
        col("loan_id"), col("product_type"), col("currency"),
        (col("principal_cents").cast(DecimalType(20, 2)) / lit(100))
          .cast(DecimalType(18, 2)).as("exposure")),
        Seq("loan_id"), "inner")
      .withColumn("npl_flag", col("nonperforming_flag"))
    graft.credit.Marts.nplMonthly(dpd)
  }

  private def usedHeapMb(): Long = {
    System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val spark = LocalSession.fromEnv()
    // absorb one-time session/codegen setup so factor=1 isn't inflated
    spark.range(1000000).selectExpr("sum(id)").collect()

    val factors = Seq(1, 10, 100)
    val runs = factors.map { f =>
      val mart = pipeline(spark, f)
      val t0 = System.nanoTime()
      // runs the mart's OWN QueryExecution (df.count() would execute a
      // separate one, leaving this plan an unexecuted initial estimate)
      // and returns the AQE-FINAL plan — so the exchange count below is
      // what actually executed, including any runtime join demotions
      val (rows, finalPlan) = LocalSession.runToFinalPlan(mart)
      val sec = (System.nanoTime() - t0) / 1e9
      // scaling must change task counts, never plan shape
      val exchanges = finalPlan.toString()
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      val heap = usedHeapMb()
      spark.catalog.clearCache()
      (f, sec, rows, exchanges, heap)
    }
    val bySec = runs.map { case (f, s, _, _, _) => f -> s }.toMap
    val byEx = runs.map { case (f, _, _, e, _) => f -> e }.toMap
    val ratio = bySec(100) / bySec(1)
    // linear = ratio ≤ 100; require it with 1.5x slack (local noise),
    // and identical shuffle structure at every factor
    val linearOk = ratio <= 150.0
    val planOk = byEx.values.toSet.size == 1
    // "flat driver memory" in local mode means BOUNDED: this JVM also
    // hosts every executor (shuffle buffers, map statuses), so heap scales
    // with active executor state, not with collected data — the proof is
    // that it stays far below the data volume and nothing OOMs
    val heapOk = runs.map(_._5).max < 4096
    // Locale.ROOT: the f"" interpolator uses the JVM default locale, which
    // under e.g. de_DE prints a comma decimal separator — invalid JSON
    def s2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val runsJson = runs.map { case (f, s, r, e, h) =>
      s"""{"factor":$f,"sec":${s2(s)},"mart_rows":$r,"exchanges":$e,"jvm_heap_mb":$h}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"scale_proof","pipeline":"synth->nplMonthly","runs":$runsJson,""" +
      s""""t100x_over_t1x":${s2(ratio)},"linear_ok":$linearOk,"plan_shape_stable":$planOk,""" +
      s""""heap_bounded":$heapOk}""")
    // stop() BEFORE the exit-code decision: the failing path must not
    // skip session shutdown (stray /dev/shm shuffle dirs, noisy
    // shutdown-hook logs from an abrupt JVM teardown)
    spark.stop()
    if (!linearOk || !planOk || !heapOk) sys.exit(1)
  }
}
