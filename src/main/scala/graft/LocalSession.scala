package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The one local-mode session builder shared by every CLI main (Verify,
  * Bench, Explain, ScaleProof) — previously four drifting copies; a
  * config change (new extension, local.dir policy) now lands once.
  *
  * `spark.local.dir` on tmpfs: this box shows heavy external-disk
  * iowait, which otherwise dominates small-shuffle wall times. */
object LocalSession {

  def fromEnv(logLevel: String = "WARN"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }

  /** Materialize `df`'s OWN QueryExecution and return its AQE-FINAL
    * physical plan. `df.count()` would execute a DIFFERENT
    * QueryExecution (`groupBy().count()`), leaving `df.queryExecution`
    * un-run with `isFinalPlan=false` — the initial estimate, not what
    * actually executed. Executing the plan's RDD drives adaptive
    * re-planning to completion; rows stay distributed (nothing is
    * collected). Returns (rowCount, finalPlan). */
  def runToFinalPlan(df: org.apache.spark.sql.DataFrame): (Long, SparkPlan) = {
    val exec = df.queryExecution.executedPlan
    val rows = exec.execute().count()
    val finalPlan = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (rows, finalPlan)
  }
}
