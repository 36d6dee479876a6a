package graft


/** Plan-audit tool: print the formatted physical plan (and optionally the
  * AQE-final plan after execution) for any registered query.
  *
  * {{{
  *   sbt 'runMain graft.Explain multimodal_decode /root/testdata/sf0.001'
  *   sbt 'runMain graft.Explain npl_monthly /root/testdata/sf0.01 run'
  * }}}
  *
  * The third arg `run` executes the query first so the printed plan is the
  * adaptive FINAL plan (actual join strategies, coalesced partitions),
  * not the initial estimate.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val runFirst = args.length > 2 && args(2) == "run"
    val spark = LocalSession.fromEnv(logLevel = "ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; registered: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, sfDir)
    if (runFirst) {
      // df's OWN QueryExecution must run (df.count() would execute a
      // different one and leave this plan an isFinalPlan=false estimate)
      val (_, finalPlan) = LocalSession.runToFinalPlan(df)
      println(finalPlan.toString())
    } else df.explain("formatted")
    spark.stop()
  }
}
