package graft

/** Batch [[Explain]]: write `.explain("formatted")` for a list of
  * registered queries to files — the before/after plan evidence an
  * optimization round commits (`plans/r<N>/<query>_<tag>.txt`).
  *
  * {{{
  *   sbt 'runMain graft.PlanDump plans/r20 before curation_pipeline,lang_profiles [sfDir]'
  * }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = LocalSession.fromEnv(logLevel = "ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      // capture the formatted string (df.explain prints to stdout only)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
