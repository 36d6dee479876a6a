package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Prints a per-query stdout MANIFEST line (`[verify-manifest] {...}`
  * with rows written) and a final summary line, so the round's artifacts
  * carry a secondary correctness signal even if the driver's DuckDB step
  * dies downstream (r9's CORRECTNESS_r09.json came back `{}` with no
  * diagnosable trace — the manifest pinpoints where the driver diverges
  * from the green local replica). */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for fast local
    // iteration on one oracle (the driver always runs the full set)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val spark = LocalSession.fromEnv()
    new java.io.File(outDir).mkdirs()
    var (nOk, nFailed) = (0, 0)
    val perQuery = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    SparkEntry.queries.filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
      val rows: Long =
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // footer-only count of what was just written — cheap, and it is
          // the exact frame the driver's DuckDB compare will read
          spark.read.parquet(s"$outDir/$name").count()
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          -1L
        }
      if (rows >= 0L) nOk += 1 else nFailed += 1
      perQuery += ((name, rows))
      println(s"""[verify-manifest] {"query":"$name","rows":$rows}""")
      // caches built by a query (minhash signatures, shingle sets) must
      // not occupy storage memory for the remaining queries
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = SparkEntry.oracleSql.filter(o => only.forall(_.contains(o._1)))
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val maxOracle = if (oracle.isEmpty) "null"
      else { val (k, v) = oracle.maxBy(_._2.length); s"""{"query":${q(k)},"bytes":${v.length}}""" }
    val summary = s"""{"verify_queries":${nOk + nFailed},"ok":$nOk,""" +
      s""""failed":$nFailed,"oracle_entries":${oracle.size},""" +
      s""""oracle_sql_bytes":${json.length},"largest_oracle":$maxOracle}"""
    println(s"[verify-manifest] $summary")
    // the same evidence CO-LOCATED with the parquet the compare reads:
    // if the downstream DuckDB step dies and stdout is lost (both
    // happened around r9/r10), outDir still records what Verify produced
    val rowsJson = perQuery.map { case (n, r) => s"${q(n)}: $r" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      s"""{"summary":$summary,"rows":$rowsJson}""")
    spark.stop()
  }
}
