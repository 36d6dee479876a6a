package graft

import org.apache.spark.sql.functions._

import graft.sources.Load

/** Load-path specs: deterministic first-wins dedup (S4), reproducible
  * surrogate keys (S5), and the partitioned parquet sink (S3). */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  test("firstWins keeps the smallest row under the given order, idempotently") {
    val df = Seq((1L, "2021-01-01", 10L, "first"), (1L, "2021-01-01", 20L, "later"),
      (2L, "2021-01-02", 5L, "only")).toDF("loan_id", "as_of_date", "seq", "v")
    val out = Load.firstWins(df, Seq(col("loan_id"), col("as_of_date")), Seq(col("seq").asc))
    assert(out.select(col("v")).as[String].collect().toSet == Set("first", "only"))
    // idempotent: applying again changes nothing
    assert(Load.firstWins(out, Seq(col("loan_id"), col("as_of_date")), Seq(col("seq").asc))
      .count() == out.count())
  }

  test("withSurrogateKeys assigns dense reproducible ids from an offset") {
    val df = Seq("c", "a", "b").toDF("v")
    val keyed = Load.withSurrogateKeys(df, "id", 10000L, Seq(col("v")))
    assert(keyed.select(col("v"), col("id")).as[(String, Long)].collect().toSet ==
      Set(("a", 10001L), ("b", 10002L), ("c", 10003L)))
  }

  test("writePartitioned round-trips with partition pruning layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_load").toString
    val df = Seq((1L, "EUR", 10.0), (2L, "USD", 20.0), (3L, "EUR", 30.0))
      .toDF("id", "currency", "amount")
    Load.writePartitioned(df, dir, Seq("currency"), Seq("id"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.filter(col("currency") === "EUR").count() == 2)
    // partition directories exist -> pruning-capable layout
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("currency=")))
  }
}
