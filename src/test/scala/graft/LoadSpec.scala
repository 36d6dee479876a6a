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

  test("withDenseIds equals the global row_number across shard boundaries and sparse ids") {
    import org.apache.spark.sql.functions._
    // sparse, unordered ids spanning 4 shards of size 10 (incl. an empty shard)
    val ids = Seq(35L, 2L, 17L, 0L, 38L, 11L, 9L, 31L)
    val df = ids.map(i => (i, s"p$i")).toDF("k", "payload").repartition(5)
    val got = graft.sources.Load.withDenseIds(df, "k", "dense_id", 10L)
      .select(col("k"), col("dense_id")).as[(Long, Long)].collect().toMap
    val want = ids.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("writeBucketed: co-located join reads both sides without a shuffle") {
    val fact = (1L to 1000L).map(i => (i % 50, i, i * 2.0)).toDF("loan_id", "seq", "v")
    val dim = (0L until 50L).map(i => (i, s"p$i")).toDF("loan_id", "product")
    Load.writeBucketed(fact, "b_fact", "loan_id", 4, Seq("loan_id"))
    Load.writeBucketed(dim, "b_dim", "loan_id", 4, Seq("loan_id"))
    val joined = spark.table("b_fact").join(spark.table("b_dim"), Seq("loan_id"), "inner")
    assert(joined.count() == 1000)
    // bucketed-on-both-sides equi-join plans with NO shuffle exchange
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
  }

  test("distinctCountSkewSafe equals countDistinct on a hot-key distribution") {
    import org.apache.spark.sql.functions._
    // one hot key with many duplicate values + several cold keys
    val rows = (0 until 2000).map(i => ("hot", (i % 37).toLong)) ++
      (0 until 50).map(i => (s"cold${i % 5}", i.toLong))
    val df = rows.toDF("k", "v").repartition(7)
    val got = graft.operators.Skew
      .distinctCountSkewSafe(df, Seq("k"), "v", "n")
      .as[(String, Long)].collect().toMap
    val want = df.groupBy(col("k")).agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got("hot") == 37L)
    // NULL values do not count as a distinct value (countDistinct parity)
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("b", None))
      .toDF("k", "v")
    val gotN = graft.operators.Skew.distinctCountSkewSafe(withNulls, Seq("k"), "v", "n")
      .as[(String, Long)].collect().toMap
    assert(gotN == Map("a" -> 1L, "b" -> 0L))
  }

  test("withDenseIds rejects NULL order values with a clear error") {
    import org.apache.spark.sql.functions._
    val df = Seq(Some(1L), None, Some(3L)).toDF("k")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Load.withDenseIds(df, "k", "dense_id", 10L)
    }
    assert(e.getMessage.contains("contains NULL"))
  }

  test("saltedJoin returns exactly the plain join's rows, spread over salts") {
    val fact = (1L to 300L).map(i => (1L, i)).toDF("loan_id", "seq") // one hot key
      .union(Seq((2L, 0L)).toDF("loan_id", "seq"))
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("loan_id", "product")
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "loan_id", 8)
    val plain = fact.join(dim, Seq("loan_id"), "inner")
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
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
