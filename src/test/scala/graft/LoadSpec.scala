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

  test("Scd2.merge hits every branch: history, no-op, equal, change, re-open, insert") {
    import java.sql.Date
    val eff = Date.valueOf("2025-06-01")
    val dim = Seq(
      // closed history row for key 1 (passes through untouched)
      (1L, "A", Date.valueOf("2020-01-01"), Some(Date.valueOf("2021-01-01")), false),
      (1L, "B", Date.valueOf("2021-01-01"), None, true), // current, will change
      (2L, "C", Date.valueOf("2020-02-01"), None, true), // current, incoming equal
      (3L, "D", Date.valueOf("2020-03-01"), None, true), // current, nothing incoming
      (4L, "E", Date.valueOf("2020-04-01"), Some(Date.valueOf("2022-01-01")), false)
      // key 4: all versions closed -> incoming re-opens; key 5: brand new
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val inc = Seq((1L, "B2"), (2L, "C"), (4L, "E2"), (5L, "F")).toDF("k", "attr")
    val out = graft.operators.Scd2
      .merge(dim, inc, "k", Seq("attr"), lit(eff))
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSet
    assert(out == Set(
      (1L, "A", Date.valueOf("2020-01-01"), Some(Date.valueOf("2021-01-01")), false),
      (1L, "B", Date.valueOf("2021-01-01"), Some(eff), false), // closed at eff
      (1L, "B2", eff, None, true),                             // new version
      (2L, "C", Date.valueOf("2020-02-01"), None, true),       // equal -> no-op
      (3L, "D", Date.valueOf("2020-03-01"), None, true),       // untouched
      (4L, "E", Date.valueOf("2020-04-01"), Some(Date.valueOf("2022-01-01")), false),
      (4L, "E2", eff, None, true),                             // re-opened
      (5L, "F", eff, None, true)))                             // insert
    // merge is idempotent: replaying the same batch changes nothing
    val dimCols = Seq("k", "attr", "valid_from", "valid_to", "is_current").map(col)
    val again = graft.operators.Scd2.merge(
      out.toSeq.toDF("k", "attr", "valid_from", "valid_to", "is_current")
        .select(dimCols: _*),
      inc, "k", Seq("attr"), lit(eff))
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSet
    assert(again == out)
    // NULL attr values compare null-safely: NULL -> NULL is a no-op
    val dimN = Seq((1L, Option.empty[String], Date.valueOf("2020-01-01"), Option.empty[Date], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val incN = Seq((1L, Option.empty[String])).toDF("k", "attr")
    assert(graft.operators.Scd2.merge(dimN, incN, "k", Seq("attr"), lit(eff))
      .filter(col("is_current") && col("valid_from") === "2020-01-01").count() == 1)
  }

  test("Reconcile.diff reports only divergent keys with the offending columns") {
    val l = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "p", "v")
    val r = Seq((1L, "a", 10.0), (2L, "B", 20.0), (3L, "C", 33.0), (5L, "e", 50.0))
      .toDF("k", "p", "v")
    val got = graft.operators.Reconcile.diff(l, r, "k", Seq("p", "v"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (2L, "changed", "p"), (3L, "changed", "p,v"),
      (4L, "removed", ""), (5L, "added", "")))
    // NULL attrs compare null-safely: NULL -> NULL is not a change
    val ln = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "p")
    val rn = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "p")
    val gotN = graft.operators.Reconcile.diff(ln, rn, "k", Seq("p"))
      .as[(Long, String, String)].collect().toSet
    assert(gotN == Set((2L, "changed", "p")))
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

  test("writePartitioned re-runs are idempotent and replace ONLY the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val full = Seq((1L, "EUR", 10.0), (2L, "USD", 20.0), (3L, "EUR", 30.0))
      .toDF("id", "currency", "amount")
    Load.writePartitioned(full, dir, Seq("currency"), Seq("id"))
    // the reference loader's re-seed contract: the SAME load twice
    // leaves exactly one copy, not an appended double
    Load.writePartitioned(full, dir, Seq("currency"), Seq("id"))
    assert(spark.read.parquet(dir).count() == 3)
    // dynamic overwrite: re-loading one partition's slice must replace
    // that partition and leave the others intact (a static overwrite
    // would silently wipe USD here)
    val eurOnly = Seq((1L, "EUR", 11.0), (4L, "EUR", 40.0))
      .toDF("id", "currency", "amount")
    Load.writePartitioned(eurOnly, dir, Seq("currency"), Seq("id"))
    val back = spark.read.parquet(dir)
    assert(back.filter(col("currency") === "EUR").count() == 2)
    assert(back.filter(col("currency") === "USD").count() == 1)
    assert(back.filter(col("id") === 1L).select(col("amount"))
      .as[Double].collect().toSeq == Seq(11.0))
  }

  test("writePartitioned fails loudly on schema drift against an existing target") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Load.writePartitioned(
      Seq((1L, "EUR", 10.0)).toDF("id", "currency", "amount"),
      dir, Seq("currency"), Seq("id"))
    // a renamed/added column set must not land beside old-schema files
    val renamed = intercept[IllegalArgumentException] {
      Load.writePartitioned(
        Seq((2L, "EUR", 20.0)).toDF("id", "currency", "amt"),
        dir, Seq("currency"), Seq("id"))
    }
    assert(renamed.getMessage.contains("schema drift"))
    // same names, changed data-column type — the poisoned-read case
    val retyped = intercept[IllegalArgumentException] {
      Load.writePartitioned(
        Seq((2L, "EUR", "20")).toDF("id", "currency", "amount"),
        dir, Seq("currency"), Seq("id"))
    }
    assert(retyped.getMessage.contains("type drift"))
    // the guarded target is untouched by the refused writes
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("schema evolution: mergeSchema reads old and new writer generations together") {
    // a long-lived 100 TB table is written by EVOLVING jobs — an added
    // column must not orphan old files. mergeSchema unions the footers;
    // rows from pre-evolution files read the new column as NULL, and the
    // shared columns keep their values
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "EUR")).toDF("id", "currency")
      .write.mode("append").parquet(dir)
    Seq((2L, "USD", 42.0)).toDF("id", "currency", "amount")
      .write.mode("append").parquet(dir)
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("id", "currency", "amount"))
    val rows = back.select(col("id"), col("currency"), col("amount"))
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "EUR", None), (2L, "USD", Some(42.0))))
    // the DEFAULT read (no mergeSchema) picks one footer — the silent
    // column-loss mode the option exists to avoid; pin the contract
    val plain = spark.read.parquet(dir)
    assert(plain.columns.toSet.subsetOf(Set("id", "currency", "amount")))
  }

  test("jsonl gzip sink writes real .json.gz shards that read back losslessly") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "c \"quoted\" d")).toDF("doc_id", "text")
    val path = graft.sources.Scratch.dir("graft_gz_spec").resolve("d").toString
    docs.repartition(2).write.option("compression", "gzip").json(path)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")),
      parts.map(_.getName).toSeq.toString)
    // gzip magic on disk — the codec option must not be silently ignored
    val head = java.nio.file.Files.readAllBytes(parts.head.toPath)
    assert((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b,
      "shard is not gzip on disk")
    val back = spark.read.schema(docs.schema).json(path)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      docs.collect().map(_.toString).sorted.toSeq)
  }

  test("WARC round-trip: length framing carries a payload embedding a fake record head") {
    import graft.sources.Warc
    val docs = Seq(
      (0L, "plain text"),
      // a complete fake record head INSIDE the payload: only
      // Content-Length framing survives this; a delimiter scan splits here
      (1L, "evil\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\ntail"),
      (2L, "unicode é ü payload"), // Content-Length counts BYTES, not chars
      (51L, "second shard")).toDF("doc_id", "text")
    val out = Warc.parseWarc(Warc.encodeWarc(docs)).collect()
      .map(r => r.doc_id -> (r.target_uri, r.text)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 51L))
    assert(out(1L)._2 == "evil\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\ntail")
    assert(out(2L) == (("https://graft.test/2", "unicode é ü payload")))
  }

  test("WARC gz: per-record gzip members round-trip; non-gzip bytes fail by name") {
    import graft.sources.Warc
    val docs = Seq(
      (0L, "plain"),
      (1L, "evil\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz"),
      (2L, "unicode é ü")).toDF("doc_id", "text")
    val gz = Warc.encodeWarcGz(docs).collect().head
    // container starts with a gzip member magic, and a mid-container
    // member boundary exists (per-record members, not one big stream)
    assert((gz.bytes(0) & 0xff) == 0x1f && (gz.bytes(1) & 0xff) == 0x8b)
    val boundaries = gz.bytes.sliding(2).zipWithIndex.count { case (w, i) =>
      i > 0 && (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b }
    assert(boundaries >= 2, s"expected per-record gzip members, found $boundaries")
    val out = Warc.parseWarcGz(Warc.encodeWarcGz(docs)).collect()
      .map(r => r.doc_id -> r.text).toMap
    assert(out == Map(0L -> "plain",
      1L -> "evil\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz",
      2L -> "unicode é ü"))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.parseWarcGz(Seq(Warc.WarcContainer(9L,
        "WARC/1.0\r\n".getBytes("US-ASCII"))).toDS()).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("not a gzip container"), msg)
  }

  test("httpReason: unknown status fails by name, not MatchError") {
    import graft.sources.Warc
    val e = intercept[IllegalArgumentException](Warc.httpReason(418))
    assert(e.getMessage.contains("no reason phrase for HTTP status 418"), e.getMessage)
  }

  test("WARC parser: malformed containers fail loud by name") {
    import graft.sources.Warc
    def parse(bytes: Array[Byte]): Unit =
      Warc.parseWarc(Seq(Warc.WarcContainer(7L, bytes)).toDS()).collect()
    def msgOf(e: Throwable): String =
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    val good = Warc.encodeWarc(Seq((3L, "abc")).toDF("doc_id", "text"))
      .collect().head.bytes
    // truncated payload: chop the terminator
    val trunc = good.dropRight(5)
    val e1 = intercept[org.apache.spark.SparkException](parse(trunc))
    assert(msgOf(e1).contains("truncated WARC payload") ||
      msgOf(e1).contains("unterminated header line"), msgOf(e1))
    // bad version line
    val bad = good.clone(); bad(4) = 'X'.toByte
    val e2 = intercept[org.apache.spark.SparkException](parse(bad))
    assert(msgOf(e2).contains("bad WARC version line"), msgOf(e2))
    // non-numeric Content-Length
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val nn = s.replace("Content-Length: 3", "Content-Length: 3x")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val e3 = intercept[org.apache.spark.SparkException](parse(nn))
    assert(msgOf(e3).contains("non-numeric or oversized Content-Length"), msgOf(e3))
    // 20-digit all-numeric Content-Length: must fail by name, not with
    // a raw NumberFormatException out of toLong (r18 advisor)
    val big = s.replace("Content-Length: 3", "Content-Length: 99999999999999999999")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val e3b = intercept[org.apache.spark.SparkException](parse(big))
    assert(msgOf(e3b).contains("non-numeric or oversized Content-Length"), msgOf(e3b))
    // 20-digit all-numeric record id: same fail-loud-by-name contract
    val hostileId = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:doc-99999999999999999999>\r\n" +
      "WARC-Target-URI: https://graft.test/x\r\n" +
      "Content-Length: 3\r\n\r\nabc\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val e3c = intercept[org.apache.spark.SparkException](parse(hostileId))
    assert(msgOf(e3c).contains("unrecognized record id"), msgOf(e3c))
    // missing mandatory header
    val mh = s.replace("WARC-Target-URI", "X-WARC-Target-URI")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val e4 = intercept[org.apache.spark.SparkException](parse(mh))
    assert(msgOf(e4).contains("missing mandatory WARC header WARC-Target-URI"), msgOf(e4))
  }

  test("parseWarcHttp: recovers status/type/body; body CRLFCRLF intact; malformed blocks fail by name") {
    import graft.sources.Warc
    def msgOf(e: Throwable): String =
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    def rec(id: Long, payload: String) = Warc.WarcRecord(id, s"u$id", payload)
    def parse(r: Warc.WarcRecord) =
      Warc.parseWarcHttp(Seq(r).toDS()).collect().head
    // happy path with a body CONTAINING a CRLF CRLF — the parser must
    // hand back everything after the FIRST terminator, never re-split
    val ok = parse(rec(1L,
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nX-N: v\r\n\r\nbody\r\n\r\ntail"))
    assert(ok.status == 200 && ok.content_type == "text/plain"
      && ok.body == "body\r\n\r\ntail")
    // the full encode->parse->http composition keeps BOTH verdict
    // branches live under the fixture cycles
    val docs = Seq.tabulate(35L.toInt)(i => (i.toLong, s"text $i"))
      .toDF("doc_id", "text")
    val screened = Warc.parseWarcHttp(
      Warc.parseWarc(Warc.encodeWarcHttp(docs))).collect()
    assert(screened.length == 35)
    assert(screened.exists(r => r.status == 200 && r.content_type.startsWith("text/")))
    assert(screened.exists(r => r.status != 200))
    assert(screened.exists(r => !r.content_type.startsWith("text/")))
    assert(screened.forall(r => r.body == s"text ${r.doc_id}"))
    // malformed blocks, each by name
    Seq(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nno terminator",
        "unterminated HTTP header block"),
      ("FTP/1.1 200 OK\r\n\r\nx", "bad HTTP status line"),
      ("HTTP/1.1 20 OK\r\n\r\nx", "non-3-digit HTTP status"),
      ("HTTP/1.1 200 OK\r\nContent-Length: 1\r\n\r\nx", "missing Content-Type"),
      ("HTTP/1.1 200 OK\r\nBadHeaderNoColon\r\n\r\nx", "malformed HTTP header")
    ).foreach { case (payload, name) =>
      val e = intercept[org.apache.spark.SparkException](parse(rec(9L, payload)))
      assert(msgOf(e).contains(name), s"for '$payload': ${msgOf(e)}")
    }
  }

  test("parseWarcHttpBody: every framing mode recovers the original text; UTF-8 survives gzip") {
    import graft.sources.Warc
    // one doc per mode (mod 5), multi-byte text so a String round-trip
    // of the gzip bytes would visibly corrupt
    val docs = Seq.tabulate(10)(i => (i.toLong, s"těxt №$i with a body long enough to chunk"))
      .toDF("doc_id", "text")
    val out = Warc.parseWarcHttpBody(
      Warc.parseWarcRaw(Warc.encodeWarcHttpEnc(docs))).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.body == s"těxt №${r.doc_id} with a body long enough to chunk"),
      out.map(r => (r.doc_id, r.body)).mkString("; "))
    // the status/content-type screen fields survive the framing layer
    assert(out.exists(_.status != 200) && out.exists(_.status == 200))
    // the .warc.gz container path carries byte-identical records, so
    // the decoded rows must be identical
    val gzOut = Warc.parseWarcHttpBody(
      Warc.parseWarcGzRaw(Warc.encodeWarcHttpEncGz(docs))).collect()
    assert(gzOut.map(r => (r.doc_id, r.status, r.content_type, r.body)).toSet ==
      out.map(r => (r.doc_id, r.status, r.content_type, r.body)).toSet)
  }

  test("parseWarcHttpBody: framing failures each by name") {
    import graft.sources.Warc
    import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
    def msgOf(e: Throwable): String =
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    def rec(payload: Array[Byte]) = Warc.WarcByteRecord(9L, "u9", payload)
    def parse(payload: Array[Byte]) =
      Warc.parseWarcHttpBody(Seq(rec(payload)).toDS()).collect().head
    def block(hdrs: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$hdrs\r\n").getBytes(US_ASCII) ++ body
    val raw = "hello body".getBytes(UTF_8)
    // happy paths per framing, byte-exact
    assert(parse(block(s"Content-Length: ${raw.length}\r\n", raw)).body == "hello body")
    val gz = Warc.gzipBytes(raw)
    assert(parse(block("Content-Encoding: gzip\r\n", gz)).body == "hello body")
    assert(parse(block("Content-Encoding: deflate\r\n", Warc.deflateBytes(raw))).body == "hello body")
    assert(parse(block("Transfer-Encoding: chunked\r\n", Warc.chunkBytes(raw))).body == "hello body")
    assert(parse(block("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
      Warc.chunkBytes(gz))).body == "hello body")
    // failure modes, each by name
    Seq[(Array[Byte], String)](
      (block(s"Content-Length: ${raw.length + 2}\r\n", raw),
        "does not match body span"),
      (block("Content-Encoding: gzip\r\n", raw),
        "body lacks gzip magic"),
      (block("Content-Encoding: gzip\r\n", gz.dropRight(5)),
        "corrupt gzip body"),
      (block("Content-Encoding: deflate\r\n", Array[Byte](0x78, -1, 1, 2, 3)),
        "corrupt deflate body"),
      (block("Content-Encoding: br\r\n", raw),
        "unsupported Content-Encoding 'br'"),
      (block("Transfer-Encoding: gzip\r\n", raw),
        "unsupported Transfer-Encoding 'gzip'"),
      (block("Transfer-Encoding: chunked\r\n",
        "zz\r\nhello\r\n0\r\n\r\n".getBytes(US_ASCII)),
        "bad chunk size"),
      (block("Transfer-Encoding: chunked\r\n",
        "ff\r\nhello\r\n0\r\n\r\n".getBytes(US_ASCII)),
        "truncated chunk"),
      (block("Transfer-Encoding: chunked\r\n",
        Warc.chunkBytes(raw) ++ "junk".getBytes(US_ASCII)),
        "trailing bytes after final chunk"),
      (block("Transfer-Encoding: chunked\r\n",
        Warc.chunkBytes(raw).dropRight(2)),
        "missing terminator after last chunk"),
      (block("Transfer-Encoding: chunked\r\n",
        "5\r\nhelloXX".getBytes(US_ASCII)),
        "chunk data not CRLF-terminated")
    ).foreach { case (payload, name) =>
      val e = intercept[org.apache.spark.SparkException](parse(payload))
      assert(msgOf(e).contains(name), s"for '$name': ${msgOf(e)}")
    }
  }

  test("charsetOf/decodeCharset: declared-charset decode exact, every bad shape by name") {
    import graft.sources.Warc
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    // parameter parsing: case, quoting, extra params, absent default
    assert(Warc.charsetOf("text/html; charset=utf-8") == "utf-8")
    assert(Warc.charsetOf("text/plain; charset=\"ISO-8859-1\"") == "iso-8859-1")
    assert(Warc.charsetOf("text/html; boundary=x; CHARSET=Latin-1") == "latin-1")
    assert(Warc.charsetOf("text/html") == "utf-8")
    // the SAME logical text decodes identically from both wire forms
    val logical = "café über ¡hola!"
    assert(Warc.decodeCharset(1L, "utf-8", logical.getBytes(UTF_8)) == logical)
    assert(Warc.decodeCharset(1L, "iso-8859-1", logical.getBytes(ISO_8859_1)) == logical)
    // the WHATWG rule: an iso-8859-1 LABEL decodes as windows-1252 —
    // byte 0x91 is the curly quote, not the C1 control
    assert(Warc.decodeCharset(1L, "iso-8859-1",
      Array[Byte]('a', 0x91.toByte, 0x80.toByte)) == "a‘€")
    assert(Warc.decodeCharset(1L, "windows-1252",
      Array[Byte](0x93.toByte, 'q', 0x94.toByte)) == "“q”")
    // the five bytes cp1252 leaves undefined fail by name
    val e0 = intercept[IllegalArgumentException](
      Warc.decodeCharset(6L, "windows-1252", Array[Byte]('x', 0x8D.toByte)))
    assert(e0.getMessage.contains("undefined in windows-1252"), e0.getMessage)
    // a blind UTF-8 read of Latin-1 wire bytes is exactly what the
    // strict decoder must REFUSE (silent mojibake otherwise)
    val e1 = intercept[IllegalArgumentException](
      Warc.decodeCharset(2L, "utf-8", logical.getBytes(ISO_8859_1)))
    assert(e1.getMessage.contains("malformed UTF-8 body"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Warc.decodeCharset(3L, "us-ascii", logical.getBytes(ISO_8859_1)))
    assert(e2.getMessage.contains("non-ASCII byte"), e2.getMessage)
    assert(Warc.decodeCharset(4L, "ascii", "plain".getBytes(UTF_8)) == "plain")
    val e3 = intercept[IllegalArgumentException](
      Warc.decodeCharset(5L, "shift_jis", "x".getBytes(UTF_8)))
    assert(e3.getMessage.contains("unsupported charset 'shift_jis'"), e3.getMessage)
    // end-to-end: all four fixture modes recover the identical logical
    // text (suffix arithmetic replayed independently; the cp1252 mode
    // prepends the euro — wire byte 0x80, remap-block-only)
    val docs = Seq.tabulate(12)(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    val out = Warc.parseWarcHttpText(
      Warc.parseWarcRaw(Warc.encodeWarcCharset(docs))).collect()
    assert(out.length == 12)
    out.foreach { r =>
      val suffix = (0 until 3)
        .map(k => (161 + ((r.doc_id + 7 * k) % 94)).toChar).mkString
      val eu = if (r.doc_id % 4 == 3) "€" else ""
      assert(r.text == s"doc body ${r.doc_id} $eu$suffix", s"doc ${r.doc_id}: '${r.text}'")
      assert(r.n_chars == r.text.length.toLong)
      assert(r.charset == (r.doc_id % 4 match {
        case 0 => "utf-8"; case 3 => "windows-1252"; case _ => "iso-8859-1"
      }))
      assert(r.http_status == 200)
    }
  }
}
