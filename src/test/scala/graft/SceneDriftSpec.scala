package graft

import org.apache.spark.sql.functions._

import graft.ext.{Corpus, Multimodal}

/** Specs for the scene-cut detector (two-scene Y4M fixture) and the
  * TVD drift monitor's add/merge contract and verdict edges. */
class SceneDriftSpec extends SparkSpec {
  import spark.implicits._

  test("sceneCuts: exactly one cut, at the designed scene boundary") {
    val ids = (0L until 24L).toDF("doc_id")
    val out = Multimodal.sceneCuts(Multimodal.encodeSceneVideo(ids))
      .collect().map(r => r.doc_id -> r).toMap
    (0L until 24L).foreach { id =>
      val (w, h, n, c) = Multimodal.sceneVideoDims(id)
      val r = out(id)
      assert(r.width == w && r.height == h && r.n_frames == n.toLong)
      assert(r.n_cuts == 1L, s"doc $id: expected 1 cut, got ${r.n_cuts}")
      assert(r.first_cut == c.toLong, s"doc $id: cut at ${r.first_cut}, designed $c")
    }
  }

  test("sceneCuts: within-scene SAD stays under threshold even across byte wrap") {
    // doc 252: first-frame bytes start at 252 and wrap mod 256 within
    // the frame; circular distance keeps the within-scene step at 3
    // per byte — a plain-abs scorer would see 253s and false-cut
    val out = Multimodal.sceneCuts(Multimodal.encodeSceneVideo(
      Seq(252L).toDF("doc_id"))).collect().head
    assert(out.n_cuts == 1L)
    val (w, h, n, _) = Multimodal.sceneVideoDims(252L)
    val fb = 3L * w * h
    // sad_sum = (n-2 within-scene pairs) * 3 * fb + one cut pair * 104 * fb
    assert(out.sad_sum == (n - 2) * 3 * fb + 104 * fb)
  }

  test("sceneCuts: truncated frame fails loud by name") {
    val bad = Multimodal.y4mSceneBytes(5L).dropRight(3)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sceneCuts(Seq(Multimodal.EncodedMedia(5L, "y4m", bad)).toDS())
        .collect()
    }
    assert(e.getMessage.contains("truncated frame") ||
      e.getCause != null && e.getCause.getMessage.contains("truncated frame"))
  }

  private def toneWav(samples: Array[Int]): Array[Byte] = {
    // canonical RIFF/WAVE: fmt (PCM mono 8 kHz 16-bit) + data
    val dataBytes = samples.length * 2
    val riffPayload = 4 + (8 + 16) + (8 + dataBytes)
    val out = new Array[Byte](8 + riffPayload)
    var p = 0
    def put(s: String): Unit = s.foreach { c => out(p) = c.toByte; p += 1 }
    def le32(v: Int): Unit = { (0 to 3).foreach(b => { out(p) = ((v >> (8 * b)) & 0xff).toByte; p += 1 }) }
    def le16(v: Int): Unit = { out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte; p += 2 }
    put("RIFF"); le32(riffPayload); put("WAVE")
    put("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    put("data"); le32(dataBytes)
    samples.foreach(s => le16(s & 0xffff))
    out
  }

  test("audioSpectral: a pure tone dominates its own probe bin") {
    // 1000 Hz at 8 kHz = period 8; 500 Hz = period 16 (quantized sine,
    // amplitude 20000 — exact pinned integers)
    val tone1000 = Array(0, 14142, 20000, 14142, 0, -14142, -20000, -14142)
    val tone500 = Array(0, 7654, 14142, 18478, 20000, 18478, 14142, 7654,
      0, -7654, -14142, -18478, -20000, -18478, -14142, -7654)
    val media = Seq(
      Multimodal.EncodedMedia(1L, "wav", toneWav(Array.fill(32)(tone1000).flatten)),
      Multimodal.EncodedMedia(2L, "wav", toneWav(Array.fill(16)(tone500).flatten))).toDS()
    val out = Multimodal.audioSpectral(media).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).dominant_hz == 1000,
      s"1000 Hz tone scored ${out(1L)}")
    assert(out(2L).dominant_hz == 500,
      s"500 Hz tone scored ${out(2L)}")
    // the tone's own bin must dwarf the other bins by an order of magnitude
    assert(out(1L).p1000 > 10L * math.max(out(1L).p250, math.max(out(1L).p500, out(1L).p2000)))
    assert(out(2L).p500 > 10L * math.max(out(2L).p250, math.max(out(2L).p1000, out(2L).p2000)))
  }

  test("sniffMedia: detection is magic-bytes only — a lying fmt label is ignored") {
    val wav = Multimodal.EncodedMedia(4L, "jpeg", // label lies
      toneWav(Array(0, 100, -100, 50)))
    val out = Multimodal.sniffMedia(Seq(wav).toDS()).collect().head
    assert(out.fmt == "wav" && out.dim1 == 4L && out.dim2 == 8000L)
  }

  test("sniffMedia: unrecognized magic fails loud by name") {
    val junk = Multimodal.EncodedMedia(9L, "png", Array[Byte](1, 2, 3, 4, 5))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sniffMedia(Seq(junk).toDS()).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("unrecognized container magic"))
  }

  test("sniffMedia: JPEG fill bytes before a marker are skipped, SOF dims read") {
    // FF D8, two 0xFF fill bytes, then SOF0 with h=5 w=7 (spec-legal
    // padding the r17 walk misparsed as a marker with a length field)
    val bytes = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x11,
      0x08, 0x00, 0x05, 0x00, 0x07, 0x01).map(_.toByte)
    val out = Multimodal.sniffMedia(
      Seq(Multimodal.EncodedMedia(11L, "gif", bytes)).toDS()).collect().head
    assert(out.fmt == "jpeg" && out.dim1 == 7L && out.dim2 == 5L)
  }

  test("sniffMedia: truncated JPEG SOF header fails loud by name") {
    // SOF0 whose declared segment runs past the buffer — dims at p+5..p+8
    // are unreadable; the r17 walk threw ArrayIndexOutOfBounds here
    val bytes = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sniffMedia(
        Seq(Multimodal.EncodedMedia(12L, "jpeg", bytes)).toDS()).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated JPEG SOF header"))
  }

  test("sniffMedia: standalone marker (EOI) before SOF fails loud by name") {
    // EOI carries no length field; the r17 walk read two payload bytes
    // as one and misparsed the rest of the stream
    val bytes = Array(0xff, 0xd8, 0xff, 0xd9, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sniffMedia(
        Seq(Multimodal.EncodedMedia(13L, "jpeg", bytes)).toDS()).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("standalone JPEG marker 0xd9"))
  }

  test("sceneCuts/videoFingerprints: hostile Y4M dims whose frame size overflows Int fail by name") {
    // 3*40000*40000 overflows Int to a negative size; the r17 code died
    // with NegativeArraySizeException instead of a named error
    val hostile = ("YUV4MPEG2 W40000 H40000 F25:1 Ip A1:1 C444\nFRAME\n" + "x" * 64)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    Seq(
      () => Multimodal.sceneCuts(
        Seq(Multimodal.EncodedMedia(14L, "y4m", hostile)).toDS()).collect(),
      () => Multimodal.videoFingerprints(
        Seq(Multimodal.EncodedMedia(15L, "y4m", hostile)).toDS()).collect()
    ).foreach { run =>
      val e = intercept[org.apache.spark.SparkException](run())
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("exceeds container"), msg)
    }
    // dims whose 3L*w*h wraps LONG negative (r18 advisor): the old
    // Long-first guard passed vacuously and the Int frameBytes wrapped;
    // the overflow-free w.toLong*h form must still fail by name
    val wrapLong = ("YUV4MPEG2 W1754000000 H1754000000 F25:1 Ip A1:1 C444\nFRAME\n" + "x" * 64)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    Seq(
      () => Multimodal.sceneCuts(
        Seq(Multimodal.EncodedMedia(16L, "y4m", wrapLong)).toDS()).collect(),
      () => Multimodal.videoFingerprints(
        Seq(Multimodal.EncodedMedia(17L, "y4m", wrapLong)).toDS()).collect(),
      () => Multimodal.decodeVideo(
        Seq(Multimodal.EncodedMedia(18L, "y4m", wrapLong)).toDS()).collect()
    ).foreach { run =>
      val e = intercept[org.apache.spark.SparkException](run())
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("exceeds container"), msg)
    }
  }

  test("driftReport: an unmerged delta union reports identically to the merged state") {
    // the report's in-agg fold treats each cell row as a bucket; the
    // internal (source, bucket) merge must make an unmerged union safe
    // (r17 advisor: split cells silently overstated TVD)
    val docs = Seq.tabulate(120)(i =>
      (i.toLong, s"src${i % 3}", (i * 41 % 450 + 30).toLong))
      .toDF("doc_id", "source", "n_chars")
    val d1 = Corpus.driftAdd(docs.filter(col("doc_id") % 2 === 0))
    val d2 = Corpus.driftAdd(docs.filter(col("doc_id") % 2 === 1))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(Corpus.driftReport(d1.unionByName(d2))) ==
      rows(Corpus.driftReport(Corpus.mergeDriftStates(d1, d2))))
  }

  test("audioFingerprints/audioDupGroups: byte-identical re-uploads group, distinct clips hash apart") {
    val media = Multimodal.encodeAudio((0L until 12L).toDF("doc_id"))
    val re = media.map(m => Multimodal.EncodedMedia(
      m.doc_id + 1000L, m.fmt, m.bytes))(
      org.apache.spark.sql.Encoders.product[Multimodal.EncodedMedia])
    val fps = Multimodal.audioFingerprints(media.unionByName(re)).collect()
      .map(f => f.doc_id -> f.fingerprint).toMap
    (0L until 12L).foreach { id =>
      assert(fps(id) == fps(id + 1000L), s"re-upload of $id fingerprints apart")
    }
    // the 12 base clips are pairwise distinct content — all hash apart
    assert((0L until 12L).map(fps).distinct.size == 12, "distinct clips collided")
    val groups = Multimodal.audioDupGroups(media.unionByName(re)).collect()
      .map(r => r.getAs[String]("doc_ids")).toSet
    assert(groups == (0L until 12L).map(id => s"$id,${id + 1000L}").toSet)
  }

  test("driftAdd/merge: three deltas merge to the one-delta state exactly") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, s"src${i % 4}", (i * 37 % 500 + 40).toLong))
      .toDF("doc_id", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val whole = rows(Corpus.driftAdd(docs))
    val merged = rows(Corpus.mergeDriftStates(
      (0 to 2).map(k => Corpus.driftAdd(docs.filter(col("doc_id") % 3 === k))): _*))
    // symmetric equality: a merge that LOSES buckets must fail too
    assert(merged == whole)
  }

  test("drift state ingests through Structured Streaming foreachBatch, report == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val docs = Seq.tabulate(150)(i =>
      (i.toLong, s"src${i % 3}", (i * 53 % 400 + 50).toLong))
      .toDF("doc_id", "source", "n_chars")
    val batchReport = Corpus.driftReport(Corpus.driftAdd(docs)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = mem.toDF().toDF("doc_id", "source", "n_chars")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val d = Corpus.driftAdd(batch.toDF())
        state = Some(state.fold(d)(s => Corpus.mergeDriftStates(s, d))
          .localCheckpoint(true))
        ()
      }
      .outputMode(OutputMode.Update()).start()
    try {
      val rows = docs.as[(Long, String, Long)].collect().toSeq
      rows.grouped(40).foreach { c => mem.addData(c); q.processAllAvailable() }
      val streamed = Corpus.driftReport(state.get).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(streamed == batchReport, "streamed drift state != batch")
    } finally q.stop()
  }

  test("driftReport: identical windows score zero TVD, shifted windows drift") {
    // same: every bucket has na == nb -> tvd_num 0, not drifted
    val same = Seq(("s", 0L, 5L, 5L), ("s", 1L, 7L, 7L))
      .toDF("source", "bucket", "na", "nb")
    val r1 = Corpus.driftReport(same).collect().head
    assert(r1.getAs[Long]("tvd_num") == 0L && r1.getAs[Int]("drifted") == 0)
    assert(r1.getAs[Double]("tvd") == 0.0)
    // disjoint buckets: TVD = 1, drifted
    val disjoint = Seq(("s", 0L, 10L, 0L), ("s", 1L, 0L, 10L))
      .toDF("source", "bucket", "na", "nb")
    val r2 = Corpus.driftReport(disjoint).collect().head
    assert(r2.getAs[Double]("tvd") == 1.0 && r2.getAs[Int]("drifted") == 1)
  }

  test("driftReport: an empty window is drift by definition, tvd null") {
    val empty = Seq(("s", 0L, 10L, 0L), ("s", 1L, 4L, 0L))
      .toDF("source", "bucket", "na", "nb")
    val r = Corpus.driftReport(empty).collect().head
    assert(r.getAs[Int]("drifted") == 1)
    assert(r.isNullAt(r.fieldIndex("tvd")))
  }

  test("videoFingerprints: byte-identical re-uploads share the fingerprint, distinct clips differ") {
    val ids = (0L until 16L).toDF("doc_id")
    val media = Multimodal.encodeVideo(ids)
    val copies = media.map(m =>
      Multimodal.EncodedMedia(m.doc_id + 100L, m.fmt, m.bytes))(
      org.apache.spark.sql.Encoders.product[Multimodal.EncodedMedia])
    val fp = Multimodal.videoFingerprints(media.unionByName(copies))
      .collect().map(v => v.doc_id -> v.fingerprint).toMap
    (0L until 16L).foreach { id =>
      assert(fp(id) == fp(id + 100L), s"copy of $id diverged")
    }
    // ids 0 and 1 have different dims and bytes: fingerprints differ
    assert(fp(0L) != fp(1L))
  }

  test("videoFingerprints: stride changes which frames feed the signature") {
    val one = Multimodal.encodeVideo(Seq(9L).toDF("doc_id"))
    val s1 = Multimodal.videoFingerprints(one, stride = 1).collect().head
    val s2 = Multimodal.videoFingerprints(one, stride = 2).collect().head
    assert(s1.sampled_frames == s1.n_frames)
    assert(s2.sampled_frames == (s2.n_frames + 1) / 2)
    assert(s1.fingerprint != s2.fingerprint)
  }

  test("driftReport: verdict sits on the exact cross-multiplied threshold") {
    // tvd = tvd_num / (2*NA*NB); threshold 0.1 <=> 5*tvd_num > NA*NB.
    // NA=NB=10: tvd_num = 20 -> tvd exactly 0.1 -> NOT drifted (strict >)
    val edge = Seq(("s", 0L, 10L, 0L), ("s", 1L, 0L, 10L))
      .toDF("source", "bucket", "na", "nb")
    // that's tvd 1.0; build the exact edge instead: na=(6,4), nb=(4,6)
    val e2 = Seq(("s", 0L, 6L, 4L), ("s", 1L, 4L, 6L))
      .toDF("source", "bucket", "na", "nb")
    // tvd_num = |6*10-4*10| + |4*10-6*10| = 40; 5*40=200 > 100 -> drifted
    val r = Corpus.driftReport(e2).collect().head
    assert(r.getAs[Long]("tvd_num") == 40L && r.getAs[Int]("drifted") == 1)
    val r0 = Corpus.driftReport(edge).collect().head
    assert(r0.getAs[Int]("drifted") == 1)
  }
}
