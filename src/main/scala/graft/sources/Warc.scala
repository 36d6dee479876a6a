package graft.sources

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC-shaped crawl-container codec — the record-framed ingest format
  * web curation actually starts from (CommonCrawl ships WARC/WET; the
  * JSONL/CSV/ORC round-trips in this family cover the DERIVED
  * interchange formats, this covers the raw one). The reference
  * (dbt-SQL credit marts) has no crawl ingest; this is the LLM-pipeline
  * extension layer's sources member, built per the codec-family
  * discipline: the container is assembled by this encoder from the
  * documents table, the parser does REAL byte-level work (version-line
  * check, header parse, Content-Length framing, record-terminator
  * check), and the oracle states the expected parse from the table
  * itself — a framing bug on either side hash-fails.
  *
  * Framing is LENGTH-BASED, never delimiter-based: the payload may
  * legally contain `WARC/1.0` lines, blank lines, anything — only the
  * declared `Content-Length` decides where a record ends (the
  * round-trip query injects exactly such a hostile payload to prove
  * it). Every malformed shape fails loudly BY NAME: bad version line,
  * malformed or missing mandatory header, non-numeric length,
  * truncated payload, missing record terminator.
  *
  * Scale posture: encode is one groupBy on the shard key (containers
  * are shard-bounded, ~`shardSize` records each — the WARC-file size
  * knob a crawler tunes); parse is a narrow flatMap over containers —
  * records never shuffle, and at 100 TB the parser runs wherever the
  * container bytes already live, exactly like the media decoders. */
object Warc {

  final case class WarcContainer(shard_id: Long, bytes: Array[Byte])
  final case class WarcRecord(doc_id: Long, target_uri: String, text: String)

  /** Raw-payload record — the form an HTTP BODY decode needs: a
    * Content-Encoding:gzip body is arbitrary bytes, and a UTF-8 String
    * round-trip silently replaces invalid sequences, so the encoded-body
    * path must never transit [[WarcRecord]].text. */
  final case class WarcByteRecord(doc_id: Long, target_uri: String, payload: Array[Byte])

  /** Assemble one WARC/1.0 container per `doc_id div shardSize` shard:
    * records in doc_id order, each `WARC/1.0` + four headers + CRLF
    * blank line + the UTF-8 payload + the CRLF CRLF record terminator
    * (the actual WARC layout). Content-Length counts payload BYTES —
    * multi-byte text must round-trip through the byte slice. */
  def encodeWarc(documents: DataFrame, shardSize: Long = 50L): Dataset[WarcContainer] = {
    require(shardSize >= 1L, s"shard size must be positive, got $shardSize")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / shardSize)
      .mapGroups { (shard, it) =>
        val out = new java.io.ByteArrayOutputStream()
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val payload = text.getBytes(UTF_8)
          val header =
            "WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:graft:doc-$id>\r\n" +
              s"WARC-Target-URI: https://graft.test/$id\r\n" +
              s"Content-Length: ${payload.length}\r\n" +
              "\r\n"
          out.write(header.getBytes(US_ASCII))
          out.write(payload)
          out.write("\r\n\r\n".getBytes(US_ASCII))
        }
        WarcContainer(shard, out.toByteArray)
      }
  }

  /** [[encodeWarc]] with each RECORD gzipped as its OWN gzip member and
    * the members concatenated — the actual CommonCrawl `.warc.gz`
    * layout: a reader holding a record's byte offset can inflate just
    * that member (the seekability that makes a 100 TB crawl archive
    * random-accessible), while a streaming reader inflates the member
    * chain end to end. */
  def encodeWarcGz(documents: DataFrame, shardSize: Long = 50L): Dataset[WarcContainer] = {
    require(shardSize >= 1L, s"shard size must be positive, got $shardSize")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / shardSize)
      .mapGroups { (shard, it) =>
        val out = new java.io.ByteArrayOutputStream()
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val payload = text.getBytes(UTF_8)
          val header =
            "WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:graft:doc-$id>\r\n" +
              s"WARC-Target-URI: https://graft.test/$id\r\n" +
              s"Content-Length: ${payload.length}\r\n" +
              "\r\n"
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(header.getBytes(US_ASCII))
          gz.write(payload)
          gz.write("\r\n\r\n".getBytes(US_ASCII))
          gz.finish()
          // close() releases the native Deflater NOW instead of at GC
          // (one leaked deflater per record otherwise, at archive
          // scale — r18 advisor); ByteArrayOutputStream.close() is a
          // no-op, so the container stream stays open for the next
          // member
          gz.close()
        }
        WarcContainer(shard, out.toByteArray)
      }
  }

  /** Inflate a multi-member gzip container (Java's GZIPInputStream
    * walks concatenated members natively) and hand the record stream
    * to the same byte walker as the plain form — the framing logic is
    * shared, only the codec layer differs. Non-gzip bytes fail loudly
    * by name. */
  def parseWarcGz(containers: Dataset[WarcContainer]): Dataset[WarcRecord] = {
    val spark = containers.sparkSession
    import spark.implicits._
    containers.flatMap { c =>
      require(c.bytes.length >= 2 &&
        (c.bytes(0) & 0xff) == 0x1f && (c.bytes(1) & 0xff) == 0x8b,
        s"shard ${c.shard_id}: not a gzip container (bad magic)")
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(c.bytes))
      val inflated = try in.readAllBytes() finally in.close()
      parseContainer(c.shard_id, inflated)
    }
  }

  final case class WarcHttpRecord(doc_id: Long, target_uri: String,
      status: Int, content_type: String, body: String)

  /** Fixture-side HTTP status / Content-Type formulas — arithmetic off
    * doc_id so the oracle replays them: real crawl statuses with 200
    * dominant (ids ≡ 3 mod 7 → 404, ≡ 4 → 301, ≡ 6 → 503) and a
    * content-type cycle where 3 of 5 values are text-like. */
  private[graft] def httpStatus(id: Long): Int = (id % 7) match {
    case 3 => 404
    case 4 => 301
    case 6 => 503
    case _ => 200
  }
  private[graft] def httpReason(status: Int): String = status match {
    case 200 => "OK"
    case 301 => "Moved Permanently"
    case 404 => "Not Found"
    case 503 => "Service Unavailable"
    // fail by name, not scala.MatchError, if httpStatus's cycle ever
    // grows a code without a phrase here (r19 advisor)
    case s => throw new IllegalArgumentException(s"no reason phrase for HTTP status $s")
  }
  private[graft] def httpContentType(id: Long): String = (id % 5) match {
    case 0 => "text/html; charset=UTF-8"
    case 1 => "text/plain"
    case 2 => "application/pdf"
    case 3 => "text/html"
    case _ => "image/png"
  }

  /** [[encodeWarc]] with the REAL response-record payload layout: each
    * record's Content-Length-framed payload is a full HTTP response
    * block — status line, response headers, CRLF blank line, body —
    * exactly what CommonCrawl `response` records carry and what an
    * ingest funnel's FIRST screen (status / Content-Type) reads before
    * any text work. Same shard groupBy, same length framing (the HTTP
    * block's own CRLFs sit INSIDE the declared length, so a
    * delimiter-framed reader would shear every record here). */
  def encodeWarcHttp(documents: DataFrame, shardSize: Long = 50L): Dataset[WarcContainer] = {
    require(shardSize >= 1L, s"shard size must be positive, got $shardSize")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / shardSize)
      .mapGroups { (shard, it) =>
        val out = new java.io.ByteArrayOutputStream()
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val status = httpStatus(id)
          val http =
            (s"HTTP/1.1 $status ${httpReason(status)}\r\n" +
              s"Content-Type: ${httpContentType(id)}\r\n" +
              s"X-Crawl-Host: graft.test\r\n" +
              "\r\n").getBytes(US_ASCII) ++ text.getBytes(UTF_8)
          val header =
            "WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:graft:doc-$id>\r\n" +
              s"WARC-Target-URI: https://graft.test/$id\r\n" +
              s"Content-Length: ${http.length}\r\n" +
              "\r\n"
          out.write(header.getBytes(US_ASCII))
          out.write(http, 0, http.length)
          out.write("\r\n\r\n".getBytes(US_ASCII))
        }
        WarcContainer(shard, out.toByteArray)
      }
  }

  /** Parse the HTTP response block out of WARC `response` records:
    * status line (`HTTP/1.x NNN reason`), headers to the blank line,
    * body = EVERYTHING after the terminator (never re-split — a body
    * containing CRLF CRLF stays intact; the WARC layer already framed
    * it by length). Malformed blocks fail loudly by name: missing
    * version prefix, non-3-digit status, unterminated header block,
    * missing Content-Type. Narrow map — records never shuffle. */
  def parseWarcHttp(records: Dataset[WarcRecord]): Dataset[WarcHttpRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map { r =>
      val s = r.text
      val hdrEnd = s.indexOf("\r\n\r\n")
      require(hdrEnd >= 0,
        s"doc ${r.doc_id}: unterminated HTTP header block")
      val lines = s.substring(0, hdrEnd).split("\r\n", -1)
      val statusLine = lines.head
      require(statusLine.startsWith("HTTP/1.0 ") || statusLine.startsWith("HTTP/1.1 "),
        s"doc ${r.doc_id}: bad HTTP status line '$statusLine'")
      val rest = statusLine.substring(9)
      val code = rest.takeWhile(_ != ' ')
      require(code.length == 3 && code.forall(_.isDigit),
        s"doc ${r.doc_id}: non-3-digit HTTP status '$code'")
      val hdrs = lines.tail.map { l =>
        val i = l.indexOf(": ")
        require(i > 0, s"doc ${r.doc_id}: malformed HTTP header '$l'")
        (l.substring(0, i).toLowerCase(java.util.Locale.ROOT), l.substring(i + 2))
      }.toMap
      require(hdrs.contains("content-type"),
        s"doc ${r.doc_id}: missing Content-Type header")
      WarcHttpRecord(r.doc_id, r.target_uri, code.toInt,
        hdrs("content-type"), s.substring(hdrEnd + 4))
    }
  }

  /** Fixture-side body-framing mode, arithmetic off doc_id so the
    * oracle replays the cycle: 0 = identity (Content-Length), 1 =
    * Content-Encoding: gzip, 2 = Content-Encoding: deflate (zlib), 3 =
    * Transfer-Encoding: chunked, 4 = chunked OVER gzip (the layered
    * case — sender compresses, then chunks; receiver de-chunks, then
    * inflates). All five modes are live at every fixture tier. */
  private[graft] def bodyMode(id: Long): Int = (id % 5).toInt

  private[graft] def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(raw); gz.finish(); gz.close()
    out.toByteArray
  }

  private[graft] def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater() // zlib-wrapped, = HTTP 'deflate'
    try {
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** HTTP/1.1 chunked framing: lowercase-hex size line + CRLF + data +
    * CRLF per chunk, last chunk `0` + CRLF + CRLF (no trailers). Fixed
    * 7-byte chunks so every non-trivial body is multi-chunk with an
    * unaligned tail. */
  private[graft] def chunkBytes(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < raw.length) {
      val n = math.min(7, raw.length - p)
      out.write(s"${n.toHexString}\r\n".getBytes(US_ASCII))
      out.write(raw, p, n)
      out.write("\r\n".getBytes(US_ASCII))
      p += n
    }
    out.write("0\r\n\r\n".getBytes(US_ASCII))
    out.toByteArray
  }

  /** [[encodeWarcHttp]] with REAL body framing: each response body is
    * carried per its doc's [[bodyMode]] — plain with Content-Length,
    * gzip or deflate Content-Encoding (what actual CommonCrawl response
    * records overwhelmingly carry — a screen reading the raw payload
    * sees compressed bytes, not text), chunked Transfer-Encoding, or
    * chunked-over-gzip. Chunked responses carry no Content-Length (the
    * chunk frames delimit); non-chunked ones declare the ENCODED byte
    * count, which the decoder cross-checks. */
  /** One complete HTTP-framed WARC record (headers + payload +
    * terminator) for doc `id` — shared by the plain and `.warc.gz`
    * encoded-HTTP fixtures so both containers carry byte-identical
    * records. */
  private def httpEncRecordBytes(id: Long, text: String): Array[Byte] = {
    val status = httpStatus(id)
    val raw = text.getBytes(UTF_8)
    val (frameHdrs, body) = bodyMode(id) match {
      case 0 => (Seq(s"Content-Length: ${raw.length}"), raw)
      case 1 =>
        val g = gzipBytes(raw)
        (Seq("Content-Encoding: gzip", s"Content-Length: ${g.length}"), g)
      case 2 =>
        val d = deflateBytes(raw)
        (Seq("Content-Encoding: deflate", s"Content-Length: ${d.length}"), d)
      case 3 => (Seq("Transfer-Encoding: chunked"), chunkBytes(raw))
      case _ => (Seq("Content-Encoding: gzip", "Transfer-Encoding: chunked"),
        chunkBytes(gzipBytes(raw)))
    }
    val http =
      (s"HTTP/1.1 $status ${httpReason(status)}\r\n" +
        s"Content-Type: ${httpContentType(id)}\r\n" +
        frameHdrs.map(_ + "\r\n").mkString +
        s"X-Crawl-Host: graft.test\r\n" +
        "\r\n").getBytes(US_ASCII) ++ body
    val header =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:graft:doc-$id>\r\n" +
        s"WARC-Target-URI: https://graft.test/$id\r\n" +
        s"Content-Length: ${http.length}\r\n" +
        "\r\n"
    header.getBytes(US_ASCII) ++ http ++ "\r\n\r\n".getBytes(US_ASCII)
  }

  def encodeWarcHttpEnc(documents: DataFrame, shardSize: Long = 50L): Dataset[WarcContainer] = {
    require(shardSize >= 1L, s"shard size must be positive, got $shardSize")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / shardSize)
      .mapGroups { (shard, it) =>
        val out = new java.io.ByteArrayOutputStream()
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val rec = httpEncRecordBytes(id, text)
          out.write(rec, 0, rec.length)
        }
        WarcContainer(shard, out.toByteArray)
      }
  }

  /** [[encodeWarcHttpEnc]] with each record as its OWN gzip member
    * ([[encodeWarcGz]]'s seekable layout) — the full CommonCrawl
    * container: `.warc.gz` on the outside, framed HTTP responses
    * inside. Records are byte-identical to the plain form's. */
  def encodeWarcHttpEncGz(documents: DataFrame, shardSize: Long = 50L): Dataset[WarcContainer] = {
    require(shardSize >= 1L, s"shard size must be positive, got $shardSize")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / shardSize)
      .mapGroups { (shard, it) =>
        val out = new java.io.ByteArrayOutputStream()
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val gz = new java.util.zip.GZIPOutputStream(out)
          val rec = httpEncRecordBytes(id, text)
          gz.write(rec, 0, rec.length)
          gz.finish()
          gz.close() // release the Deflater now (see encodeWarcGz)
        }
        WarcContainer(shard, out.toByteArray)
      }
  }

  /** De-chunk an HTTP/1.1 chunked body: hex size line (bounded at 6
    * hex digits = 16 MB per chunk), CRLF-delimited data, `0`-chunk
    * terminator, nothing after. Every malformed shape fails by name. */
  private[graft] def dechunk(id: Long, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    def crlfAt(q: Int): Boolean =
      q + 1 < body.length && body(q) == '\r' && body(q + 1) == '\n'
    var done = false
    while (!done) {
      var e = p
      while (e < body.length && body(e) != '\r') e += 1
      require(crlfAt(e), s"doc $id: unterminated chunk-size line at byte $p")
      val sizeStr = new String(body, p, e - p, US_ASCII)
      require(sizeStr.nonEmpty && sizeStr.length <= 6 &&
        sizeStr.forall(c => c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')),
        s"doc $id: bad chunk size '$sizeStr'")
      val n = Integer.parseInt(sizeStr, 16)
      p = e + 2
      if (n == 0) {
        require(crlfAt(p), s"doc $id: missing terminator after last chunk")
        p += 2
        require(p == body.length, s"doc $id: ${body.length - p} trailing bytes after final chunk")
        done = true
      } else {
        require(p + n + 2 <= body.length,
          s"doc $id: truncated chunk (declared $n at byte $p of ${body.length})")
        out.write(body, p, n)
        require(crlfAt(p + n), s"doc $id: chunk data not CRLF-terminated")
        p += n + 2
      }
    }
    out.toByteArray
  }

  private[graft] def gunzipBody(id: Long, body: Array[Byte]): Array[Byte] = {
    require(body.length >= 2 && (body(0) & 0xff) == 0x1f && (body(1) & 0xff) == 0x8b,
      s"doc $id: Content-Encoding gzip but body lacks gzip magic")
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
    try in.readAllBytes()
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(s"doc $id: corrupt gzip body (${e.getMessage})")
    } finally in.close()
  }

  private[graft] def inflateBody(id: Long, body: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(body))
    try in.readAllBytes()
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(s"doc $id: corrupt deflate body (${e.getMessage})")
    } finally in.close()
  }

  /** Full HTTP response-body recovery over RAW record payloads: status
    * line + headers as [[parseWarcHttp]], then the body is UN-FRAMED in
    * receiver order — Transfer-Encoding: chunked de-chunked first, then
    * Content-Encoding (gzip / deflate / identity) inflated — and only
    * the recovered PLAIN bytes are UTF-8-decoded. This is the step that
    * makes the funnel's text screens read text instead of compressed
    * bytes on a real crawl. A declared Content-Length must match the
    * payload's actual body span; unknown encodings and every truncated/
    * garbage stream fail loudly by name. Narrow map — records never
    * shuffle, decode runs where the container bytes live. */
  def parseWarcHttpBody(records: Dataset[WarcByteRecord]): Dataset[WarcHttpRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map { r =>
      val (code, hdrs, body) = httpParts(r.doc_id, r.payload)
      WarcHttpRecord(r.doc_id, r.target_uri, code,
        hdrs("content-type"), new String(body, UTF_8))
    }
  }

  /** The shared HTTP response parse behind [[parseWarcHttpBody]] and
    * [[parseWarcHttpText]]: status line + headers, then the body
    * un-framed in receiver order (de-chunk first, then
    * Content-Encoding) — `(status, lower-cased headers, PLAIN body
    * bytes)`. Every malformed shape fails by name. */
  private def httpParts(id: Long, bs: Array[Byte]): (Int, Map[String, String], Array[Byte]) = {
    var hdrEnd = -1
    var q = 0
    while (hdrEnd < 0 && q + 3 < bs.length) {
      if (bs(q) == '\r' && bs(q + 1) == '\n' && bs(q + 2) == '\r' && bs(q + 3) == '\n')
        hdrEnd = q
      q += 1
    }
    require(hdrEnd >= 0, s"doc $id: unterminated HTTP header block")
    val lines = new String(bs, 0, hdrEnd, US_ASCII).split("\r\n", -1)
    val statusLine = lines.head
    require(statusLine.startsWith("HTTP/1.0 ") || statusLine.startsWith("HTTP/1.1 "),
      s"doc $id: bad HTTP status line '$statusLine'")
    val code = statusLine.substring(9).takeWhile(_ != ' ')
    require(code.length == 3 && code.forall(_.isDigit),
      s"doc $id: non-3-digit HTTP status '$code'")
    val hdrs = lines.tail.map { l =>
      val i = l.indexOf(": ")
      require(i > 0, s"doc $id: malformed HTTP header '$l'")
      (l.substring(0, i).toLowerCase(java.util.Locale.ROOT), l.substring(i + 2))
    }.toMap
    require(hdrs.contains("content-type"),
      s"doc $id: missing Content-Type header")
    var body = java.util.Arrays.copyOfRange(bs, hdrEnd + 4, bs.length)
    hdrs.get("transfer-encoding") match {
      case Some(te) =>
        require(te.equalsIgnoreCase("chunked"),
          s"doc $id: unsupported Transfer-Encoding '$te'")
        body = dechunk(id, body)
      case None =>
        // Content-Length only frames a NON-chunked body (RFC 9112
        // §6.3: chunked wins and any Content-Length is ignored)
        hdrs.get("content-length").foreach { cl =>
          require(cl.nonEmpty && cl.length <= 9 && cl.forall(_.isDigit) &&
            cl.toInt == body.length,
            s"doc $id: Content-Length $cl does not match body span ${body.length}")
        }
    }
    hdrs.get("content-encoding") match {
      case None => ()
      case Some(ce) if ce.equalsIgnoreCase("identity") => ()
      case Some(ce) if ce.equalsIgnoreCase("gzip") => body = gunzipBody(id, body)
      case Some(ce) if ce.equalsIgnoreCase("deflate") => body = inflateBody(id, body)
      case Some(ce) => throw new IllegalArgumentException(
        s"doc $id: unsupported Content-Encoding '$ce'")
    }
    (code.toInt, hdrs, body)
  }

  final case class WarcHttpTextRecord(doc_id: Long, target_uri: String,
      http_status: Int, content_type: String, charset: String,
      text: String, n_chars: Long)

  /** The declared charset of a Content-Type value, RFC-9110-style:
    * parameters split on `;`, `charset=` matched case-insensitively,
    * optional double quotes stripped, value lower-cased. Absent
    * parameter defaults to utf-8 (the modern-web overwhelming
    * majority; a deployment screening legacy corpora plugs its
    * sniffer upstream of this default). */
  private[graft] def charsetOf(contentType: String): String =
    contentType.split(";").iterator.drop(1).map(_.trim).collectFirst {
      case p if p.length > 8 &&
        p.substring(0, 8).equalsIgnoreCase("charset=") =>
        val v = p.substring(8).trim
        val unq = if (v.length >= 2 && v.head == '"' && v.last == '"')
          v.substring(1, v.length - 1) else v
        unq.toLowerCase(java.util.Locale.ROOT)
    }.getOrElse("utf-8")

  /** Decode recovered PLAIN body bytes per the DECLARED charset — the
    * step after [[parseWarcHttpBody]]'s un-framing that makes a real
    * crawl's text readable: UTF-8 is decoded STRICTLY (a malformed
    * sequence fails by name instead of silently becoming U+FFFD —
    * mojibake poisoning downstream hashes is exactly the failure this
    * guards), ISO-8859-1/Latin-1 is the 1:1 byte→codepoint transcode,
    * US-ASCII validates the high bit. Any other declared charset
    * fails loudly by name (the house boundary discipline: a silent
    * wrong-charset decode would corrupt every downstream screen). */
  private[graft] def decodeCharset(id: Long, charset: String, body: Array[Byte]): String =
    charset match {
      case "utf-8" | "utf8" =>
        val dec = UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        try dec.decode(java.nio.ByteBuffer.wrap(body)).toString
        catch { case e: java.nio.charset.CharacterCodingException =>
          throw new IllegalArgumentException(
            s"doc $id: malformed UTF-8 body under declared charset '$charset' (${e.getClass.getSimpleName})")
        }
      case "iso-8859-1" | "latin-1" | "latin1" | "windows-1252" | "cp1252" =>
        // the WHATWG encoding rule real browsers (and so real crawls)
        // live by: an iso-8859-1 LABEL decodes as windows-1252 — the
        // two differ only on 0x80-0x9F, where Latin-1's C1 controls
        // are garbage in text and cp1252's symbols (€ " " – —) are
        // what the page meant. The five bytes cp1252 leaves undefined
        // fail by name instead of passing as controls.
        decodeCp1252(id, charset, body)
      case "us-ascii" | "ascii" =>
        var i = 0
        while (i < body.length) {
          require((body(i) & 0x80) == 0,
            s"doc $id: non-ASCII byte 0x${(body(i) & 0xff).toHexString} at offset $i under declared charset '$charset'")
          i += 1
        }
        new String(body, US_ASCII)
      case other => throw new IllegalArgumentException(
        s"doc $id: unsupported charset '$other'")
    }

  /** Windows-1252's 0x80-0x9F block (the only range where it differs
    * from Latin-1); −1 marks the five bytes the codepage leaves
    * undefined (0x81, 0x8D, 0x8F, 0x90, 0x9D). */
  private val Cp1252High: Array[Int] = Array(
    0x20AC, -1, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017D, -1,
    -1, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, -1, 0x017E, 0x0178)

  private def decodeCp1252(id: Long, label: String, body: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val b = body(i) & 0xff
      val cp =
        if (b < 0x80 || b >= 0xA0) b
        else {
          val m = Cp1252High(b - 0x80)
          require(m >= 0,
            s"doc $id: byte 0x${b.toHexString} at offset $i is undefined in windows-1252 (declared charset '$label')")
          m
        }
      sb.append(cp.toChar)
      i += 1
    }
    sb.toString
  }

  /** [[parseWarcHttpBody]] completed into TEXT: the recovered plain
    * bytes are decoded per the Content-Type's DECLARED charset
    * ([[charsetOf]] / [[decodeCharset]]) — the step a CommonCrawl
    * funnel needs because the web is not uniformly UTF-8 (Latin-1
    * responses read as mojibake under a blind UTF-8 decode, silently
    * corrupting every downstream hash/shingle/screen). Same narrow
    * map as the body form — records never shuffle. */
  def parseWarcHttpText(records: Dataset[WarcByteRecord]): Dataset[WarcHttpTextRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map { r =>
      val (code, hdrs, body) = httpParts(r.doc_id, r.payload)
      val ct = hdrs("content-type")
      val cs = charsetOf(ct)
      val text = decodeCharset(r.doc_id, cs, body)
      WarcHttpTextRecord(r.doc_id, r.target_uri, code, ct, cs, text, text.length.toLong)
    }
  }

  /** Suffix codepoint `k` of the charset fixture's logical text —
    * arithmetic off doc_id so the oracle replays it via `chr()`:
    * `161 + (id + 7k) mod 94` spans 0xA1..0xFE, the printable
    * Latin-1 high range (every value is BOTH a valid Latin-1 byte
    * and a 2-byte UTF-8 sequence, so the two encodings genuinely
    * differ on the wire). */
  private[graft] def charsetSuffixCp(id: Long, k: Int): Int =
    161 + ((id + 7L * k) % 94L).toInt

  /** Charset-dimension WARC fixture: 200-status responses whose
    * Content-Type declares the body encoding — ids ≡ 0 mod 4 are
    * `text/html; charset=utf-8` (2-byte sequences on the wire for the
    * accented suffix), ≡ 1 `text/html; charset=iso-8859-1` (high-bit
    * single bytes), ≡ 2 `text/plain; charset="ISO-8859-1"` (QUOTED,
    * upper-case parameter — the value spelling realistic headers
    * carry), ≡ 3 `text/html; charset=windows-1252` with a EURO SIGN
    * in the text — € is wire byte 0x80, which only the cp1252 remap
    * block produces, so this mode exercises the table where the
    * Latin-1 modes (suffix bytes all ≥ 0xA1) cannot. The logical text
    * is the document text plus a 3-char accented suffix
    * ([[charsetSuffixCp]]; mode 3 prepends €), so a decoder bug in
    * ANY branch hash-fails against the one oracle. Framing is plain
    * Content-Length — the encoding dimension is
    * [[encodeWarcHttpEnc]]'s, orthogonal to this one. */
  def encodeWarcCharset(documents: DataFrame, shardSize: Long = 50L): Dataset[WarcContainer] = {
    require(shardSize >= 1L, s"shard size must be positive, got $shardSize")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / shardSize)
      .mapGroups { (shard, it) =>
        val out = new java.io.ByteArrayOutputStream()
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val suffix = (0 until 3).map(k => charsetSuffixCp(id, k).toChar).mkString
          val logical = text + " " + suffix
          val (ctype, body) = (id % 4) match {
            case 0 => ("text/html; charset=utf-8", logical.getBytes(UTF_8))
            case 1 => ("text/html; charset=iso-8859-1",
              logical.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
            case 2 => ("text/plain; charset=\"ISO-8859-1\"",
              logical.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
            case _ =>
              // € (U+20AC) is cp1252 byte 0x80; the suffix bytes pass
              // through the identity ranges
              val raw = (text + " €" + suffix)
              val bs = new Array[Byte](raw.length)
              var i = 0
              while (i < raw.length) {
                bs(i) = if (raw.charAt(i) == '€') 0x80.toByte
                        else raw.charAt(i).toByte
                i += 1
              }
              ("text/html; charset=windows-1252", bs)
          }
          val http =
            (s"HTTP/1.1 200 ${httpReason(200)}\r\n" +
              s"Content-Type: $ctype\r\n" +
              s"Content-Length: ${body.length}\r\n" +
              "\r\n").getBytes(US_ASCII) ++ body
          val header =
            "WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:graft:doc-$id>\r\n" +
              s"WARC-Target-URI: https://graft.test/$id\r\n" +
              s"Content-Length: ${http.length}\r\n" +
              "\r\n"
          val rec = header.getBytes(US_ASCII) ++ http ++ "\r\n\r\n".getBytes(US_ASCII)
          out.write(rec, 0, rec.length)
        }
        WarcContainer(shard, out.toByteArray)
      }
  }

  /** Parse WARC containers back to records: walk each container's
    * bytes record by record — version line, headers to the blank line,
    * a `Content-Length`-sized byte slice (decoded UTF-8), the CRLF CRLF
    * terminator — until the container is exhausted. The doc id is
    * recovered from the `<urn:graft:doc-N>` record id, so the
    * round-trip is keyed by the record's OWN metadata, not by
    * container position. */
  def parseWarc(containers: Dataset[WarcContainer]): Dataset[WarcRecord] = {
    val spark = containers.sparkSession
    import spark.implicits._
    containers.flatMap(c => parseContainer(c.shard_id, c.bytes))
  }

  /** [[parseWarc]] keeping each record's payload as RAW BYTES — the
    * entry point for HTTP-body decoding ([[parseWarcHttpBody]]), where
    * the payload may carry gzip/deflate bytes that a String decode
    * would corrupt. Same walker, same named failures. */
  def parseWarcRaw(containers: Dataset[WarcContainer]): Dataset[WarcByteRecord] = {
    val spark = containers.sparkSession
    import spark.implicits._
    containers.flatMap(c => parseContainerRaw(c.shard_id, c.bytes))
  }

  /** [[parseWarcGz]]'s raw-payload twin: inflate the member chain,
    * keep record payloads as bytes — the full CommonCrawl read path
    * (`.warc.gz` container, HTTP framing inside) feeds
    * [[parseWarcHttpBody]] through this. */
  def parseWarcGzRaw(containers: Dataset[WarcContainer]): Dataset[WarcByteRecord] = {
    val spark = containers.sparkSession
    import spark.implicits._
    containers.flatMap { c =>
      require(c.bytes.length >= 2 &&
        (c.bytes(0) & 0xff) == 0x1f && (c.bytes(1) & 0xff) == 0x8b,
        s"shard ${c.shard_id}: not a gzip container (bad magic)")
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(c.bytes))
      val inflated = try in.readAllBytes() finally in.close()
      parseContainerRaw(c.shard_id, inflated)
    }
  }

  private def parseContainer(sid: Long, bs: Array[Byte]): Seq[WarcRecord] =
    parseContainerRaw(sid, bs).map(r =>
      WarcRecord(r.doc_id, r.target_uri, new String(r.payload, UTF_8)))

  private def parseContainerRaw(sid: Long, bs: Array[Byte]): Seq[WarcByteRecord] = {
      var p = 0
      def line(): String = {
        var e = p
        while (e + 1 < bs.length && !(bs(e) == '\r' && bs(e + 1) == '\n')) e += 1
        require(e + 1 < bs.length,
          s"shard $sid: unterminated header line at byte $p")
        val s = new String(bs, p, e - p, US_ASCII)
        p = e + 2
        s
      }
      val out = scala.collection.mutable.ArrayBuffer[WarcByteRecord]()
      while (p < bs.length) {
        val version = line()
        require(version == "WARC/1.0",
          s"shard $sid: bad WARC version line '$version' at record ${out.length}")
        val hdrs = scala.collection.mutable.Map[String, String]()
        var l = line()
        while (l.nonEmpty) {
          val i = l.indexOf(": ")
          require(i > 0, s"shard $sid: malformed WARC header '$l'")
          hdrs(l.substring(0, i)) = l.substring(i + 2)
          l = line()
        }
        def mandatory(k: String): String = {
          require(hdrs.contains(k), s"shard $sid: missing mandatory WARC header $k")
          hdrs(k)
        }
        val lenStr = mandatory("Content-Length")
        // digit-count bound keeps toLong total: a 20+-digit all-numeric
        // length would throw a raw NumberFormatException past the named
        // requires (r18 advisor); 18 digits < Long.MaxValue always
        require(lenStr.nonEmpty && lenStr.length <= 18 &&
          lenStr.forall(_.isDigit),
          s"shard $sid: non-numeric or oversized Content-Length '$lenStr'")
        val len = lenStr.toLong
        require(len <= Int.MaxValue.toLong && p + len + 4 <= bs.length,
          s"shard $sid: truncated WARC payload (declared $len at byte $p of ${bs.length})")
        val payload = java.util.Arrays.copyOfRange(bs, p, p + len.toInt)
        p += len.toInt
        require(bs(p) == '\r' && bs(p + 1) == '\n' &&
          bs(p + 2) == '\r' && bs(p + 3) == '\n',
          s"shard $sid: record not CRLF CRLF terminated at byte $p")
        p += 4
        val rid = mandatory("WARC-Record-ID")
        val digits =
          if (rid.startsWith("<urn:graft:doc-") && rid.endsWith(">") &&
            rid.length > 16) rid.substring(15, rid.length - 1)
          else ""
        require(digits.nonEmpty && digits.length <= 18 &&
          digits.forall(_.isDigit),
          s"shard $sid: unrecognized record id '$rid'")
        out += WarcByteRecord(digits.toLong,
          mandatory("WARC-Target-URI"), payload)
      }
      out.toSeq
  }
}
