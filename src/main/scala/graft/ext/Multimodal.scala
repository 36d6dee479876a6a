package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * iteration — is real; the DECODE step is a clearly-marked deterministic
  * STUB (this environment ships no image/audio codecs): it derives
  * features from the raw bytes so the pipeline shape, types and tests
  * are exactly what a real decoder would plug into (swap
  * [[decodeFeaturesStub]]'s body for JNI/FFI codec calls; everything
  * upstream/downstream is unchanged).
  *
  * Scale posture: media rows are heavy (MB-scale blobs at production) —
  * the feature extraction is a narrow `mapPartitions` (no shuffle, no
  * driver collect), metadata-only transforms never deserialize the blob,
  * and frame sampling is pure arithmetic on metadata.
  */
object Multimodal {

  /** Derive a deterministic media table from `documents`: the text bytes
    * stand in for an encoded payload; kind/width/height/duration are
    * arithmetic off doc_id (oracle-reproducible). */
  def media(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("bytes"),
      (lit(64L) + (col("doc_id") * 37) % 1856).as("width"),
      (lit(64L) + (col("doc_id") * 53) % 1016).as("height"),
      (lit(1L) + (col("doc_id") * 17) % 600).as("duration_s"),
      lit(24L).as("fps"))

  /** Metadata-only frame sampling: every `strideS` seconds, never touching
    * the payload. Output is scalar metadata (count + first/last frame
    * index) so it stays cheap and oracle-comparable. */
  def frameSamplePlan(media: DataFrame, strideS: Long): DataFrame =
    media
      .withColumn("n_frames", col("duration_s") * col("fps"))
      .withColumn("frames_sampled", expr(s"(duration_s + ${strideS - 1}) div $strideS"))
      .select(
        col("doc_id"), col("kind"),
        length(col("bytes")).cast(LongType).as("byte_len"),
        col("width"), col("height"), col("duration_s"), col("n_frames"),
        col("frames_sampled").cast(LongType).as("frames_sampled"),
        lit(0L).as("first_frame"),
        ((col("frames_sampled").cast(LongType) - 1) * strideS * col("fps")).as("last_frame"))

  final case class MediaRow(doc_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
      first_byte: Int, last_byte: Int, byte_sum_mod: Long)

  /** STUB decoder (see object doc): a real implementation would decode
    * the payload (libjpeg/ffmpeg/...) and emit embeddings; this derives
    * deterministic features from raw bytes with the SAME signature and
    * batch shape (per-partition iterator — one codec context per
    * partition, not per row). */
  def decodeFeaturesStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real decoder: init codec context here, once per partition
      rows.map { m =>
        val bs = m.bytes
        val sum = bs.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 1000003L)
        MediaFeatures(m.doc_id, m.kind, bs.length,
          if (bs.nonEmpty) bs.head & 0xff else -1,
          if (bs.nonEmpty) bs.last & 0xff else -1,
          sum)
      }
    }
  }
}
