package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver's TPC-H-ish testdata tier (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory.
  *
  * Reads are plain `spark.read.parquet` scans so Catalyst can push
  * filters and prune columns into the parquet reader (the staging
  * cast-projections in [[graft.analog.Analog]] select only what they
  * need, which shows up as a narrowed `ReadSchema` in `.explain`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** events: `ts` is surfaced as a NANOS-SINCE-EPOCH LONG no matter how
    * the file stores the instant — that long is the contract every
    * downstream derives from (`ts div 1000` ↔ the oracle's `epoch_us`,
    * and the long is the window-order tiebreaker).
    *
    * The driver has shipped the column under two physical encodings:
    *  - TIMESTAMP(MICROS) (current generator): the footer schema converts
    *    cleanly, so read natively and widen `unix_micros * 1000` — exact
    *    (micros ≈ 1.7e15 → nanos ≈ 1.7e18 < 2^63), and identical to what
    *    DuckDB's reader observes, since micro precision is all the file
    *    carries.
    *  - TIMESTAMP(NANOS) (earlier generator): Spark's footer-schema
    *    conversion REJECTS the type, so the probe read throws and the
    *    fallback supplies an explicit schema with `ts` as a raw long —
    *    full nanos precision, no session-wide `nanosAsLong` flag (which
    *    would silently change every other nanos parquet source).
    *
    * An NTZ instant (`isAdjustedToUTC=false`) casts through the
    * UTC-pinned session ([[LocalSession]]), so the wall-clock micros ARE
    * the stored integer — same convention as `dq/Profile`'s temporal
    * columns. */
  def events: DataFrame = {
    val path = s"$dir/events.parquet"
    // The nanos fallback is for ONE failure: Spark's footer-schema
    // converter rejecting TIMESTAMP(NANOS) ("Illegal Parquet type ...").
    // Everything else (missing file, corrupt footer, absent ts column)
    // must surface as ITS OWN error here, not as a confusing downstream
    // read failure against the explicit-schema fallback.
    def isNanosRejection(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { c =>
        val m = Option(c.getMessage).getOrElse("")
        m.contains("Illegal Parquet type") || m.contains("TIMESTAMP(NANOS")
      }
    val footerTs =
      try Some(spark.read.parquet(path).schema("ts").dataType)
      catch {
        case e if scala.util.control.NonFatal(e) && isNanosRejection(e) => None
      }
    footerTs match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        import org.apache.spark.sql.functions._
        spark.read.parquet(path).select(
          col("event_id"),
          (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      case Some(LongType) => spark.read.parquet(path)
      case _ =>
        spark.read.schema(StructType(Seq(
            StructField("event_id", LongType),
            StructField("ts", LongType),
            StructField("user_id", LongType),
            StructField("event_type", StringType),
            StructField("value", DoubleType),
            StructField("props", StringType)))) // JSON payload, e.g. {"k": 87}
          .parquet(path)
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
