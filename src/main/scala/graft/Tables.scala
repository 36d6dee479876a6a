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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * FOOTER-schema conversion rejects; supplying the schema explicitly
    * (ts as a nanos-since-epoch long — full precision, and the long is
    * also the window-order tiebreaker) skips that conversion without
    * mutating session config (`nanosAsLong` would silently change how
    * every other nanos parquet source in the session is read). Callers
    * derive date/timestamp views via exact integer division. */
  def events: DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))) // JSON payload, e.g. {"k": 87}
      .parquet(s"$dir/events.parquet")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
