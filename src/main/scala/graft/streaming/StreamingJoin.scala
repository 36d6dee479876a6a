package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (SURVEY.md §2.10 extension): anchor
  * events enriched with same-key probe events from a trailing time
  * window — the "what happened around this error/default" correlation
  * query, incremental.
  *
  * Read-agnostic like the rest of the streaming surface: on batch
  * frames it is a plain equi-join on the key with the time bound as a
  * residual predicate (never a nested loop). On TWO STREAMS the pieces
  * do real work: both sides carry watermarks, and the two-sided
  * time-range condition (probe ∈ [anchor − lookback, anchor]) is
  * exactly what Spark's stream-stream join needs to compute per-side
  * state-retention bounds — anchor rows expire `lookback` past the
  * probe watermark, probe rows expire at the anchor watermark, so join
  * state is bounded by the watermark horizon, never the stream's
  * history.
  *
  * Contract: `key`/`probeKey` and the two time columns are distinct
  * names (the caller aliases); time columns are TimestampType (a
  * micros-long won't engage watermark state expiry). Inclusive bounds
  * on both ends; self-pairs are the caller's filter (the anchor stream
  * is often a subset of the probe stream). */
object StreamingJoin {

  def trailingWindowJoin(anchors: DataFrame, probes: DataFrame,
      key: String, probeKey: String, anchorTime: String, probeTime: String,
      lookback: Column, watermark: String): DataFrame = {
    require(key != probeKey && anchorTime != probeTime,
      "anchor/probe column names must be distinct — alias before joining")
    anchors.withWatermark(anchorTime, watermark)
      .join(probes.withWatermark(probeTime, watermark),
        col(key) === col(probeKey) &&
          col(probeTime) >= col(anchorTime) - lookback &&
          col(probeTime) <= col(anchorTime),
        "inner")
      .drop(probeKey)
  }
}
