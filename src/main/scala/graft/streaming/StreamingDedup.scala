package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact-dedup for corpus ingest — the streaming member of the
  * dedup family (SURVEY.md §2.10 extension; batch siblings are
  * `Load.firstWins` and the near-dup operators in `ext/`).
  *
  * An ingest stream re-delivers documents (at-least-once sources,
  * crawler revisits); deduping at ingest keeps every downstream stage
  * from paying for the duplicates. Semantics: the FIRST arrival of each
  * key within the watermark horizon survives; later arrivals whose event
  * time is inside the horizon are dropped.
  *
  * Scale contract: `dropDuplicatesWithinWatermark` expires key state
  * once the watermark passes it, so the state store is bounded by
  * (keys arriving per horizon) — a plain `dropDuplicates` on a stream
  * would grow state forever on an unbounded id space (exactly the
  * unbounded-state trap `StreamingDpd.withRunningState` documents for
  * NoTimeout). Batch twin: first-wins keyed dedup (`Load.firstWins`),
  * which additionally pins WHICH row survives — a stream pins it by
  * arrival order instead (deterministic per run, not across reorderings;
  * an oracle would need replayed arrival order, so the driver check for
  * this family stays on the batch twin).
  */
object StreamingDedup {

  def dedupStream(docs: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
  }
}
