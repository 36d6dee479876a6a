package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.CreditFunctions

/** Structured-Streaming DPD surface (SURVEY.md §2.10 — extension beyond
  * reference parity, which is batch-only): incremental
  * `arrears_dpd_status`-style snapshots over an event stream.
  *
  * Two designs, in preference order:
  *  1. [[dailyWorstDpd]] — stateless-windowed: tumbling 1-day event-time
  *     window + watermark; Spark's windowed agg keeps and expires state.
  *     Scales as a standard streaming shuffle on (loan_id, window).
  *  2. [[withRunningState]] — `flatMapGroupsWithState` when the operator
  *     needs per-loan memory across days (running max, cure detection):
  *     KeyValueGroupedDataset partitions by loan_id; state size is O(1)
  *     per loan. State lifetime is the caller's choice via `timeout`:
  *     the default NoTimeout keeps every loan's state for the life of
  *     the query (fine for a bounded book); a production deployment over
  *     an unbounded id space should pass ProcessingTimeTimeout (and call
  *     state.setTimeoutDuration) or EventTimeTimeout with a watermarked
  *     input so idle loans expire instead of growing the state store.
  *
  * Both transforms are readStream/read agnostic: pass a streaming OR
  * batch DataFrame with (loan_id long, ts timestamp, dpd int); tests
  * drive them through MemoryStream.
  */
object StreamingDpd {

  /** Worst DPD (+bucket) per loan per event-time day, late data admitted
    * up to the watermark. */
  def dailyWorstDpd(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("day"), col("loan_id"))
      .agg(max(col("dpd")).as("worst_dpd"))
      .select(
        col("loan_id"),
        col("day.start").cast(DateType).as("as_of_date"),
        col("worst_dpd"),
        CreditFunctions.dpdBucket(col("worst_dpd")).as("dpd_bucket"))

  /** Batch twin of [[withRunningState]]'s FINAL state for the
    * batch-invariant fields: running max, latest value (by event time,
    * value as tiebreaker — the same order the stateful kernel processes
    * a batch in), and the sticky NPL flag. These three are associative
    * over micro-batch boundaries, so however the stream was chunked, the
    * last update per loan must equal this one-pass batch aggregation —
    * the oracle-checkable contract for the stateful path (the `cured`
    * pulse is deliberately absent: it compares consecutive BATCHES, so
    * it depends on chunking by design). One window shuffle on loan_id. */
  def finalStateBatch(events: DataFrame): DataFrame = {
    val byLoan = Window.partitionBy(col("loan_id"))
    val latest = Window.partitionBy(col("loan_id"))
      .orderBy(col("ts").desc, col("dpd").desc)
    events
      .withColumn("max_dpd", max(col("dpd")).over(byLoan))
      .withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1)
      .select(col("loan_id"), col("max_dpd"), col("dpd").as("last_dpd"),
        (col("max_dpd") > 90).as("ever_npl"))
  }

  final case class DpdEvent(loan_id: Long, ts: java.sql.Timestamp, dpd: Int)
  final case class DpdState(maxDpd: Int, lastDpd: Int, everNpl: Boolean)
  final case class DpdUpdate(loan_id: Long, max_dpd: Int, last_dpd: Int,
      cured: Boolean, ever_npl: Boolean)

  /** Per-loan running DPD state: running max, latest value, sticky NPL
    * flag, and a cure signal (was delinquent, now 0). Emits one update
    * per (loan, micro-batch). */
  def withRunningState(
      events: Dataset[DpdEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[DpdUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.loan_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (loanId: Long, batch: Iterator[DpdEvent], state: GroupState[DpdState]) =>
          val prev = state.getOption.getOrElse(DpdState(0, 0, everNpl = false))
          // event-time order within the batch, at FULL timestamp
          // precision: getTime alone is millis and would collapse
          // sub-millisecond-distinct events into dpd-order ties that
          // finalStateBatch (ordering the ts column exactly) doesn't
          // have; (getTime, getNanos) refines to the true instant
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.dpd))
          if (evs.isEmpty) Iterator.empty
          else {
            val last = evs.last.dpd
            val mx = math.max(prev.maxDpd, evs.map(_.dpd).max)
            val npl = prev.everNpl || mx > 90
            val cured = prev.lastDpd > 0 && last == 0
            state.update(DpdState(mx, last, npl))
            Iterator.single(DpdUpdate(loanId, mx, last, cured, npl))
          }
      }
  }
}
