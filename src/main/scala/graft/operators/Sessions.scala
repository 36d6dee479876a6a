package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a key's event stream into sessions
  * separated by quiet gaps longer than a threshold — the standard
  * clickstream/telemetry operator (and the batch twin of Structured
  * Streaming's `session_window`).
  *
  * Shape: ONE window shuffle on the key. A lag marks rows whose distance
  * to the predecessor exceeds the gap (session starts), and a running
  * sum of the marker numbers the sessions per key — linear work, no
  * self-join, no range join, AQE-skew-splittable like any keyed window.
  *
  * The time column is a NUMERIC instant (epoch nanos here): integer
  * differences are exact and engine-portable, while timestamp-interval
  * arithmetic truncates differently per engine (DuckDB intervals carry
  * micros; a nanos-precision boundary event would sessionize
  * differently). Callers with timestamps convert first.
  */
object Sessions {

  /** Adds `session_no` (1-based per key, in `order` within the key):
    * a new session starts where `ts - lag(ts) > gapNanos`. `order` must
    * be a total order (pass tiebreakers) or the numbering is ambiguous. */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapNanos: Long,
      order: Seq[Column]): DataFrame = {
    require(gapNanos > 0, s"gap must be positive, got $gapNanos")
    require(!df.columns.exists(c =>
      c == "session_no" || c == "__prev_ts" || c == "__new_session"),
      "input already has a session_no / internal sessionize column")
    val w = Window.partitionBy(key).orderBy(order: _*)
    val run = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev_ts", lag(ts, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull || ts - col("__prev_ts") > gapNanos, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("__new_session")).over(run))
      .drop("__prev_ts", "__new_session")
  }
}
