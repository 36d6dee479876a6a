package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without the nested loop.
  *
  * `points JOIN intervals ON key AND point BETWEEN start AND end` has no
  * equi-condition on the time axis, so Spark plans it as a broadcast
  * nested loop (or a cartesian when neither side fits) — the join that
  * dies first at fact×fact scale. The standard rewrite: quantize time
  * into fixed grain cells, explode each interval into the cells it
  * covers (bounded by interval-length/grain per row), equi-join on
  * (keys..., cell), and keep the exact BETWEEN as a residual filter.
  *
  * Each (point, interval) pair meets in EXACTLY one cell — the point's
  * own — so no post-join dedup is needed; the output is the exact join
  * result. Cost is one shuffle on (keys, cell) with the interval side
  * inflated by ~(length/grain + 1); pick `grainDays` near the typical
  * interval length to keep that factor ≈ 2.
  *
  * Contract: `startCol <= endCol` (inverted intervals produce no cells
  * and drop out); NULL dates drop out (inner-join semantics, like the
  * BETWEEN predicate they'd fail anyway). */
object IntervalJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String, grainDays: Int): DataFrame = {
    require(grainDays > 0, s"grainDays must be positive, got $grainDays")
    val epoch = to_date(lit("1970-01-01"))
    // floor-div of the epoch day — floor (not int-cast truncation) so
    // pre-1970 dates still land in the right cell; day counts are exact
    // in double far beyond any calendar range
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(datediff(c, epoch) / lit(grainDays.toDouble)).cast("long")
    // guard inverted intervals explicitly: sequence(a, b) with b < a
    // auto-steps DOWNWARD in Spark (it would emit cells, all killed by
    // the residual filter but shuffled first); an empty array explodes
    // to zero rows, which is the documented contract
    val cells = intervals.withColumn("__cell",
      explode(when(col(endCol) >= col(startCol),
        sequence(cellOf(col(startCol)), cellOf(col(endCol))))
        .otherwise(array().cast("array<long>"))))
    points.withColumn("__cell", cellOf(col(pointCol)))
      .join(cells, keys :+ "__cell")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }
}
