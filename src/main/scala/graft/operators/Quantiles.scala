package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-grid histogram quantiles: the bounded-state, merge-safe way to
  * estimate per-group quantiles at corpus scale.
  *
  * Exact `percentile()` materializes and sorts every value of a group on
  * one reducer — at 100 TB that is the operator that dies first. The
  * histogram path reduces the data to (group, bucket) counts — state
  * bounded by value-range/width, NOT by row count, and mergeable across
  * partials like any count — then reads the quantile off the cumulative
  * distribution with linear interpolation inside the hit bucket. One
  * groupBy shuffle over bucket counts + one tiny window over the
  * #buckets rows per group; accuracy is a width knob, and — unlike
  * t-digest/KLL — the estimate is DETERMINISTIC, so it oracle-checks
  * bit-for-bit (`quantile_histogram` replays the same arithmetic in
  * DuckDB).
  *
  * Estimate definition (left-continuous, mass-proportional): for target
  * t = q·N, find the first bucket whose cumulative count reaches t, and
  * interpolate start + (t − cum_before)/cnt · width. NULL values are
  * excluded (SQL aggregate semantics). */
object Quantiles {

  def histogramQuantile(df: DataFrame, keys: Seq[String], valueCol: String,
      width: Double, qs: Seq[(String, Double)]): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      s"quantiles must be in (0, 1], got ${qs.map(_._2).mkString(",")}")
    val keyCols = keys.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols :+
        floor(col(valueCol).cast("double") / lit(width)).cast("long").as("__bucket"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCols: _*)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__total", sum(col("__cnt")).over(wTot))
    // per quantile: the single row where cum_before < t <= cum
    val estCols = qs.map { case (name, q) =>
      val t = lit(q) * col("__total").cast("double")
      val cumBefore = (col("__cum") - col("__cnt")).cast("double")
      val hit = cumBefore < t && t <= col("__cum").cast("double")
      max(when(hit,
        col("__bucket").cast("double") * lit(width) +
          (t - cumBefore) / col("__cnt").cast("double") * lit(width))).as(name)
    }
    cum.groupBy(keyCols: _*).agg(estCols.head, estCols.tail: _*)
  }
}
