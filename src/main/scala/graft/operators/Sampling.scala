package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: keep (up to) `k` rows per stratum,
  * chosen by an affine hash of the row id — the balanced-subset operator
  * a training pipeline needs (cap the dominant language/source, keep
  * every rare stratum whole).
  *
  * Why hash-ranked instead of `df.sampleBy`/`rand(seed)`: Spark's random
  * samplers draw per-partition, so the selected SET changes with the
  * partition layout (and between engines); ranking by a pure function of
  * the id is partition-independent, reproducible in any engine, and
  * gives exact per-stratum counts instead of Bernoulli approximations.
  * One window shuffle on the strata columns.
  */
object Sampling {

  /** Pseudo-random but deterministic rank key for an id: affine map in
    * 1000003-space (id reduced first — overflow-safe at any id scale). */
  def hashOrder(id: Column): Column =
    (id % 1000003L) * 2654435761L % 1000003L

  /** Up to `k` rows per stratum, by (hashOrder(id), id) — the id
    * tiebreaker makes the selection total even across hash collisions. */
  def samplePerGroup(df: DataFrame, strata: Seq[Column], id: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(!df.columns.contains("__rn"), "input already has internal column __rn")
    val w = Window.partitionBy(strata: _*).orderBy(hashOrder(id).asc, id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
