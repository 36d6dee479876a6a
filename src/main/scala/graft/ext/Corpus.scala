package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for a training-data pipeline: deterministic
  * splits and the composed "clean corpus" materialization. */
object Corpus {

  /** Deterministic train/test assignment from the id alone: an affine
    * hash in 1000003-space, bucketed mod 100, `< trainPct` → 'train'.
    * Partition-layout-independent and stable across runs/engines (the
    * property a reproducible training pipeline needs — `rand(seed)`
    * changes with the partitioning, a modulo on raw ids inherits any id
    * striping). The id is reduced mod the prime first so the multiply
    * never overflows int64 at any id scale; the final bucket is
    * sign-normalized ((x % 100 + 100) % 100) so NEGATIVE ids still land
    * in [0, 100) — Scala/SQL `%` keep the dividend's sign, which would
    * otherwise make every negative id 'train' at any trainPct. */
  def splitBucket(id: Column): Column =
    ((id % 1000003L) * 2654435761L % 1000003L % 100L + 100L) % 100L

  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct must be in [0,100], got $trainPct")
    df.withColumn("split",
      when(splitBucket(col(idCol)) < trainPct, "train").otherwise("test"))
  }
}
