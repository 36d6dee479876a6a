package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit-N repartition: single-file parquet scans arrive as ONE
  * partition, and an N-less `repartition(col)` is coalesced back to one
  * task by AQE on small data — an explicit N is respected. One shared
  * helper so the parallelism workaround cannot drift per operator. */
object Partitioning {
  def spread(df: DataFrame, c: Column): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt, c)
}
