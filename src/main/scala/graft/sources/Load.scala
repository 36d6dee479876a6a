package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Load-path operators mirroring the reference's sink semantics.
  *
  * S4 — `ON CONFLICT (keys) DO NOTHING` (`pg_oltp_synth.py:791`):
  * Postgres keeps the FIRST arriving row per key. A distributed engine
  * has no arrival order, so [[firstWins]] makes the choice explicit and
  * DETERMINISTIC: the caller names the order ("first" = smallest under
  * `orderBy`), implemented as the shared windowed top-1 — one shuffle on
  * the key, same plan shape at any scale. `dropDuplicates` would be
  * cheaper but keeps an ARBITRARY row — unacceptable under an oracle
  * (SURVEY.md §2.1 S4 note).
  *
  * S5 — `RETURNING id`: a distributed write cannot echo generated keys;
  * [[withSurrogateKeys]] assigns dense keys BEFORE the write via a
  * row_number over an explicit total order (reproducible, unlike
  * `monotonically_increasing_id`, which is partition-layout dependent).
  */
object Load {

  /** Deterministic first-wins key dedup (idempotent re-load). */
  def firstWins(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame =
    Snapshots.topOnePerGroup(df, keys, orderBy)

  /** Dense surrogate keys 'offset+1 ..' in `orderBy` order (the analog of
    * sequence-generated ids with a restartable floor, `pg_oltp_synth.py:
    * 99-115`). Global row_number = one total sort — use only at dim-table
    * scale; facts should carry natural keys. */
  def withSurrogateKeys(df: DataFrame, keyName: String, offset: Long, orderBy: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderBy: _*)
    df.withColumn(keyName, row_number().over(w).cast("long") + offset)
  }

  /** Corpus-scale dense id assignment — the distributed upgrade of
    * [[withSurrogateKeys]] (whose single global row_number window is a
    * one-task sort, documented dim-only). Two phases, the classic
    * zipWithIndex shape expressed relationally:
    *   1. count rows per bounded shard (`orderCol div shardSize`) — one
    *      small aggregate, collected to the driver (#shards rows, tiny
    *      relative to the data by construction);
    *   2. exclusive-prefix-sum the counts into per-shard offsets,
    *      broadcast them back, and number rows within each shard
    *      (bounded window) + offset.
    * Ids are dense 1..n in `orderCol` order; `orderCol` must be unique
    * (it seeds both the shard and the in-shard order). */
  def withDenseIds(df: DataFrame, orderCol: String, idName: String,
      shardSize: Long = 1L << 20): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val shard = "__graft_shard"
    require(!df.columns.contains(shard) && !df.columns.contains(idName),
      s"input already has a $shard/$idName column")
    // orderCol must be a top-level column: it is parsed into an integer
    // div expression (precision-exact at any id magnitude, which a
    // floor(double) shard would lose past 2^53)
    require(df.columns.contains(orderCol) && !orderCol.contains("`"),
      s"withDenseIds needs a top-level order column, got '$orderCol'")
    // Two-pass contract: the input must be DETERMINISTIC under
    // recomputation (same requirement as Spark's own range-partitioning
    // sample pass, and the recompute hazard saltedJoin documents) — a
    // rand-derived input could desynchronize phase-1 counts from phase-2
    // contents. Deliberately NOT checkpointed: pinning a corpus-sized
    // snapshot on executor-local storage would trade that documented
    // contract for unrecoverable executor-loss failures at exactly the
    // scale this operator targets.
    val sharded = df.withColumn(shard, expr(s"`$orderCol` div ${shardSize}L"))
    val counts = sharded.groupBy(col(shard)).count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"withDenseIds: order column '$orderCol' contains NULL — dense ids need a total order")
        r.getLong(0) -> r.getLong(1)
      }.sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF(shard, "__graft_offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shard)).orderBy(col(orderCol))
    sharded
      .join(broadcast(offsetDf), Seq(shard))
      .withColumn(idName,
        row_number().over(w).cast("long") + col("__graft_offset"))
      .drop(shard, "__graft_offset")
  }

  /** Partitioned, sorted parquet write — the batch-sink analog of the
    * reference's paged INSERTs (S3), with layout chosen for downstream
    * reads: partition pruning on `partitionBy` + bucketed-ish locality
    * via in-partition sort.
    *
    * Re-run semantics mirror the reference's re-seedable loader
    * (`pg_oltp_synth.py:118-139` truncates and reinserts cleanly):
    * overwrite is DYNAMIC — a re-run replaces exactly the partitions the
    * incoming frame touches and leaves every other partition intact, so
    * the daily incremental re-load of one `year=2024` slice cannot wipe
    * ten years of history the way a static overwrite would (the
    * difference is invisible on a fresh dir and catastrophic on a
    * populated one). Idempotence follows: writing the same frame twice
    * leaves exactly one copy.
    *
    * Schema drift fails LOUDLY before any data moves: under dynamic
    * overwrite a second write with a changed column type would land
    * next to old-schema partitions and poison the unified read later —
    * at the reader, far from the writer that caused it. If the target
    * already exists, the incoming frame must carry the same column
    * names, and the same types for data columns (partition-column types
    * are compared by name only: the read side re-infers them from path
    * strings, which legitimately widens e.g. a written string "2024" to
    * an int). */
  def writePartitioned(df: DataFrame, path: String, partitionBy: Seq[String], sortBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(fsPath) && fs.listStatus(fsPath).nonEmpty) {
      val existing = spark.read.parquet(path).schema
      val exNames = existing.fieldNames.toSet
      val inNames = df.schema.fieldNames.toSet
      require(exNames == inNames,
        s"writePartitioned: schema drift against existing '$path' — existing columns " +
          s"${exNames.toSeq.sorted.mkString(",")} vs incoming ${inNames.toSeq.sorted.mkString(",")}")
      val exTypes = existing.fields.map(f => f.name -> f.dataType).toMap
      df.schema.fields.filterNot(f => partitionBy.contains(f.name)).foreach { f =>
        require(exTypes(f.name) == f.dataType,
          s"writePartitioned: type drift for column '${f.name}' against existing '$path' — " +
            s"existing ${exTypes(f.name)} vs incoming ${f.dataType}")
      }
    }
    // Cluster rows by the partition columns before a partitioned write:
    // without it every upstream task opens a writer per partition value
    // it sees (tasks × values small files — the classic partitioned-write
    // file storm; the synth snapshot fact produced ~32×10 of them).
    // REBALANCE, not repartition: a plain hash repartition pins each
    // partition value to exactly ONE reducer forever (AQE can coalesce
    // but never split a user repartition), so a dominant partition value
    // would serialize its entire write through one task. The rebalance
    // hint is AQE's write-optimized shuffle: small values coalesce,
    // oversized hash buckets SPLIT into multiple tasks.
    val clustered =
      if (partitionBy.nonEmpty) df.hint("rebalance", partitionBy.map(col): _*) else df
    // the sort is PREFIXED with the partition columns: the file writer
    // requires per-task ordering on the dynamic partition columns, and a
    // bare sortBy that doesn't satisfy that prefix gets a second sort
    // stacked on top (re-sorting — and on spill, re-interleaving — the
    // rows, silently voiding the in-partition layout)
    val sortCols = ((partitionBy ++ sortBy).distinct).map(col)
    val sorted =
      if (sortCols.nonEmpty) clustered.sortWithinPartitions(sortCols: _*) else clustered
    // writer-level option, not session config: flipping the session-wide
    // partitionOverwriteMode would silently change every other writer
    sorted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*).parquet(path)
  }

  /** Bucketed managed-table write: co-locates rows by `bucketKey` at
    * WRITE time so later equi-joins/aggregations on that key read both
    * sides pre-partitioned and skip the shuffle entirely — the 100 TB
    * answer for the repeated fact×fact joins on `loan_id` (write the
    * snapshot fact bucketed once, every downstream join is exchange-free
    * on that side). */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String, nBuckets: Int,
      sortCols: Seq[String] = Nil, path: Option[String] = None): Unit = {
    // an explicit path makes the table EXTERNAL (data under the caller's
    // dir — e.g. a self-cleaning Scratch dir — instead of the session
    // warehouse); bucketing metadata lives in the catalog either way
    val base = df.write.mode("overwrite").format("parquet")
    val w = path.fold(base)(p => base.option("path", p)).bucketBy(nBuckets, bucketKey)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
