package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact×dim equi-joins whose fact side has hot keys
  * (one loan with millions of snapshot rows lands on one reducer in a
  * plain shuffle join).
  *
  * [[saltedJoin]] spreads each fact key over `salts` reducers: fact rows
  * get a salt in [0, salts), the (small) dim side is replicated `salts`
  * times via an explode, and the join key becomes (key, salt). The
  * result set is IDENTICAL to the plain inner join — salting only
  * changes the physical distribution — so correctness is unaffected and
  * the operator composes anywhere a plain join does.
  *
  * AQE's skew-join handling covers most cases automatically (and is on
  * by default in this engine); explicit salting remains the tool when
  * the skew is known up front or the join sits under an operator AQE
  * cannot re-plan (e.g. a streaming stateful stage).
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    require(!fact.columns.contains(saltCol) && !dim.columns.contains(saltCol),
      s"input already has internal column $saltCol")
    // row-level spreading: the salt must vary WITHIN a hot key, so it
    // derives from the row CONTENT, never from the physical row
    // position — monotonically_increasing_id() is nondeterministic under
    // shuffle-map retries (a recomputed partition would re-salt the same
    // rows differently, the classic repartition-by-nondeterministic-key
    // correctness hazard); a content hash reproduces identically.
    // Columns containing maps or variants ANYWHERE in their type (hash()
    // rejects both recursively) are excluded. Limitation of
    // ANY deterministic salt: bit-identical duplicate rows share one
    // salt — if the hot key is duplicate-heavy, pre-aggregate the
    // duplicates into a count column first (the standard fix), which
    // also shrinks the fact.
    import org.apache.spark.sql.types._
    def unhashable(dt: DataType): Boolean = dt match {
      case _: MapType | _: VariantType => true
      case s: StructType => s.fields.exists(f => unhashable(f.dataType))
      case a: ArrayType => unhashable(a.elementType)
      case _ => false
    }
    val hashCols = fact.schema.fields
      .filterNot(f => unhashable(f.dataType))
      .map(f => col(f.name)).toSeq
    // the hash must include something BEYOND the join key: hashing the
    // key alone gives one salt per key — no spreading at all, while the
    // dim still replicates salts-fold. Fail loud instead of silently
    // degrading to a strictly-worse plain join.
    require(hashCols.map(_.toString) != Seq(col(key).toString),
      s"salting needs a hashable non-key column to spread the hot key '$key'; " +
        "pre-aggregate duplicate rows or add a distinguishing column")
    require(hashCols.nonEmpty, "fact must have at least one hashable (map/variant-free) column to salt on")
    val saltedFact = fact.withColumn(saltCol,
      pmod(hash(hashCols: _*).cast("long"), lit(salts.toLong)))
    val replicatedDim = dim.withColumn(saltCol, explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, saltCol), "inner").drop(saltCol)
  }

  /** Skew-safe exact distinct count. `countDistinct(value)` under a hot
    * group key is the one aggregation map-side partials cannot save: the
    * planner's Expand/partial-distinct machinery still reduces every
    * (key, value) pair of the hot key on one reducer for the final
    * distinct. The two-phase rewrite shuffles on the FULL (keys, value)
    * composite first — spreading a hot group across reducers by value —
    * then counts the deduped rows per key (second shuffle carries one
    * row per distinct value). Result-identical to countDistinct; both
    * shuffles are skew-free unless a single (key, value) pair dominates,
    * which dedup collapses to one row anyway. */
  def distinctCountSkewSafe(df: DataFrame, keys: Seq[String], valueCol: String,
      resultName: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      // count(value), not count(*): distinct() keeps one (key, NULL) row
      // but countDistinct ignores NULLs — counting the value column
      // skips it too, keeping the rewrite exactly result-identical
      .agg(count(col(valueCol)).as(resultName))

  /** Hot-key diagnostic: the report an engineer reads BEFORE reaching for
    * [[saltedJoin]] — the top-k keys by row count with each key's share
    * of the table and a flag at the configured share threshold. Shape is
    * scale-safe end to end: one groupBy shuffle to key counts, top-k via
    * orderBy+limit (distributed take-ordered, never a rank window's
    * single-task sort), and the total arrives as a broadcast one-row
    * cross join AFTER the limit — at no point does the full key list
    * pass through one task. Total order (cnt desc, key asc) makes the
    * k-boundary deterministic under ties. */
  def hotKeyReport(df: DataFrame, keyCol: String, topK: Int,
      hotShare: Double): DataFrame = {
    require(topK > 0 && hotShare > 0, s"need positive topK/hotShare, got $topK/$hotShare")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topK)
    val total = df.agg(count(lit(1)).as("total"))
    counts.join(broadcast(total))
      .withColumn("share", col("cnt").cast("double") / col("total").cast("double"))
      .select(col(keyCol), col("cnt"), col("share"),
        (col("share") > hotShare).as("hot"))
  }
}
