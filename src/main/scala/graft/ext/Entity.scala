package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution by blocked fuzzy matching: find pairs of entity
  * strings that are small edit-distance variants of each other without
  * ever comparing all pairs.
  *
  * The scale shape is the record-linkage classic: reduce to DISTINCT
  * entity strings first (mentions of one spelling collapse to a single
  * vertex — the mention-level linking is a join back on the string),
  * derive a cheap deterministic BLOCKING KEY, equi-join within blocks
  * only, and verify candidates with the exact distance. Cost is
  * sum-of-block² over distinct strings, not corpus², and the `maxBlock`
  * cap bounds even that — an oversized block (a blocking key that
  * degenerated, e.g. an empty-string key) is excluded wholesale rather
  * than letting one hot key quadratically dominate, the same
  * cap-don't-explode contract as `Text.ngramJaccardPairs`' maxDocFreq
  * pruning. Recall within a block is exact; cross-block typos (an edit
  * that changes the blocking token itself) are the documented miss, the
  * standard single-key blocking tradeoff — run again with a second
  * independent key and union to recover them (multi-pass blocking).
  *
  * The verify predicate is `levenshtein` — integer edit distance, defined
  * identically in every engine, so the whole operator (blocking,
  * candidate set, verdict) is oracle-checkable bit-for-bit. */
object Entity {

  /** Matched pairs (name_a < name_b) of distinct values of `nameCol`
    * sharing a blocking key (the string's LAST whitespace token — for
    * "adjective noun"-shaped entity names, the stable head noun) with
    * edit distance ≤ `maxDistance`. */
  def blockedMatches(df: DataFrame, nameCol: String, maxDistance: Int,
      maxBlock: Long = 10000L): DataFrame =
    matchesWithKey(distinctNames(df, nameCol),
      element_at(split(col("name"), " "), -1), maxDistance, maxBlock)

  /** Multi-pass blocking: the recall-recovery path for edits that change
    * the single blocking token itself. Runs one pass per independent key
    * (head noun, then leading token), unions the candidate pairs, and
    * dedups — a pair is found if ANY key survives its typo, so only an
    * edit hitting EVERY blocking token at once is missed. Cost is
    * additive in passes (each pass is the same capped block equi-join),
    * nowhere near pair-verification of the cross product. */
  def blockedMatchesMulti(df: DataFrame, nameCol: String, maxDistance: Int,
      maxBlock: Long = 10000L): DataFrame = {
    val names = distinctNames(df, nameCol)
    Seq(element_at(split(col("name"), " "), -1),
        element_at(split(col("name"), " "), 1))
      .map(k => matchesWithKey(names, k, maxDistance, maxBlock)
        .select(col("name_a"), col("name_b"), col("distance")))
      .reduce(_.unionByName(_))
      .distinct()
  }

  /** The closed entity-resolution loop: every row of `df` labeled with
    * its variant family's canonical spelling. Pipeline: distinct strings
    * → multi-pass blocked matching → transitive clustering
    * ([[Dedup.connectedComponents]] — a chain a~b~c is ONE family even
    * when a and c don't match directly) → canonical = the name whose id
    * is the family minimum → one join back to the mentions. The
    * component step needs numeric vertices, so each name's id is its
    * minimum `idCol` (deterministic, engine-reproducible); names outside
    * every match pair canonicalize to themselves. */
  def canonicalize(df: DataFrame, idCol: String, nameCol: String,
      maxDistance: Int, maxBlock: Long = 10000L): DataFrame = {
    val ids = df.select(col(nameCol).as("name"), col(idCol).cast("long").as("__id"))
      .filter(col("name").isNotNull)
      .groupBy(col("name")).agg(min(col("__id")).as("nid"))
    val pairs = blockedMatchesMulti(df, nameCol, maxDistance, maxBlock)
      .join(ids.select(col("name").as("name_a"), col("nid").as("id_a")), Seq("name_a"))
      .join(ids.select(col("name").as("name_b"), col("nid").as("id_b")), Seq("name_b"))
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val canon = ids
      .join(comp.withColumnRenamed("doc_id", "nid"), Seq("nid"), "left")
      .withColumn("canon_id", coalesce(col("component_id"), col("nid")))
    val canonNames = ids.select(col("nid").as("canon_id"), col("name").as("canonical_name"))
    df.join(
      canon.join(canonNames, Seq("canon_id"))
        .select(col("name").as(nameCol), col("canonical_name")),
      Seq(nameCol), "left")
  }

  private def distinctNames(df: DataFrame, nameCol: String): DataFrame =
    df.select(col(nameCol).as("name")).filter(col("name").isNotNull).distinct()

  private def matchesWithKey(names: DataFrame, blockKey: org.apache.spark.sql.Column,
      maxDistance: Int, maxBlock: Long): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be nonnegative, got $maxDistance")
    require(maxBlock >= 2, s"maxBlock below 2 can never produce a pair, got $maxBlock")
    val keyed = names.withColumn("block", blockKey)
    // block-size cap: one groupBy over the (small) distinct-name frame
    val sized = keyed.join(
      keyed.groupBy(col("block")).agg(count(lit(1)).as("__bsz")), Seq("block"))
      .filter(col("__bsz") <= maxBlock)
      .select(col("block"), col("name"))
    sized.select(col("block"), col("name").as("name_a"))
      .join(sized.select(col("block"), col("name").as("name_b")), Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("distance", levenshtein(col("name_a"), col("name_b")))
      .filter(col("distance") <= maxDistance)
      .select(col("name_a"), col("name_b"), col("block"), col("distance"))
  }
}
