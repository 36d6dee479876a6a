package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph centrality for corpus curation — the web-graph quality signal
  * (PageRank-family) large-scale training-data pipelines weight
  * documents by, re-expressed as keyed Spark aggregations with an
  * EXACT-INTEGER iteration so the fixpoint prefix hash-replays in SQL.
  *
  * Numeric-determinism contract: float PageRank accumulates partition-
  * order-dependent IEEE sums (never cross-engine-reproducible), so rank
  * mass here is an int64 budget of `mass` units (10¹²): every vertex
  * starts at `mass div V`, each iteration sends `r div outdeg` whole
  * units down every out-edge, and the damped update is
  * `base + (85 · Σ in) div 100` with `base = (15 · (mass div V)) div
  * 100` — floor divisions both engines define identically on
  * non-negative ints. The tiny mass shed by the floors only ever
  * SHRINKS ranks (never reorders a dominant vertex), and determinism
  * is what buys the oracle.
  *
  * Scale shape: rank state is a V-row DataFrame (never collected);
  * each iteration is one src-keyed equi-join + one dst-keyed sum + one
  * vertex-keyed left join — keyed shuffles only, no driver loops over
  * data. The edge frame (with out-degrees) is checkpointed once and
  * reused by every round. Supernode protection is the CALLER's job
  * (cap degrees before calling — see [[docCentrality]]'s df window),
  * because only the caller knows which high-degree vertices are
  * stopword-like noise versus signal.
  */
object Graph {

  private val RankSchema = StructType(Seq(
    StructField("vertex", StringType), StructField("rank_units", LongType)))

  private def emptyRanks(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[Row], RankSchema)

  /** `iters` damped PageRank rounds over a directed `(src, dst)` edge
    * frame of STRING vertex ids; returns `(vertex, rank_units)` for
    * every vertex that appears in an edge. Vertices with no out-edges
    * shed their mass (documented dangling-mass loss — at a fixed
    * iteration count the ranking signal survives); vertices with no
    * in-edges settle at `base`. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      mass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(mass > 0, s"mass must be positive, got $mass")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val v = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct().localCheckpoint(false)
    val nV = v.count()
    if (nV == 0) return emptyRanks(edges)
    val init = mass / nV
    val base = (15L * init) / 100L
    // out-degrees ride WITH the edges so each round joins once on src
    val eo = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .join(e, Seq("src")).localCheckpoint(false)
    var r = v.select(col("vertex"), lit(init).as("rank_units"))
    (1 to iters).foreach { _ =>
      val in = eo.join(r, eo("src") === r("vertex"))
        .select(col("dst").as("vertex"),
          expr("rank_units div outdeg").as("contrib"))
        .groupBy(col("vertex")).agg(sum(col("contrib")).as("in_sum"))
      r = v.join(in, Seq("vertex"), "left")
        .select(col("vertex"),
          expr(s"$base + (85 * coalesce(in_sum, 0)) div 100").as("rank_units"))
        .localCheckpoint(false) // each round feeds the next + the caller
    }
    r
  }

  /** Document centrality over the doc–shingle bipartite graph — the
    * TextRank/web-graph idea applied to corpus quality: a document is
    * central when it shares informative n-gram shingles with many
    * central documents. Edges connect `d:<doc_id>` to `t:<shingle
    * hash>` BOTH ways (undirected random walk) for per-doc-DISTINCT
    * shingle hashes ([[MinHash.shingleHashes]] — the int64 unit every
    * near-dup operator shuffles, not the n·wordlen-byte string) inside
    * the df window `minDf ≤ df ≤ maxDf`: singleton shingles carry no
    * cross-document signal, and boilerplate-grade supernodes (df >
    * maxDf) would both flood one reducer key AND launder rank mass
    * through semantically empty hubs (the ngramJaccardPairs
    * doc-frequency pruning discipline, reused for degree capping).
    * Documents with no in-window shingles are absent from the output,
    * exactly as they are absent from the pruned graph. */
  def docCentrality(documents: DataFrame, n: Int = 3, minDf: Int = 2,
      maxDf: Int = 20, iters: Int = 3): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    require(maxDf >= minDf, s"maxDf ($maxDf) must be >= minDf ($minDf)")
    // checkpoint the (doc_id, hashes) frame BEFORE exploding — the
    // ngramJaccardPairs discipline: explode() is a Generate node, and
    // generating straight off the un-materialized hash expression
    // re-evaluates the token-hash lambda without CSE (the
    // O(tokens²·chars) pathology tokenHashFrame documents; measured
    // 226 s vs 1.5 s at sf0.1 before this ordering)
    val docSh = MinHash.shingleHashes(documents, n).localCheckpoint(false)
    val ex = docSh.select(col("doc_id"), explode(col("hashes")).as("s"))
    val kept = ex.join(
      ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDf && col("df") <= maxDf)
        .select(col("s")),
      Seq("s"))
    val docV = concat(lit("d:"), col("doc_id").cast(StringType))
    val termV = concat(lit("t:"), col("s").cast(StringType))
    val edges = kept.select(docV.as("src"), termV.as("dst"))
      .union(kept.select(termV.as("src"), docV.as("dst")))
    pageRank(edges, iters)
      .filter(col("vertex").startsWith("d:"))
      .select(expr("CAST(substring(vertex, 3) AS BIGINT)").as("doc_id"),
        col("rank_units"))
  }
}
