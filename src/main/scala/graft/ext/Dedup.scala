package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive near-duplicate clustering: connected components over the
  * candidate-pair graph, and the canonical-representative selection it
  * enables.
  *
  * Pairwise dedup (drop the higher id of every pair, `dedup_near_keep`)
  * is greedy: in a chain a–b, b–c the pair list drops b and c even
  * though c may only resemble b, and transitive families (the common
  * case for boilerplate/template text) are over- or under-dropped
  * depending on pair order. The component view makes the family explicit:
  * every document gets its component's minimum doc_id as
  * `component_id`, a canonical representative per family, and "keep one
  * per family" becomes one filter.
  *
  * Scale shape: iterative min-label propagation with POINTER JUMPING —
  * per round, every vertex takes the min of its own label and its
  * neighbors' labels (one equi-join edges×labels + one groupBy-min +
  * one join back, all keyed shuffles, never a driver-side graph), then
  * shortcuts through its label's label (`comp(v) ← comp(comp(v))`, one
  * small self-join). The jump halves chain depth per round, so
  * convergence is O(log diameter) instead of O(diameter) — real near-dup
  * graphs DO grow long transitive chains (the sf0.1 simhash graph has a
  * 627-vertex family needing 17 plain rounds; jumping does it in ~6; a
  * second jump per round was measured NET-SLOWER here — its two extra
  * shuffle stages cost more than the rounds they save). Each round is a
  * single Spark job: a lazy localCheckpoint truncates the plan to a leaf
  * and the changed-count action materializes it.
  */
object Dedup {

  /** (doc_id, component_id) for every vertex of `pairs`, where
    * component_id is the minimum doc_id reachable through the undirected
    * pair graph. Vertices not present in any pair are their own implicit
    * component and are NOT emitted (callers treat absence as identity —
    * keeps the frame proportional to the duplicated subset, which at
    * corpus scale is the small side). */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50, maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(maxIter >= 1, s"maxIter must be positive, got $maxIter")
    // undirected: symmetrize once, reuse every round
    val edges = pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(pairs.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    // Two-level algorithm. The pair graph is the OUTPUT of candidate
    // pruning — orders of magnitude smaller than the corpus — so it very
    // often fits one node even when the corpus never could. Under an
    // explicit edge budget (the same kind of contract as Spark's
    // broadcast-join threshold; order-100 MB of boxed pairs transiently
    // on a driver sized like the executors, at the default 1M edges) a
    // driver-side union-find finishes in one collect job instead of
    // O(log diameter) shuffle rounds, each of which costs fixed
    // scheduling overhead that dominates at this size. Above the budget
    // — the true 100 TB regime — the distributed min-label fixpoint
    // below runs unchanged. Both paths compute the identical labeling
    // (min reachable id), asserted against each other in ExtSpec.
    val idType = edges.schema("a").dataType
    val localOk = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    if (localOk && edges.count() <= maxLocalEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)].collect()
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // larger root attaches under smaller, so every root stays the
        // minimum of its tree and find() IS the min-reachable label
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = es.iterator.flatMap(p => Iterator(p._1, p._2)).toArray
        .distinct.map(v => (v, find(v))).toSeq
      // parallelize, don't toDF: a LocalRelation of up to 2M rows would
      // be embedded in the logical plan and reserialized into every
      // downstream stage that references the components frame
      return spark.createDataset(
          spark.sparkContext.parallelize(out, math.max(1, out.length / 500000)))
        .toDF("doc_id", "component_id")
        .select(col("doc_id").cast(idType), col("component_id").cast(idType))
    }
    // init fused with round 1: the vertex set comes from the same
    // groupBy-on-a shuffle that computes each vertex's neighborhood min,
    // so the first propagation is free relative to a distinct-vertices
    // initialization
    var labels = edges.groupBy(col("a").as("v"))
      .agg(min(col("b")).as("nmin"))
      .select(col("v"), least(col("v"), col("nmin")).as("comp"))
      .localCheckpoint(true)
    // Iterative loops pay a FIXED cost per Spark job (scheduling, stage
    // barriers) that dominates on the small-relative-to-corpus pair
    // graph and multiplies under host contention, so each round is ONE
    // action: a LAZY localCheckpoint truncates the plan to a leaf
    // immediately (a persist-based variant nests ~5 copies of the prior
    // round's tree per round — exponential plan growth) and the round's
    // filter-count both materializes the checkpoint blocks and returns
    // the changed-row count (the old shape was two jobs/round — an eager
    // checkpoint plus a separate isEmpty probe). Blocks are RDD-owned,
    // so the ContextCleaner reclaims dropped rounds — nothing stays
    // pinned in the session cache manager after the call.
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("v").as("a"), col("comp").as("la")), Seq("a"))
        .groupBy(col("b").as("v")).agg(min(col("la")).as("nmin"))
      val prop = labels
        .join(nbrMin, Seq("v"), "left")
        .select(col("v"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump: comp(v) <- comp(comp(v)), looked up in the
      // PREVIOUS round's label table — prev-round labels are valid
      // same-component upper bounds and labels only decrease, so least()
      // is the safe combine and the fixpoint (component min) is
      // unchanged. ONE jump per round: a second jump quarters chain depth
      // but was measured net-slower — its two extra shuffle stages cost
      // more than the ~2 rounds they save on realistic diameters.
      def jumpThrough(df: DataFrame): DataFrame = df
        .join(labels.select(col("v").as("comp"), col("comp").as("jump")), Seq("comp"), "left")
        .select(col("v"), col("prev"),
          least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
      val jumped = jumpThrough(prop).localCheckpoint(false)
      val changed = jumped.filter(col("comp") =!= col("prev")).count()
      labels = jumped.select(col("v"), col("comp"))
      converged = changed == 0L
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "the pair graph has a longer chain than expected; raise maxIter")
    labels.select(col("v").as("doc_id"), col("comp").as("component_id"))
  }
}
