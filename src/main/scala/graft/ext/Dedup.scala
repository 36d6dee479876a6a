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
  * Scale shape: iterative min-label propagation — per round, every
  * vertex takes the min of its own label and its neighbors' labels (one
  * equi-join edges×labels + one groupBy-min + one join back, all keyed
  * shuffles, never a driver-side graph). Rounds needed = graph diameter,
  * which for near-dup families is small (dense clusters have diameter
  * 1–2; a pathological chain of length d needs d rounds — the standard
  * large-star/small-star variant would cut that to O(log d) at the cost
  * of two extra shuffles per round; diameter-bound propagation is the
  * right default for dedup graphs). Each round's labels are
  * eagerly local-checkpointed: the loop would otherwise grow an
  * unbounded lineage (and re-plan the whole history every round).
  */
object Dedup {

  /** (doc_id, component_id) for every vertex of `pairs`, where
    * component_id is the minimum doc_id reachable through the undirected
    * pair graph. Vertices not present in any pair are their own implicit
    * component and are NOT emitted (callers treat absence as identity —
    * keeps the frame proportional to the duplicated subset, which at
    * corpus scale is the small side). */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be positive, got $maxIter")
    // undirected: symmetrize once, reuse every round
    val edges = pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(pairs.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    // init fused with round 1: the vertex set comes from the same
    // groupBy-on-a shuffle that computes each vertex's neighborhood min,
    // so the first propagation is free relative to a distinct-vertices
    // initialization
    var labels = edges.groupBy(col("a").as("v"))
      .agg(min(col("b")).as("nmin"))
      .select(col("v"), least(col("v"), col("nmin")).as("comp"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("v").as("a"), col("comp").as("la")), Seq("a"))
        .groupBy(col("b").as("v")).agg(min(col("la")).as("nmin"))
      val updated = labels
        .join(nbrMin, Seq("v"), "left")
        .select(col("v"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      converged = updated.filter(col("comp") =!= col("prev")).isEmpty
      labels = updated.select(col("v"), col("comp"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "the pair graph has a longer chain than expected; raise maxIter")
    labels.select(col("v").as("doc_id"), col("comp").as("component_id"))
  }
}
