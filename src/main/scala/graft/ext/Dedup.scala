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
  * more small self-join). The jump halves chain depth per round, so
  * convergence is O(log diameter) instead of O(diameter) — real near-dup
  * graphs DO grow long transitive chains (the sf0.1 simhash graph has a
  * 627-vertex family needing 17 plain rounds; jumping does it in ~6).
  * Each round's labels are eagerly local-checkpointed: the loop would
  * otherwise grow an unbounded lineage (and re-plan the whole history
  * every round).
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
      val prop = labels
        .join(nbrMin, Seq("v"), "left")
        .select(col("v"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump: comp(v) <- comp(comp(v)), looked up in the PREVIOUS
      // round's (checkpointed) label table — prev-round labels are valid
      // same-component upper bounds and labels only decrease, so least()
      // is the safe combine and the fixpoint (component min) is
      // unchanged; jumping against `labels` instead of `prop` lets the
      // round materialize ONCE (prop appears in a single join branch,
      // and the convergence action + next round both read the
      // checkpointed `jumped` blocks instead of re-running the joins)
      val jumped = prop
        .join(labels.select(col("v").as("comp"), col("comp").as("jump")), Seq("comp"), "left")
        .select(col("v"), col("prev"),
          least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      converged = jumped.filter(col("comp") =!= col("prev")).isEmpty
      labels = jumped.select(col("v"), col("comp"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "the pair graph has a longer chain than expected; raise maxIter")
    labels.select(col("v").as("doc_id"), col("comp").as("component_id"))
  }
}
