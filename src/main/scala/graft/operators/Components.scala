package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the cluster-formation step of a
  * dedup pipeline (north-star): near-dup *pairs* (MinHash/SimHash output)
  * become *clusters*, from which one representative document is kept.
  *
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * label and its neighbors' labels, then follows the new label one hop
  * through the previous round's table (pointer jumping); fixpoint =
  * components labeled by their smallest member. Pointer jumping halves
  * chain lengths per round, so convergence is O(log diameter) — near-dup
  * graphs are unions of small cliques-ish blobs, so very few rounds.
  *
  * Scale notes: each round is one shuffle (edge ⋈ label on src, then
  * min-agg on dst) over edge-count-sized data — the standard large-graph
  * CC shape (GraphX/Pregel does the same dataflow). Labels are
  * `localCheckpoint`ed per round: without truncation the join lineage
  * doubles each iteration and the planner re-optimizes an exponentially
  * growing tree. Convergence is probed with a `limit(1)` existence check
  * on changed labels, not a full count. */
object Components {

  /** @param edges two-column DataFrame of undirected edges
    * @return (id, cluster_id) — cluster_id = smallest member id */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b", maxIter: Int = 20): DataFrame = {
    // materialize the symmetrized edge list once — it is re-joined every
    // round, and without this the upstream pair pipeline (shingling,
    // banding, verification) re-executes per iteration
    val sym0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true)
    // Size the loop's parallelism to the EDGE list, not the session
    // default: near-dup edges are orders of magnitude fewer rows than the
    // corpus that produced them, and every subsequent round re-shuffles
    // this width. ~1M edge rows per task keeps tasks comfortably sized at
    // any scale; the count is free (sym0 is already materialized).
    val parts = math.max(1, math.min(
      sym0.sparkSession.sparkContext.defaultParallelism * 4,
      (sym0.count() / 1000000L).toInt + 1))
    val sym =
      if (sym0.rdd.getNumPartitions <= parts) sym0
      else sym0.repartition(parts).localCheckpoint(true)
    // Label init fused with the first propagation round: every node of a
    // symmetrized edge list appears as `src`, so min(dst) per src IS round
    // one's neighbor-min — one aggregate replaces the distinct() plus one
    // full loop iteration.
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("lbl"))
      .select(col("src").as("id"), col("lbl"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels.select(col("id").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min("lbl").as("nlbl"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl1"))
      // pointer jump: follow the new label one hop through the previous
      // round's table (labels are node ids, so lbl1 indexes it) — chain
      // lengths halve per round, so convergence is O(log diameter)
      // instead of O(diameter). (Doubling the pointers further inside
      // the round was tried and reverted: the self-join duplicates the
      // whole un-checkpointed subtree, costing more than the rounds it
      // saves.)
      val next = stepped.join(
          labels.select(col("id").as("lbl1"), col("lbl").as("plbl")),
          Seq("lbl1"), "left")
        .select(col("id"), col("old"),
          least(col("lbl1"), coalesce(col("plbl"), col("lbl1"))).as("lbl"))
        .localCheckpoint(true)
      // convergence probe scans the just-materialized blocks — no join
      converged = next.filter(col("lbl") =!= col("old")).limit(1).isEmpty
      labels = next.select("id", "lbl")
      i += 1
    }
    // un-converged labels are WRONG labels (some nodes still carry a
    // non-minimal id) — fail loudly rather than return them. Superseded
    // rounds' checkpoint blocks are reclaimed by the ContextCleaner once
    // the old `labels` reference is dropped (same discipline as
    // TextDedup's caches).
    require(converged,
      s"connected components did not converge in $maxIter rounds " +
        "(pointer jumping covers diameter ~2^maxIter; raise maxIter)")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
