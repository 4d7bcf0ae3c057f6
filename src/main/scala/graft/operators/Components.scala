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
    * @param driverThreshold symmetrized-edge count at or below which the
    *        component structure is solved by driver-side union-find
    *        instead of the iterative join loop. A near-dup pair graph is
    *        orders of magnitude smaller than the corpus that produced it
    *        (it is the *output* of the LSH filter), while the join loop
    *        costs several scheduler round-trips per iteration regardless
    *        of size. Driver memory at the threshold: edges stream through
    *        `toLocalIterator` (one partition resident at a time), so the
    *        held state is the DISTINCT-node map (boxed id → int) plus an
    *        int parent array — ~100 B per distinct node, edge count only
    *        bounds it. 1M edges ⇒ ≤2M nodes ⇒ ≤200 MB worst case, far
    *        under a default 4 GB driver. Above the threshold the
    *        distributed loop takes over unchanged. Both paths produce
    *        identical labels (asserted in SketchSpec).
    * @return (id, cluster_id) — cluster_id = smallest member id */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b", maxIter: Int = 20,
                          driverThreshold: Long = 1000000L): DataFrame = {
    // materialize the edge list once BEFORE symmetrizing — the union's two
    // branches would otherwise each execute the upstream pair pipeline
    // (shingling, banding, verification), doubling its cost; the swap is
    // a free projection over the checkpointed blocks. Materialization also
    // keeps the pipeline from re-executing per iteration (it is re-joined
    // every round).
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val sym0 = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val nEdges = 2L * e0.count() // free: e0 is already materialized
    if (nEdges <= driverThreshold) return driverComponents(sym0)
    // Size the loop's parallelism to the EDGE list, not the session
    // default: near-dup edges are orders of magnitude fewer rows than the
    // corpus that produced them, and every subsequent round re-shuffles
    // this width. ~1M edge rows per task keeps tasks comfortably sized at
    // any scale.
    val parts = math.max(1, math.min(
      sym0.sparkSession.sparkContext.defaultParallelism * 4,
      (nEdges / 1000000L).toInt + 1))
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

  /** Small-graph path: union-find (path halving) on the driver over
    * index-mapped node ids — O(E α(E)) in one collect, versus several
    * scheduler round-trips per round for the join loop. The cluster label
    * (min member id) is deliberately NOT computed with JVM orderings:
    * node ids keep their engine type end-to-end and the per-component min
    * is taken by a Spark `min() OVER (PARTITION BY root)` on the (tiny)
    * membership table, so label semantics (UTF8 binary string order,
    * decimal order, …) are bit-identical to the distributed path. */
  private def driverComponents(sym: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = sym.sparkSession
    val idType = sym.schema("src").dataType
    val index = scala.collection.mutable.HashMap.empty[Any, Int]
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Any]
    def idx(v: Any): Int =
      index.getOrElseUpdate(v, { nodes += v; nodes.length - 1 })
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    // stream edges instead of collect(): only one partition of Rows is
    // resident at a time, so driver heap holds the distinct-node state,
    // not the full boxed edge list
    sym.toLocalIterator().forEachRemaining { r =>
      val a = idx(r.get(0)); val b = idx(r.get(1))
      while (parent.length < nodes.length) parent += parent.length
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val membership = nodes.indices.map { i =>
      org.apache.spark.sql.Row(nodes(i), find(i))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("root", org.apache.spark.sql.types.IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(membership, 1), schema)
      .withColumn("cluster_id", min(col("id")).over(Window.partitionBy("root")))
      .select(col("id"), col("cluster_id"))
  }
}
