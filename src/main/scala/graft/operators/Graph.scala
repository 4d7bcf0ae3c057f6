package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Distributed triangle counting on an undirected graph.
  *
  * The naive triangle join (edges ⋈ edges ⋈ edges) enumerates a wedge for
  * every 2-path, i.e. Σ_v deg(v)², which explodes on skewed degree
  * distributions (the co-purchase graph below has ~41M wedges at sf0.1
  * unoriented vs ~1.9M triangles). The standard scalable fix (Cohen,
  * "Graph Twiddling in a MapReduce World", 2009; also Suri & Vassilvitskii
  * WWW'11) orients every edge from its lower-(degree, id) endpoint to the
  * higher one: each triangle is then counted exactly once, and wedge
  * generation is bounded by Σ_v outdeg(v)² where outdeg ≤ O(√E) for every
  * vertex — the heavy hub that dominates the naive join generates NO
  * wedges because all its edges point inward.
  *
  * Shuffle shape: degree agg (one exchange on vertex), orientation joins
  * against the degree table (broadcast when |V| is small, shuffle join
  * otherwise — Spark's planner picks by stats), wedge self-join on the
  * out-vertex, and the closing-edge equi-join on (b, c). Everything is
  * equi-join shaped — no cross products anywhere — so AQE can handle skew
  * per key.
  */
object Graph {

  /** Canonical undirected edge set from a (group, member) co-occurrence
    * relation: an edge links two members that share a group, deduplicated
    * across groups, with endpoints ordered a < b.
    *
    * Shape: ONE group-keyed set-collect (bounded state — a group's
    * member set, e.g. an order's line items), in-row pair expansion
    * over the sorted array, and the cross-group distinct — two
    * exchanges total. The equivalent distinct + self-join + distinct
    * chain pays a third exchange and materializes the per-group join
    * fan-out through a shuffle; the fan-out itself (Σ_g C(|g|, 2)) is
    * identical either way, this just generates it inside the row. */
  def coOccurrenceEdges(pairs: DataFrame, groupCol: String,
                        memberCol: String): DataFrame =
    pairs.select(col(groupCol).as("__g"), col(memberCol).as("__m"))
      .groupBy("__g").agg(sort_array(collect_set(col("__m"))).as("ms"))
      .where(size(col("ms")) >= 2)
      // pin the width before the C(|g|,2) expansion: the member-set
      // relation is BYTE-small, so AQE coalesces it to one partition
      // and the CPU-bound pair explosion would run single-threaded
      .repartition(pairs.sparkSession.sparkContext.defaultParallelism)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("ms")) - 1), i =>
          transform(sequence(i + 1, size(col("ms"))), j =>
            struct(element_at(col("ms"), i).as("a"),
              element_at(col("ms"), j).as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()

  /** Hub-capped adjacency for wedge generation: per `src`, keep only
    * the `k` lowest-`dst` neighbors (a deterministic per-key top-k any
    * SQL engine replays with row_number). Wedge joins on the capped
    * adjacency cost Σ min(deg,k)² — linear in vertices at fixed k —
    * instead of Σ deg², which explodes on power-law hubs (a degree-1M
    * hub owes C(1M,2) ≈ 5·10¹¹ pairs uncapped, C(k,2) ≈ 2k capped).
    *
    * ADAPTIVE: one tiny max over the degree aggregate decides the plan
    * (CBO-style statistics, not semantics) — when no vertex exceeds k
    * the cap is the identity and the per-key sort the window would
    * spend on |E| rows is skipped entirely. Either branch produces the
    * same rows, so an oracle that always applies the row_number cap
    * still matches. ScaleProbe's hub_cap rows pin the flat-under-hub-
    * growth property; its link_pred rows pin the no-hub overhead-free
    * path. */
  def cappedAdjacency(dirE: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // max over an EMPTY aggregate is a single null row — an empty edge
    // set must take the identity branch, not NPE in getLong
    val maxDeg = {
      val r = dirE.groupBy("src").agg(count(lit(1)).as("__deg"))
        .agg(max(col("__deg"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    if (maxDeg <= k) dirE
    else dirE.withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy("dst")))
      .where(col("__rn") <= k).drop("__rn")
  }

  /** Per-vertex triangle participation counts over undirected edges
    * (columns `a`, `b`, already deduplicated, a < b). Returns
    * (vertex, n_tri) — every triangle credits all three corners. */
  def triangleParticipation(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("k"))
      .unionAll(edges.select(col("b").as("k")))
      .groupBy("k").agg(count(lit(1)).as("d"))
    // Orient low → high by (degree, id): a total order on vertices, so
    // each undirected edge gets exactly one direction.
    val oriented = edges
      .join(deg.select(col("k").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("k").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    // Wedges from a shared out-vertex: each triangle produces exactly ONE
    // wedge, at its minimum corner in orientation order. The wedge pair is
    // canonicalized by vertex id (e1.v < e2.v), and the closing edge —
    // which is oriented by (degree, id), not id — is re-canonicalized the
    // same way with least/greatest so the equi-join matches.
    val e = oriented.localCheckpoint(true)
    val wedges = e.alias("e1").join(e.alias("e2"), col("e1.u") === col("e2.u"))
      .filter(col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("ta"), col("e1.v").as("tb"), col("e2.v").as("tc"))
    val closing = e.select(
      least(col("u"), col("v")).as("tb"), greatest(col("u"), col("v")).as("tc"))
    val tri = wedges.join(closing, Seq("tb", "tc"))
    tri.select(col("ta").as("vertex"))
      .unionAll(tri.select(col("tb").as("vertex")))
      .unionAll(tri.select(col("tc").as("vertex")))
      .groupBy("vertex").agg(count(lit(1)).cast(LongType).as("n_tri"))
  }

  /** PageRank over undirected edges (treated as bidirected), in
    * FIXED-POINT integer arithmetic so every iteration is exactly
    * reproducible on any engine and under any shuffle layout: ranks are
    * bigints scaled by 10^12, contributions are floor-divided by degree,
    * damping is (85·Σ) div 100 — no floating-point accumulation
    * anywhere, so sum order can't perturb results (the same reason the
    * exact aggregates go through DECIMAL). Iteration k+1 is one
    * rank⋈edges equi-join plus one dst-grouped bigint sum — the standard
    * distributed PageRank shape (shuffle per iteration on vertex id,
    * degree attached once before the loop). Lineage is truncated every
    * `checkpointEvery` iterations (the [[Components]] discipline); the
    * default of 5 means short demo runs pay zero mid-loop
    * materialization barriers while long runs stay bounded — each
    * un-checkpointed iteration adds one join+agg layer to the plan,
    * which is fine for a handful and fatal for fifty.
    * The vertex count enters as a plan parameter (one count() — a
    * bounded scalar, same class as q43's codebook). */
  /** Deterministic random walks over undirected edges (columns `a`, `b`)
    * — the corpus-generation step of DeepWalk/node2vec (Perozzi KDD'14):
    * each walk emits a node sequence that downstream embedding training
    * consumes as a "sentence". The "random" next-step choice is replaced
    * by a cross-engine-replayable hash draw: from node u at step i, walk w
    * moves to the neighbor v minimizing sha60("w:i:v") — distributionally
    * uniform over neighbors (sha256 avalanche), yet bit-reproducible on
    * any engine and any partitioning, so the walk corpus (like the q104
    * shuffle and q105/q158 sampling) is a deterministic function of the
    * graph. Ties (astronomically unlikely 60-bit collisions) break by
    * smallest v via the (h, v) struct order.
    *
    * Per step the plan is ONE frontier ⋈ edges equi-join (shuffle keyed
    * on the current node) plus ONE walk-keyed min_by aggregate — the
    * frontier never exceeds |walks| rows, the join fan-out is bounded by
    * the frontier nodes' degrees, and nothing depends on a global order:
    * the BFS/PageRank iteration shape, so 10⁹ concurrent walks on a
    * 1000-executor cluster is the same plan with more partitions. Lineage
    * is lazily checkpointed per step ([[Components]] discipline).
    *
    * Returns (walk_id, step, v) rows, step 0 = the seed. A walk halts
    * early only at a sink (impossible here: edges are symmetrized). */
  def deterministicWalks(edges: DataFrame, seeds: DataFrame,
                         steps: Int): DataFrame = {
    val dirE = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var cur = seeds.select(col("walk_id"), col("v"))
    var out = cur.withColumn("step", lit(0))
    // EAGER per-step materialization: the frontier is ≤ |seeds| rows, so
    // checkpointing it costs one tiny job and keeps every step's plan a
    // two-leaf join (checkpointed frontier ⋈ checkpointed edges) — both
    // the lazy-persist variant (each step's subtree re-planned inside
    // the next step's action) and the no-persist variant (a union whose
    // branch i carries an i-deep join chain) spend more wall in the
    // driver's re-optimization of growing plans than in the executors.
    (1 to steps).foreach { i =>
      // the frontier side is ≤ |seeds| rows by construction — broadcast
      // it explicitly so the |E| relation is never shuffle-written for
      // a step join (AQE's broadcast conversion only fires after both
      // sides' shuffles materialize)
      cur = broadcast(cur).join(dirE, col("v") === col("src"))
        .withColumn("h",
          conv(substring(sha2(concat_ws(":",
            col("walk_id").cast(StringType), lit(i),
            col("dst").cast(StringType)), 256), 1, 15), 16, 10)
            .cast(LongType))
        .groupBy("walk_id")
        .agg(min_by(col("dst"), struct(col("h"), col("dst"))).as("v"))
        .localCheckpoint(true)
      out = out.unionAll(cur.withColumn("step", lit(i)))
    }
    out.select(col("walk_id"), col("step"), col("v"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.,
    * Phys. Rev. E 76, 2007) made deterministic: every round each vertex
    * adopts the most frequent label among its neighbors' previous-round
    * labels, ties broken by the SMALLEST label (the async random-order
    * variant is not reproducible; the synchronous min-tiebreak one is).
    * Initial label = vertex id. Per round: one equi-join of the directed
    * edge list against the |V|-row label table, a (dst, lbl) count, and a
    * per-dst argmax via a single max(struct) aggregate — no windows, no
    * SinglePartition. State after every round is one row per vertex, and
    * the join fan-out is |E| per round, the same linear shape as
    * [[pageRankFixedPoint]]; localCheckpoint every other round keeps the
    * unrolled plan from growing exponentially.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val dir = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var labels = dir.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
    (1 to rounds).foreach { i =>
      // one exchange per round, not two: laying the join output on dst
      // satisfies BOTH aggregates' clustering (a subset-keyed layout
      // serves a superset-keyed group-by, and the argmax groups by the
      // layout key itself). The back-to-back groupBy chain would
      // exchange on (dst, lbl) and then again on dst; early LPA rounds
      // have near-distinct labels, so its map-side partial aggregation
      // recovers almost nothing and the fused layout ships fewer rows.
      val cnt = dir.join(labels, col("src") === col("v"))
        .select(col("dst"), col("lbl"))
        .repartition(col("dst"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      // argmax over (count DESC, label ASC) = max of (c, -lbl)
      labels = cnt
        .groupBy(col("dst"))
        .agg(max(struct(col("c").as("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("v"), (-col("m.nl")).as("lbl"))
      if (i % 2 == 0 && i < rounds) labels = labels.localCheckpoint(true)
    }
    labels
  }

  def pageRankFixedPoint(edges: DataFrame, iters: Int,
                         scale: Long = 1000000000000L,
                         checkpointEvery: Int = 5): DataFrame = {
    val dir0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val deg = dir0.groupBy("src").agg(count(lit(1)).as("deg"))
    // materialize the oriented relation ONCE; the per-round join probes
    // it against the |V|-row rank vector, which AQE broadcasts at demo
    // scale and shuffle-joins at cluster scale — either way the |E| side
    // is read from checkpointed blocks, never recomputed
    val dir = dir0.join(deg, "src").localCheckpoint(true)
    // |V| is the only thing the vertex set is needed for: round 1's rank
    // vector is the CONSTANT scale/n, so it folds into the first
    // contribution projection (no |V|-row join, no materialized verts),
    // and every later round's vector comes out of the dst aggregate —
    // which covers the FULL vertex set because the edge list is
    // bidirected (every vertex appears as a dst). The dangling-vertex
    // left join a general directed PageRank needs would be a provably-
    // empty-coalesce here, one whole exchange per round spent on nothing.
    val n = dir.select(countDistinct(col("src"))).head().getLong(0)
    require(n > 0, "empty graph")
    // |V| is already on the driver — use it to pick the rank join's
    // build side EXPLICITLY (the q213 hub-cap pattern: one statistic,
    // two value-identical plans). Under AQE alone, a shuffle join is
    // only converted to broadcast AFTER both children's shuffles
    // materialize, i.e. the |E| relation is shuffle-WRITTEN every
    // round before the planner notices the |V|-row side is tiny; the
    // explicit hint skips that write entirely. Past the threshold
    // (~tens of MB of vertex ids) the shuffle join is the right plan
    // and the hint stays off.
    val bcastRanks = n <= 4000000L
    val teleport = (15L * scale) / (100L * n)
    var ranks: DataFrame = null
    (1 to iters).foreach { i =>
      val contrib =
        if (ranks == null)
          dir.select(col("dst"), expr(s"${scale / n} div deg").as("c"))
        else dir.join(if (bcastRanks) broadcast(ranks) else ranks,
            col("src") === col("v"))
          .select(col("dst"), expr("rank div deg").as("c"))
      ranks = contrib
        .groupBy("dst").agg(sum(col("c")).as("s"))
        .select(col("dst").as("v"),
          (lit(teleport) + expr("(85 * s) div 100")).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
