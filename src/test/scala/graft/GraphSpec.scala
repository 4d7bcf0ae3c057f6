package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Triangle counting: golden graphs where the answer is countable by
  * hand, plus the edge-builder's dedup semantics. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("K4 gives every vertex 3 triangles") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b").repartition(3)
    val got = Graph.triangleParticipation(edges)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("square with one diagonal: two triangles sharing the diagonal") {
    // 1-2-3-4-1 plus diagonal 1-3 → triangles (1,2,3) and (1,3,4)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val got = Graph.triangleParticipation(edges)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("triangle-free graph returns no rows") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangleParticipation(edges).count() === 0)
  }

  test("coOccurrenceEdges dedups across groups and orders endpoints") {
    val pairs = Seq((10L, 2L), (10L, 1L), (10L, 1L), // dup member in group
      (20L, 1L), (20L, 2L), // same edge from another group
      (30L, 5L)) // singleton group: no edge
      .toDF("g", "m")
    val got = Graph.coOccurrenceEdges(pairs, "g", "m")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("labelPropagation: disjoint triangles converge to min vertex id") {
    // Round 1 per triangle {a,b,c}: each vertex sees two distinct labels
    // → min tie-break; round 2 floods the minimum. Two rounds suffice.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, rounds = 3)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L)))
  }

  test("labelPropagation path oscillation is deterministic") {
    // Path 1-2-3 under SYNCHRONOUS updates oscillates (bipartite), and
    // the min tie-break pins the exact state after each round:
    // r1: (2,1,2)  r2: (1,2,1)  r3: (2,1,2)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, rounds = 3)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("deterministicWalks follows the sha-60 argmin at every step") {
    // Star + path: 1-{2,3,4}, 2-3. Replaying the hash draw by hand from
    // graft.functions.Sha60 must give the exact walk the operator emits.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("a", "b")
    val adj = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L), 4L -> Seq(1L))
    val seeds = Seq((1L, 1L), (4L, 4L)).toDF("walk_id", "v")
    val got = Graph.deterministicWalks(edges, seeds, steps = 3)
      .orderBy("walk_id", "step").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = Seq(1L, 4L).flatMap { w =>
      var cur = w
      (0 to 3).map { i =>
        if (i > 0)
          cur = adj(cur).minBy(v =>
            (graft.functions.Sha60.hash(s"$w:$i:$v"), v))
        (w, i, cur)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  // ── subcritical local solve ≡ distributed loop ─────────────────────
  // The adaptive threshold (Graph.LocalSolveMaxEdges) picks between two
  // plans that must be VALUE-IDENTICAL: localMaxEdges = 0 forces the
  // per-round distributed path, the default takes the one-task local
  // path on these fixtures. Same fixture, both paths, row-for-row.

  private def denseFixture = {
    // 60 vertices, ~8 groups of co-occurring members with cross links:
    // enough structure that ranks/labels/walks are all non-trivial
    val raw = (0L until 180L).map { i =>
      val a = i % 60; val b = (a + 1 + (i * i) % 13) % 60
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    raw.toDF("a", "b")
  }

  test("pageRank local solve equals distributed loop (Long vertices)") {
    val e = denseFixture
    val local = Graph.pageRankFixedPoint(e, iters = 3)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dist = Graph.pageRankFixedPoint(e, iters = 3, localMaxEdges = 0L)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(local.toSeq === dist.toSeq)
    assert(local.nonEmpty)
  }

  test("pageRank local solve equals distributed loop (String vertices)") {
    // q262's shape: token vertices — string keys through both paths
    val e = denseFixture.select(
      concat(lit("tok"), col("a")).as("a"),
      concat(lit("tok"), col("b")).as("b"))
    val local = Graph.pageRankFixedPoint(e, iters = 3)
      .orderBy("v").collect().map(r => (r.getString(0), r.getLong(1)))
    val dist = Graph.pageRankFixedPoint(e, iters = 3, localMaxEdges = 0L)
      .orderBy("v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(local.toSeq === dist.toSeq)
  }

  test("labelPropagation local solve equals distributed loop") {
    val e = denseFixture
    val local = Graph.labelPropagation(e, rounds = 3)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dist = Graph.labelPropagation(e, rounds = 3, localMaxEdges = 0L)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(local.toSeq === dist.toSeq)
  }

  test("deterministicWalks local solve equals distributed loop") {
    val e = denseFixture
    val seeds = e.select(col("a").as("v")).distinct()
      .filter(col("v") < 10).select(col("v").as("walk_id"), col("v"))
    val local = Graph.deterministicWalks(e, seeds, steps = 4)
      .orderBy("walk_id", "step").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val dist = Graph.deterministicWalks(e, seeds, steps = 4,
        localMaxEdges = 0L)
      .orderBy("walk_id", "step").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(local.toSeq === dist.toSeq)
    assert(local.length === 50) // 10 walks × (1 seed + 4 steps)
  }

  test("boundedSssp: hand-checkable weighted distances, hop-bounded") {
    // 1 --(1)-- 2 --(1)-- 3 --(1)-- 4 ; shortcut 1 --(5)-- 4.
    // From seed 1 with 2 rounds: dist(4) = min(5, unreachable-in-2-via-
    // chain) = 5; with 3 rounds the chain wins: 3.
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 5L))
      .toDF("a", "b", "w")
    val seeds = Seq(Tuple1(1L)).toDF("v")
    def run(r: Int) = Graph.boundedSssp(edges, seeds, r)
      .orderBy("v").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(run(2) === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 5L)))
    assert(run(3) === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("boundedSssp local solve equals distributed loop") {
    val e = denseFixture.withColumn("w",
      (col("a") + col("b")) % 7 + lit(1L))
    val seeds = e.select(col("a").as("v")).distinct().filter(col("v") < 5)
    val local = Graph.boundedSssp(e, seeds, rounds = 3)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dist = Graph.boundedSssp(e, seeds, rounds = 3, localMaxEdges = 0L)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(local.toSeq === dist.toSeq)
    assert(local.nonEmpty)
  }

  test("coOccurrenceEdgesWithMass bound folds into boundedSssp's pick") {
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 2L), (20L, 3L), (30L, 9L)).toDF("g", "m")
    val (edges0, mass) = Graph.coOccurrenceEdgesWithMass(pairs, "g", "m")
    // mass = C(3,2) + C(2,2 choose) = 3 + 1 pre-dedup pairs; the deduped
    // edge set is {12,13,23} — the bound is an upper bound, never below
    assert(mass === 4L)
    assert(edges0.count() === 3L)
    val e = edges0.withColumn("w", lit(1L))
    val seeds = Seq(Tuple1(1L)).toDF("v")
    val viaBound = Graph.boundedSssp(e, seeds, rounds = 2,
        edgeMassBound = Some(mass))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCount = Graph.boundedSssp(e, seeds, rounds = 2)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaBound.toSeq === viaCount.toSeq)
    assert(viaBound.toSeq ===
      Seq((1L, 0L), (2L, 1L), (3L, 1L))) // hand-checked distances
    // a bound ABOVE the local threshold falls back to counting (and the
    // distributed loop still agrees)
    val viaDist = Graph.boundedSssp(e, seeds, rounds = 2,
        localMaxEdges = 0L, edgeMassBound = Some(mass))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaDist.toSeq === viaBound.toSeq)
  }

  test("deterministicWalks is partitioning-invariant") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val seeds = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("walk_id", "v")
    val once = Graph.deterministicWalks(edges, seeds, 4)
      .orderBy("walk_id", "step").collect().toSeq
    val again = Graph.deterministicWalks(
        edges.repartition(7), seeds.repartition(3), 4)
      .orderBy("walk_id", "step").collect().toSeq
    assert(once === again)
  }
}
