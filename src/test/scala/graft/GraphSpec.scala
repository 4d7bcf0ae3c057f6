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
}
