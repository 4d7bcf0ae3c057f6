package graft

import graft.functions.HilbertIndex
import org.apache.spark.sql.functions._

/** HilbertIndex: golden order-1/2 values, bijectivity, and the
  * adjacency property that justifies it over Z-order. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def indexOf(bits: Int, pts: Seq[(Long, Long)]): Seq[Long] = {
    val df = pts.toDF("x", "y")
    df.select(HilbertIndex(col("x"), col("y"), bits).as("d"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("order-1 curve visits the four cells in U order") {
    // canonical order-1 Hilbert: (0,0)=0, (0,1)=1, (1,1)=2, (1,0)=3
    assert(indexOf(1, Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)))
      === Seq(0L, 1L, 2L, 3L))
  }

  test("order-8 index is a bijection on a 32x32 subgrid") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val ds = indexOf(8, pts)
    assert(ds.distinct.length === pts.length)
    assert(ds.forall(d => d >= 0 && d < (1L << 16)))
  }

  test("consecutive indices are grid-adjacent (the locality property)") {
    // full order-4 curve: 256 cells; walk it by sorting (d, x, y) and
    // check every step moves exactly one unit in exactly one axis —
    // the property Z-order lacks (its quadrant seams jump diagonally)
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertIndex(col("x"), col("y"), 4).as("d"))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 256L))
    rows.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1L,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("eval and codegen agree (interpreted path via filter constant)") {
    // force interpreted eval through a literal fold and compare
    val got = indexOf(3, Seq((5L, 2L)))
    val expected = {
      var x = 5L; var y = 2L; var d = 0L; var s = 4L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    assert(got === Seq(expected))
  }

  // ── N-dimensional (Skilling transpose) curve ───────────────────────

  private def indexOfN(bits: Int, pts: Seq[Seq[Long]]): Seq[Long] = {
    import graft.functions.HilbertIndexN
    val n = pts.head.length
    val df = pts.map {
      case Seq(a, b, c) => (a, b, c, 0L)
      case Seq(a, b, c, d) => (a, b, c, d)
      case other => sys.error(s"unsupported arity ${other.length}")
    }.toDF("a", "b", "c", "e")
    val cols = Seq("a", "b", "c", "e").take(n).map(col)
    df.select(HilbertIndexN(bits, cols: _*).as("d"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("3-D order-3 curve is a bijection with grid-adjacent steps") {
    // 512 cells: bijection onto [0, 512) + every consecutive pair of
    // indexes differs by exactly one unit in exactly one axis — the
    // two properties that CHARACTERIZE a Hilbert curve (and the reason
    // a contiguous index range is a compact 3-D region, i.e. per-file
    // min/max stays narrow in every clustered column)
    val pts = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield Seq(x, y, z)
    val ds = indexOfN(3, pts)
    assert(ds.sorted === (0L until 512L))
    val byIndex = ds.zip(pts).sortBy(_._1).map(_._2)
    byIndex.sliding(2).foreach { case Seq(p1, p2) =>
      val dist = p1.zip(p2).map { case (u, v) => math.abs(u - v) }.sum
      assert(dist === 1L, s"non-adjacent step $p1 -> $p2")
    }
  }

  test("4-D order-2 curve is a bijection with grid-adjacent steps") {
    val pts = for (a <- 0L until 4L; b <- 0L until 4L; c <- 0L until 4L;
                   e <- 0L until 4L) yield Seq(a, b, c, e)
    val ds = indexOfN(2, pts)
    assert(ds.sorted === (0L until 256L))
    val byIndex = ds.zip(pts).sortBy(_._1).map(_._2)
    byIndex.sliding(2).foreach { case Seq(p1, p2) =>
      val dist = p1.zip(p2).map { case (u, v) => math.abs(u - v) }.sum
      assert(dist === 1L, s"non-adjacent step $p1 -> $p2")
    }
  }

  test("N-dim codegen agrees with the interpreted transpose walk") {
    import graft.functions.HilbertIndexN
    val pts = Seq(Seq(5L, 2L, 7L), Seq(0L, 0L, 0L), Seq(7L, 7L, 7L),
      Seq(3L, 6L, 1L))
    val viaExpr = indexOfN(3, pts)
    val viaScala = pts.map(p =>
      graft.functions.HilbertIndexN.testIndex(p.toArray, 3))
    assert(viaExpr === viaScala)
  }
}
