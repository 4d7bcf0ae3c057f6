package graft

import graft.operators.Series
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Dense-grid series ops: golden gap-fill values computable by hand and
  * ACF against the same raw-moment formula evaluated in plain Scala. */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:30:00")

  test("hourlySeries densifies the span and leaves gaps NULL") {
    // type a: events in hours 0, 0, 3; type b: hour 1 only
    val ev = Seq(("a", ts(0)), ("a", ts(0)), ("a", ts(3)), ("b", ts(1)))
      .toDF("event_type", "ts")
    val got = Series.hourlySeries(ev)
      .orderBy("event_type", "h")
      .collect()
      .map(r => (r.getString(0), r.getLong(3),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // span = hours 0..3 for BOTH types (global bounds), eh relative
    val ehs = got.map(_._2)
    assert(ehs.distinct.length === 4 && got.length === 8)
    assert(got.filter(_._1 == "a").map(_._3).toSeq === Seq(2L, -1L, -1L, 1L))
    assert(got.filter(_._1 == "b").map(_._3).toSeq === Seq(-1L, 1L, -1L, -1L))
  }

  test("interpolateGaps: interior linear fill, leading/trailing clamp") {
    // hand-built series: c = [2, _, _, 8, _] at eh = 0..4
    val ser = Seq(
      ("a", ts(0), Some(2L), 0L), ("a", ts(1), None, 1L),
      ("a", ts(2), None, 2L), ("a", ts(3), Some(8L), 3L),
      ("a", ts(4), None, 4L))
      .toDF("event_type", "h", "c", "eh")
    val got = Series.interpolateGaps(ser).orderBy("h").collect()
      .map(r => (r.getLong(2), r.getDouble(6)))
    // eh1: 2 + 6·(1/3) = 4, eh2: 2 + 6·(2/3) = 6, eh4: clamp to pv=8
    assert(got.map(_._1).toSeq === Seq(2L, 2L, 8L)) // pv anchors
    assert(got.map(_._2).toSeq === Seq(4.0, 6.0, 8.0))
  }

  test("autocorrelation matches the raw-moment formula exactly") {
    // 8 hours alternating 1,3 → strong negative lag-1, positive lag-2
    val ev = (0 until 8).flatMap { h =>
      Seq.fill(if (h % 2 == 0) 1 else 3)(("a", ts(h)))
    }.toDF("event_type", "ts")
    val got = Series.autocorrelation(spark, Series.hourlySeries(ev), 2)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val xs = (0 until 8).map(h => if (h % 2 == 0) 1L else 3L)
    def ref(lag: Int): (Long, Double) = {
      val pairs = (lag until 8).map(t => (xs(t), xs(t - lag)))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      (n, (n.toDouble * sxy - sx.toDouble * sy) /
        (math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
          math.sqrt(n.toDouble * syy - sy.toDouble * sy)))
    }
    for (lag <- 1 to 2) {
      val (n, a) = ref(lag)
      assert(got(lag.toLong) === ((n, a)), s"lag $lag")
    }
    assert(got(1L)._2 < -0.9 && got(2L)._2 > 0.9)
  }
}
