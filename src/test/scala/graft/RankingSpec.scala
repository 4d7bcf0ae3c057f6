package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase global ranking must be value-identical to the single-window
  * form (row_number / ntile / percent_rank / cume_dist over a global
  * ORDER BY) — the window form is the spec; Ranking is the scale-safe
  * plan for it. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def check(n: Int, buckets: Int): Unit = {
    // deterministic pseudo-random totals with ties in `v` (the tie-break
    // on id is what makes the order total, which Ranking requires)
    val df = spark.range(n.toLong).toDF("id")
      .withColumn("v", pmod(col("id") * 2654435761L, lit(97L)))
      .repartition(4)
    val w = Window.orderBy(col("v").desc, col("id"))
    val expected = df.select(col("id"),
      row_number().over(w).cast("long").as("rk"),
      ntile(buckets).over(w).as("tile"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
    val actual = Ranking.withGlobalRank(df, "rk", "N", col("v").desc, col("id").asc)
      .select(col("id"), col("rk"),
        Ranking.ntileOf(buckets, col("rk"), col("N")).as("tile"),
        Ranking.percentRankOf(col("rk"), col("N")).as("pr"),
        Ranking.cumeDistOf(col("rk"), col("N")).as("cd"))
    assert(rowsOf(actual.orderBy("id")) === rowsOf(expected.orderBy("id")),
      s"n=$n buckets=$buckets")
  }

  test("matches the global-window form on a mid-size set") { check(1000, 4) }
  test("matches when rows spread unevenly over tiles") { check(1003, 7) }
  test("matches when N < buckets (each row its own tile)") { check(3, 4) }
  test("matches on a single row (percent_rank 0.0)") { check(1, 4) }

  test("empty input yields empty output") {
    val df = spark.range(0).toDF("id")
    assert(Ranking.withGlobalRank(df, "rk", "N", col("id").asc).count() === 0)
  }

  test("withPrefixSum matches the global-window running sum") {
    val df = spark.range(500L).toDF("id")
      .withColumn("w", pmod(col("id") * 2654435761L, lit(50L)) + 1L)
      .repartition(4)
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.select(col("id"), sum(col("w")).over(w).as("cum"))
    val actual = Ranking.withPrefixSum(df, "cum", "T", col("w"), col("id").asc)
    assert(rowsOf(actual.select("id", "cum").orderBy("id"))
      === rowsOf(expected.orderBy("id")))
    // the grand total is stamped on every row
    val t = actual.select("T").distinct().collect()
    assert(t.length === 1)
    assert(t.head.getLong(0) ===
      expected.agg(max(col("cum"))).head().getLong(0))
  }

  test("withPrefixSum plans without a single-partition exchange") {
    val df = spark.range(200L).toDF("id").withColumn("w", lit(3L))
      .repartition(4)
    val plan = Ranking.withPrefixSum(df, "cum", "T", col("w"), col("id").asc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix sum must not funnel through one task:\n$plan")
  }

  test("q155 two-pass quantiles equal the brute-force rank definition") {
    val events = Tables.load(spark, sf0001, "events")
    val got = graft.operators.Quantiles.twoPassExact(
        events, "event_type", "value", "event_id",
        ps = Seq(0.5, 0.9), binWidth = 50.0)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // brute force: full sort per group, pick rank ⌈p·n⌉
    val byType = events.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.length === byType.size)
    got.foreach { case (t, n, p50, p90) =>
      val sorted = byType(t).sortBy(r => (r._2, r._3))
      assert(n === sorted.length.toLong)
      def q(p: Double) = sorted(
        (math.ceil(p * sorted.length).toLong.max(1L) - 1).toInt)._2
      assert(p50 === q(0.5), s"$t p50")
      assert(p90 === q(0.9), s"$t p90")
    }
  }
}
