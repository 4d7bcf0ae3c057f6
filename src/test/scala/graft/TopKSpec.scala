package graft

import graft.functions.TopKByScore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-state top-k aggregate must be value-identical to the
  * window form (row_number over score DESC, id ASC ≤ k) — the window is
  * the spec; TopKByScore is the scale-safe plan for it. */
class TopKSpec extends SparkSpec {

  private def check(n: Int, groups: Int, k: Int): Unit = {
    // deterministic values with duplicate scores (ties exercise the
    // id-ascending break) spread over `groups` keys and 8 partitions
    val df = spark.range(n.toLong).toDF("id")
      .withColumn("g", pmod(col("id"), lit(groups.toLong)))
      .withColumn("score",
        pmod(col("id") * 2654435761L, lit(97L)).cast("double"))
      .repartition(8)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val expected = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("g"), col("rn").cast("long").as("rk"),
        col("score"), col("id"))
    val actual = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rk"),
        col("col.score").as("score"), col("col.id").as("id"))
    assert(rowsOf(actual.orderBy("g", "rk")) ===
      rowsOf(expected.orderBy("g", "rk")), s"n=$n groups=$groups k=$k")
  }

  test("matches the window form with ties across partitions") { check(2000, 7, 5) }
  test("matches when groups are smaller than k") { check(40, 25, 5) }
  test("matches with k = 1 (argmax)") { check(500, 3, 1) }

  test("nulls in score or id are skipped like the window form skips nothing") {
    // the aggregate ignores null inputs; feed none to keep parity simple
    val df = spark.createDataFrame(Seq(
      (1L, Some(2.0), Some(10L)), (1L, None, Some(11L)),
      (1L, Some(3.0), None), (1L, Some(1.0), Some(12L))))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top"))).select("col.score", "col.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got === Seq((2.0, 10L), (1.0, 12L)))
  }
}
