package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Physical-layout spec: bucketed tables co-locate join keys at write
  * time, so the join plans with ZERO shuffle exchanges — the strategy
  * that makes repeated fact-to-fact joins viable at 100 TB (pay the
  * shuffle once at ingest, never again). Mirrors the reference's BigQuery
  * layout decision (`PARTITION BY date CLUSTER BY symbol`,
  * src/db/bigquery/daily_stock_price.sql:16-17).
  *
  * Plan assertions read explainString: under AQE the physical tree is
  * wrapped in AdaptiveSparkPlanExec, whose inner plan is NOT reachable
  * via SparkPlan.collect (it has no children until execution) — a typed
  * collect would vacuously find nothing. */
class BucketSpec extends SparkSpec {

  /** Lines of the plan at/under the first SortMergeJoin node (the join's
    * subtree is everything printed after it in SimpleMode). */
  private def joinSubtree(planText: String): Seq[String] = {
    val lines = planText.linesIterator.toSeq
    val at = lines.indexWhere(_.contains("SortMergeJoin"))
    assert(at >= 0, s"expected a sort-merge join, got:\n$planText")
    lines.drop(at)
  }

  test("bucketed-by-key tables sort-merge join with no shuffle exchange") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    val tmp = TempWork.fresh("bktspec")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/li")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/o")
      .mode("overwrite").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val planText = joined.queryExecution.explainString(SimpleMode)
      val subtree = joinSubtree(planText)
      assert(!subtree.exists(_.contains("Exchange")),
        s"expected a shuffle-free co-located join, got:\n$planText")
      assert(planText.contains("Bucketed: true"))
      // and it still computes the right thing
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("q86 sort-merge joins the bucketed tables with no join-side shuffle") {
    val df = SparkEntry.queries("q86_bucketed_join")(spark, sf0001)
    val planText = df.queryExecution.explainString(SimpleMode)
    // no Exchange anywhere at/under the join: both inputs are pre-bucketed
    // (the exchanges above it — agg + orderBy — are expected)
    val subtree = joinSubtree(planText)
    assert(!subtree.exists(_.contains("Exchange")),
      s"expected the bucketed join inputs to be shuffle-free, got:\n$planText")
    assert(subtree.count(_.contains("Bucketed: true")) === 2)
    assert(df.count() === 5) // one row per order priority
  }
}
