package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Physical-layout spec: bucketed tables co-locate join keys at write
  * time, so the join plans with ZERO shuffle exchanges — the strategy
  * that makes repeated fact-to-fact joins viable at 100 TB (pay the
  * shuffle once at ingest, never again). Mirrors the reference's BigQuery
  * layout decision (`PARTITION BY date CLUSTER BY symbol`,
  * src/db/bigquery/daily_stock_price.sql:16-17). */
class BucketSpec extends SparkSpec {

  test("bucketed-by-key tables sort-merge join with no shuffle exchange") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free co-located join, got:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
