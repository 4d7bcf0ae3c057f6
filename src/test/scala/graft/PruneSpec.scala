package graft

import org.apache.spark.sql.functions._

/** Physical partition-pruning spec: a date-partitioned layout turns date
  * predicates into directory pruning — the scan never lists, let alone
  * reads, out-of-range partitions. This is the 100 TB answer to the
  * events table's non-pushable converted-timestamp predicate (see
  * Tables.load): partition by event_date at ingest and the same query
  * prunes physically. Mirrors the reference's `PARTITION BY date`
  * BigQuery layout (src/db/bigquery/daily_stock_price.sql:16). */
class PruneSpec extends SparkSpec {

  test("date-partitioned write + date filter prunes partitions at the scan") {
    val tmp = TempWork.fresh("part_spec")
    Tables.load(spark, sf0001, "events")
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(tmp)

    val filtered = spark.read.parquet(tmp)
      .filter(col("event_date") === lit("2024-01-05"))
    // the scan carries the predicate as a partition filter...
    val planText = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(planText.contains("PartitionFilters: [isnotnull(event_date"),
      s"expected partition filters at the scan, got:\n$planText")
    // ...and physically touches only the matching day's directory
    val files = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_date=2024-01-05")))

    val q = filtered.groupBy("event_type").count()
    // and the result matches the unpartitioned computation
    val expected = Tables.load(spark, sf0001, "events")
      .filter(to_date(col("ts")) === lit("2024-01-05"))
      .groupBy("event_type").count()
      .orderBy("event_type").collect()
    assert(q.orderBy("event_type").collect() === expected)
  }

  test("q87 join against a filtered dim prunes fact partitions dynamically") {
    // the scan's PartitionFilters render through maxMetadataStringLength
    // (default 100 chars): late in a long-lived session the 5-digit
    // expression ids push "dynamicpruningexpression#NNNNN" past the cap
    // and the assertion would miss a filter that IS in the plan — raise
    // the render cap for the check, restore after
    val key = "spark.sql.maxMetadataStringLength"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "1000")
    try {
      val df = SparkEntry.queries("q87_dpp_join")(spark, sf0001)
      val planText = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      // the dim-side isin predicate reaches the fact scan twice: once as a
      // static inferred partition filter, once as a runtime DPP subquery
      assert(planText.contains("dynamicpruningexpression"),
        s"expected dynamic partition pruning at the fact scan, got:\n$planText")
      assert(df.count() === 3) // click / purchase / signup groups survive
    } finally spark.conf.set(key, prev)
  }
}
