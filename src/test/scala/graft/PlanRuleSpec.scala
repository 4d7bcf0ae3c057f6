package graft

import graft.plans.NanosPredicatePushdown
import org.apache.spark.sql.functions._

/** Optimizer-rule spec: predicates on the nanos-converted ts column reach
  * the parquet scan as pushed filters once NanosPredicatePushdown is
  * active, and results are unchanged for every comparison shape. */
class PlanRuleSpec extends SparkSpec {

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ NanosPredicatePushdown
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("ts range predicate is pushed into the parquet scan") {
    // explainString triggers (lazy) optimization — keep it inside withRule
    val plan = withRule {
      Tables.load(spark, sf0001, "events")
        .filter(col("ts") >= lit("2024-01-10") && col("ts") < lit("2024-01-15"))
        .select("event_id")
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    }
    assert(plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThan(ts,"),
      s"expected raw-long ts pushed filters, got:\n$plan")
  }

  test("all four comparison shapes rewrite without changing results") {
    val e = Tables.load(spark, sf0001, "events")
    val preds = Seq(
      col("ts") >= lit("2024-01-10"), col("ts") > lit("2024-01-10"),
      col("ts") <= lit("2024-01-10"), col("ts") < lit("2024-01-10"),
      lit("2024-01-10").cast("timestamp") <= col("ts"))
    preds.foreach { p =>
      val plain = e.filter(p).count()
      val ruled = withRule(e.filter(p).count())
      assert(ruled === plain, s"result changed under rewrite for $p")
    }
  }

  test("boundary exactness: micros at and around a whole-second literal") {
    import spark.implicits._
    // raw nanos values straddling 2024-01-10T00:00:00 within 1µs
    val base = java.time.Instant.parse("2024-01-10T00:00:00Z")
    val baseNs = base.getEpochSecond * 1000000000L
    val df = Seq(baseNs - 1500, baseNs - 500, baseNs, baseNs + 500, baseNs + 1500)
      .toDF("ts_ns")
      .select(timestamp_micros(expr("ts_ns div 1000")).as("ts"), col("ts_ns"))
    val p = col("ts") >= lit("2024-01-10")
    val plain = df.filter(p).select("ts_ns").collect().map(_.getLong(0)).sorted
    val ruled = withRule(df.filter(p).select("ts_ns").collect().map(_.getLong(0)).sorted)
    assert(ruled === plain)
    // truncation: baseNs-500 lands on the microsecond BEFORE midnight
    assert(plain === Array(baseNs, baseNs + 500, baseNs + 1500))
  }

  private def withEager[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.EagerMinMaxAggregation
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def eagerQuery() = {
    val li = Tables.load(spark, sf0001, "lineitem")
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(min("l_extendedprice").as("min_price"),
        max("l_shipdate").as("max_ship"))
  }

  test("eager min/max aggregation pushes the aggregate below the join") {
    val (plan, ruled) = withEager {
      val q = eagerQuery()
      (q.queryExecution.optimizedPlan.toString,
        q.orderBy("l_orderkey").collect().toSeq)
    }
    // optimized logical plan: Aggregate over Join over Aggregate — the
    // partial grouping sits on the join's left input
    val aggIdx = plan.indexOf("Aggregate")
    val joinIdx = plan.indexOf("Join", aggIdx + 1)
    val partialIdx = plan.indexOf("Aggregate", joinIdx + 1)
    assert(aggIdx >= 0 && joinIdx > aggIdx && partialIdx > joinIdx,
      s"expected Aggregate → Join → Aggregate, got:\n$plan")
    val plain = eagerQuery().orderBy("l_orderkey").collect().toSeq
    assert(ruled === plain, "rewrite changed results")
  }

  test("eager aggregation leaves SUM (multiplicity-sensitive) untouched") {
    val plan = withEager {
      val li = Tables.load(spark, sf0001, "lineitem")
      val ords = Tables.load(spark, sf0001, "orders").select("o_orderkey")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("s"))
        .queryExecution.optimizedPlan.toString
    }
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && !plan.substring(joinIdx).contains("Aggregate"),
      s"SUM must not be pushed below the join:\n$plan")
  }

  test("eager aggregation skips non-equi join conditions") {
    val plan = withEager {
      val li = Tables.load(spark, sf0001, "lineitem")
      val ords = Tables.load(spark, sf0001, "orders")
        .select("o_orderkey", "o_orderdate")
      li.join(ords, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"))
        .groupBy("l_orderkey").agg(min("l_extendedprice").as("m"))
        .queryExecution.optimizedPlan.toString
    }
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && !plan.substring(joinIdx).contains("Aggregate"),
      s"range conjunct must disable the rewrite:\n$plan")
  }
}
