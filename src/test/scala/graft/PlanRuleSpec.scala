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
}
