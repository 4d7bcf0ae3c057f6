package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution demonstrations: the runtime re-planning the
  * engine leans on at scale, pinned as executed-plan assertions. Static
  * stats can't see through filters; AQE re-plans from ACTUAL shuffle
  * sizes — the difference between planning for 100 TB and planning for
  * what survived the predicate. */
class AqeSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE converts a static sort-merge join to broadcast at runtime") {
    // static planner: broadcast disabled (threshold −1), so the join
    // plans as SMJ; at runtime the filtered dim's ACTUAL shuffle bytes
    // fall under the adaptive threshold and AQE rewrites to broadcast
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val lineitem = Tables.load(spark, sf0001, "lineitem")
      val urgent = Tables.load(spark, sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val j = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy().count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(2000))
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE should have upgraded the SMJ to broadcast:\n${plan.take(4000)}")
    }
  }

  test("AQE coalesces post-shuffle partitions for a small aggregate") {
    withConf("spark.sql.shuffle.partitions" -> "32") {
      val agg = Tables.load(spark, sf0001, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(2000))
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"32 shuffle partitions of a 5-row aggregate should coalesce:\n${plan.take(4000)}")
    }
  }
}
