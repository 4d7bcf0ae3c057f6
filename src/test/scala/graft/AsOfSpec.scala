package graft

import graft.operators.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native as-of join (plans.AsOfJoinPlan/Exec): semantics pinned against
  * the relational union+window formulation, plus the edges the merge pass
  * must get right (no match, ties, tolerance, key-group transitions). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 11:00:00"), 2.0),
    ("A", ts("2024-01-01 11:00:00"), 2.5), // tie on ts: last in sort order wins
    ("B", ts("2024-01-01 09:00:00"), 7.0)
  ).toDF("q_sym", "q_ts", "px")

  private def trades = Seq(
    ("A", ts("2024-01-01 10:30:00"), 100L), // matches 10:00 quote
    ("A", ts("2024-01-01 11:00:00"), 101L), // equal ts: inclusive, tie→2.5
    ("A", ts("2024-01-01 09:00:00"), 102L), // before any quote → null
    ("B", ts("2024-01-01 18:00:00"), 103L), // far later → tolerance-sensitive
    ("C", ts("2024-01-01 12:00:00"), 104L)  // key with no quotes → null
  ).toDF("sym", "t_ts", "trade_id")

  test("backward as-of join matches the latest quote at or before each trade") {
    val got = AsOf.asofBackward(trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_ts", "q_ts")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got === Map(100L -> 1.0, 101L -> 2.5, 102L -> null,
      103L -> 7.0, 104L -> null))
  }

  test("tolerance bounds how stale a match may be") {
    val got = AsOf.asofBackward(trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_ts", "q_ts",
        toleranceUs = Some(3600L * 1000000L)) // 1 hour
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    // trade 103 is 9h after B's only quote → out of tolerance now
    assert(got === Map(100L -> 1.0, 101L -> 2.5, 102L -> null,
      103L -> null, 104L -> null))
  }

  test("agrees with the union+window formulation on the events fixture") {
    val e = Tables.load(spark, sf0001, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val native = AsOf.asofBackward(purchases, clicks,
        Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      .select(col("event_id"), col("c_ts").as("prev_click_ts"))

    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = e
      .withColumn("prev_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "prev_click_ts")
    // inclusive frame == inclusive as-of here: the fixture has no
    // click/purchase pairs sharing (user_id, ts) — asserted below
    val collisions = e.filter(col("event_type") === "purchase").as("b")
      .join(e.filter(col("event_type") === "click").as("c"),
        col("b.user_id") === col("c.user_id") && col("b.ts") === col("c.ts"))
      .count()
    assert(collisions === 0)
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
  }

  test("NULL keys and NULL timestamps never match (SQL comparison semantics)") {
    // right side: a NULL ts (must not read as epoch-0 "very old" match) and
    // a NULL key (must not match a NULL left key)
    val q = Seq(
      (Option("A"), Option(ts("2024-01-01 10:00:00")), 1.0),
      (Option("A"), Option.empty[java.sql.Timestamp], 99.0),
      (Option.empty[String], Option(ts("2024-01-01 08:00:00")), 98.0)
    ).toDF("q_sym", "q_ts", "px")
    val t = Seq(
      (Option("A"), Option(ts("2024-01-01 09:00:00")), 200L), // only NULL-ts quote precedes → no match
      (Option("A"), Option(ts("2024-01-01 11:00:00")), 201L), // real 10:00 quote wins; NULL-ts ignored
      (Option.empty[String], Option(ts("2024-01-01 12:00:00")), 202L), // NULL key → no match even vs NULL-key quote
      (Option("A"), Option.empty[java.sql.Timestamp], 203L)   // NULL left ts → no match
    ).toDF("sym", "t_ts", "trade_id")
    val got = AsOf.asofBackward(t, q, Seq("sym"), Seq("q_sym"), "t_ts", "q_ts")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got === Map(200L -> null, 201L -> 1.0, 202L -> null, 203L -> null))
  }

  test("physical plan: two shuffles, two sorts, one AsOfJoinExec merge") {
    val plan = AsOf.asofBackward(trades, quotes,
        Seq("sym"), Seq("q_sym"), "t_ts", "q_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2,
      s"expected exactly the two co-partitioning shuffles:\n$plan")
    assert(!plan.contains("Union"), s"no union materialization expected:\n$plan")
  }

  test("self-join without aliasing is rejected loudly") {
    val e = Tables.load(spark, sf0001, "events")
    val ex = intercept[IllegalArgumentException] {
      AsOf.asofBackward(e, e, Seq("user_id"), Seq("user_id"), "ts", "ts")
    }
    assert(ex.getMessage.contains("alias"))
  }
}
