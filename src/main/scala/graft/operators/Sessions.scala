package graft.operators

import graft.ops.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream (north-star training-pipeline
  * operator; the reference's closest analog is its daily micro-batch
  * grouping, §2.9): group each user's events into sessions separated by
  * inactivity gaps > `gapUs` microseconds.
  *
  * Two forms with identical session semantics (an event starting exactly
  * at `prev + gap` still MERGES — Spark's `session_window` treats the
  * window end inclusively, verified empirically on 4.1.2, so the
  * gaps-and-islands predicate splits only on `>`):
  *
  *   - [[sessionize]]: the classic gaps-and-islands plan — `lag` marks
  *     session starts, a running `sum` numbers them, one `groupBy`
  *     aggregates. Costs one shuffle on the user key; both window passes
  *     and the final aggregation reuse that single partitioning (Catalyst
  *     collapses them into one sort + one exchange), so at 100 TB this is
  *     a single repartition of the events table however long the history.
  *   - [[sessionWindows]]: the built-in `session_window` aggregate —
  *     Spark's native dynamic-gap session operator (also the streaming
  *     form; here run in batch). Same single shuffle on the user key.
  *
  * Timestamps are compared in microseconds (`unix_micros`) — the fixtures'
  * nanos timestamps truncate identically in Spark (`Tables.load` divides
  * nanos by 1000) and DuckDB (`epoch_us` floors TIMESTAMP_NS), so the gap
  * predicate is cross-engine exact.
  */
object Sessions {

  /** Gaps-and-islands sessionization: per (user, session) aggregates.
    * Output: user, session_id (1-based per user, in time order),
    * session_start_us, session_end_us, n_events, total_value. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, valueCol: String, gapUs: Long): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col("__us"), col(tieCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(running))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        Exact.moneySum(col(valueCol)).as("total_value"))
  }

  /** Built-in `session_window` form. The window's end is
    * `last event + gap` by definition, so `session_end_us` here equals
    * [[sessionize]]'s `session_end_us + gapUs` — reported as-is to surface
    * the operator's native semantics. */
  def sessionWindows(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, gap: String): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        Exact.moneySum(col(valueCol)).as("total_value"))
      .select(col(userCol),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("total_value"))
}
