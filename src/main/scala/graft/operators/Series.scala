package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Dense-grid time-series primitives: gap detection + linear
  * interpolation, and integer-exact autocorrelation. Reference surface:
  * pse-stocks-etl's daily-price sync treats a missing trading day as a
  * gap to carry forward (src/pse_stocks_etl/sync.py price backfill);
  * these generalize that to an hourly grid with true linear
  * interpolation and a lag-k self-correlation diagnostic.
  *
  * Scale notes: the grid is |types| × |hours| — tiny relative to the
  * event table (it grows with the time span, not the data volume), so
  * the left join of grid←counts is the only shuffle and it carries one
  * row per (type, hour). The interpolation windows are per-type ordered
  * scans over that same small grid: at 100 TB of events the hourly
  * series for a year is still only 8.8k rows per type. All interpolated
  * values are built from exact BIGINT anchor counts and epoch-hour
  * distances with a single double divide+multiply+add, so results replay
  * bit-for-bit on any IEEE-754 engine (no order-dependent double sums).
  */
object Series {

  /** Dense (event_type, hour) grid over the events table's full span,
    * with the hour's event count `c` (NULL on empty hours) and the exact
    * epoch-hour index `eh` for distance arithmetic. */
  def hourlySeries(events: DataFrame): DataFrame = {
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val types = events.select(col("event_type")).distinct()
    val grid = types.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    val counts = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .withColumn("eh", expr("unix_timestamp(h) DIV 3600"))
  }

  /** Gap rows (hours with no events) with their nearest known anchors on
    * both sides and the linearly interpolated count. Leading/trailing
    * gaps clamp to the single available anchor. */
  def interpolateGaps(series: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(0, Window.unboundedFollowing)
    val anchorEh = when(col("c").isNotNull, col("eh"))
    series
      .withColumn("pv", last(col("c"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(anchorEh, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("c"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(anchorEh, ignoreNulls = true).over(wNext))
      .where(col("c").isNull)
      .select(col("event_type"), col("h"), col("pv"), col("nv"),
        col("ph"), col("nh"),
        when(col("pv").isNull, col("nv").cast(DoubleType))
          .when(col("nv").isNull, col("pv").cast(DoubleType))
          .otherwise(col("pv").cast(DoubleType) +
            (col("nv") - col("pv")).cast(DoubleType) *
              ((col("eh") - col("ph")).cast(DoubleType) /
                (col("nh") - col("ph")).cast(DoubleType))).as("filled"))
  }

  /** Lag-1..maxLag autocorrelation of the zero-filled hourly count
    * series, one row per (event_type, lag_h). Pearson r from exact
    * BIGINT raw-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) assembled in one
    * equi-join + one aggregate; the double formula over the exact sums
    * is fixed-shape, so it replays identically on any engine (built-in
    * corr() accumulates doubles in shuffle order — not reproducible). */
  def autocorrelation(spark: SparkSession, series: DataFrame,
                      maxLag: Int): DataFrame = {
    val s2 = series.select(col("event_type"), col("eh"),
      coalesce(col("c"), lit(0L)).as("c"))
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag_h"))
    val b = s2.select(col("event_type").as("et2"), col("eh").as("beh"),
      col("c").as("y"))
    val m = s2.crossJoin(broadcast(lags))
      .join(b, col("et2") === col("event_type") &&
        col("beh") === col("eh") - col("lag_h"))
      .groupBy("event_type", "lag_h")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(col("y")).as("sy"), sum(col("c") * col("y")).as("sxy"),
        sum(col("c") * col("c")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast(DoubleType)
    val (sx, sy) = (col("sx").cast(DoubleType), col("sy").cast(DoubleType))
    val (sxx, syy, sxy) = (col("sxx").cast(DoubleType),
      col("syy").cast(DoubleType), col("sxy").cast(DoubleType))
    m.select(col("event_type"), col("lag_h"), col("n"),
      ((nD * sxy - sx * sy) /
        (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy))).as("acf"))
      .orderBy("event_type", "lag_h")
  }
}
