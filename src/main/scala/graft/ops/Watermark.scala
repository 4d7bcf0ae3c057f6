package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** A1 + P10 — incremental-sync watermark state.
  *
  * The reference keeps sync state *in the destination table itself*: the
  * watermark is `SELECT symbol, max(date) AS latest_date GROUP BY symbol`
  * (reference: src/etl/postgres_sync.py:106-110, bigquery_sync.py:111-115,
  * deltalake_sync.py:128, spark_deltalake_sync.py:209-216), and each sync
  * round derives a per-key target window
  * (postgres_sync.py:200-202):
  *   target_start = latest_date + (1 - lookback_days)
  *   target_end   = (utcnow + 8h).date - freshness_days   (Manila cutoff)
  * with epoch 1970-01-01 as the default for never-synced keys
  * (postgres_sync.py:200).
  *
  * Scale note: the watermark is a partial+final hash aggregate over the
  * fact table — map-side combine reduces it to |keys| rows before the
  * shuffle. The per-key window derivation joins it against the (small)
  * dimension key list: broadcast join, no extra shuffle.
  */
object Watermark {

  val Epoch = "1970-01-01"

  /** A1: latest date per key. */
  def latestDates(df: DataFrame, key: String, dateCol: String): DataFrame =
    df.groupBy(col(key)).agg(max(to_date(col(dateCol))).as("latest_date"))

  /** P10: per-key sync windows for every key in `allKeys` (the dimension),
    * epoch-defaulted for keys with no watermark yet. `asOf` is the
    * "today" instant — a literal in oracle-compared queries (SURVEY §7.4),
    * `current_timestamp() + INTERVAL 8 HOURS` in production pipelines. */
  def syncWindows(latest: DataFrame, allKeys: DataFrame, key: String,
                  lookbackDays: Int, freshnessDays: Int, asOf: Column): DataFrame =
    allKeys
      .join(broadcast(latest), Seq(key), "left")
      .withColumn("latest_date", coalesce(col("latest_date"), to_date(lit(Epoch))))
      .withColumn("target_start", date_add(col("latest_date"), 1 - lookbackDays))
      .withColumn("target_end", date_sub(to_date(asOf), freshnessDays))
      .withColumn("skip", col("target_start") > col("target_end"))

  /** The Manila freshness cutoff as used in production paths
    * (postgres_sync.py:202): (utcnow + 8h).date. Not used in
    * oracle-compared queries (non-deterministic). */
  def manilaToday(): Column = to_date(current_timestamp() + expr("INTERVAL 8 HOURS"))
}
