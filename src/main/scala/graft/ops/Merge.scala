package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O10–O13 — merge/upsert, the reference's core mutation operator, which it
  * implements four independent times (SURVEY.md §2.7). Re-expressed here as
  * pure join rewrites over immutable DataFrames (the merge *semantics* are
  * the capability under test, not the Delta transaction log).
  *
  * Two semantics exist in the reference:
  *   - last-writer-wins upsert: Delta MERGE whenMatchedUpdateAll /
  *     whenNotMatchedInsertAll (spark_deltalake_sync.py:296-300,
  *     deltalake_sync.py:239-248) and Postgres ON CONFLICT DO UPDATE
  *     (postgres_sync.py:56-69);
  *   - recency-guarded merge: BigQuery's 3-step staged merge keeps an
  *     update only if `source.extracted_at >= target.extracted_at OR
  *     target.extracted_at IS NULL`
  *     (src/etl/sql/bigquery_dml__upsert_daily_stock_price.sql:10-20).
  * The recency-guarded form is canonical here (SURVEY §7.4.1).
  *
  * Scale notes: both forms are a single shuffle on the merge key (the
  * anti join and the union reuse the updates' exchange under AQE). The
  * updates side of an incremental sync is typically ≪ target — Catalyst
  * broadcasts it when under the threshold, turning the merge into a
  * shuffle-free scan of the target. Against a 100 TB partitioned target,
  * pair this with partition pruning: only target partitions intersecting
  * the updates' date range need rewriting (the reference's BigQuery table
  * is `PARTITION BY date CLUSTER BY symbol` for exactly this reason).
  */
object Merge {

  /** O10/O12/O13 — unconditional last-writer-wins upsert: every target row
    * whose key appears in `updates` is replaced. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates, keys, "left_anti").unionByName(updates)

  /** O11 — recency-guarded merge: an update replaces the target row only
    * if `updates.recencyCol >= target.recencyCol` (or no target row
    * exists). Stale updates are dropped; untouched target rows survive.
    *
    * Physical shape: ONE full-outer join on the key columns, then a
    * per-column conditional projection — each input is scanned exactly
    * once. (The naive staged form — left join to pick winners, anti join
    * to keep survivors, union — evaluates both subtrees twice, which at
    * 100 TB doubles the dominant cost. The reference's 3-step BigQuery
    * merge has that staged shape because SQL DML forced it; a relational
    * engine does not.) Keys are assumed non-null (they are the table's
    * primary key; reference DDL declares NOT NULL —
    * src/db/postgres/daily_stock_price.sql:6-7). */
  def recencyMerge(target: DataFrame, updates: DataFrame, keys: Seq[String],
                   recencyCol: String): DataFrame = {
    val outCols = target.columns.toSeq
    val t = target.select(outCols.map(c => col(c).as(s"__t_$c")): _*)
    val u = updates.select(outCols.map(c => col(c).as(s"__u_$c")): _*)
    val cond = keys.map(k => u(s"__u_$k") === t(s"__t_$k")).reduce(_ && _)
    val takeUpdate = col(s"__u_${keys.head}").isNotNull &&
      (col(s"__t_${keys.head}").isNull ||
        col(s"__u_$recencyCol") >= col(s"__t_$recencyCol"))
    t.join(u, cond, "full_outer")
      .select(outCols.map(c =>
        when(takeUpdate, col(s"__u_$c")).otherwise(col(s"__t_$c")).as(c)): _*)
  }

  /** K8-flavored variant: stamp an audit column on the rows being written,
    * as the BigQuery merge stamps `inserted_at = CURRENT_TIMESTAMP()`
    * (bigquery_dml__upsert_daily_stock_price.sql:32). Audit value is a
    * parameter so oracle-compared queries can pass a literal. */
  def upsertAudited(target: DataFrame, updates: DataFrame, keys: Seq[String],
                    auditCol: String, auditValue: org.apache.spark.sql.Column): DataFrame =
    upsert(target.withColumn(auditCol, lit(null).cast("timestamp")),
      updates.withColumn(auditCol, auditValue), keys)

  /** SCD type-2 history built from a change log in one pass: each change
    * row becomes a version valid from its own timestamp until the key's
    * next change (`lead`), open-ended (`valid_to_us` null, `is_current`
    * true) for the latest. The warehouse-dimension twin of the
    * reference's audit-column story (K8): instead of overwriting rows and
    * stamping `updated_at`, every historical state is kept addressable.
    *
    * One shuffle on the key; validity bounds are microseconds (see
    * [[graft.operators.Sessions]] on cross-engine micros). `tieCol`
    * breaks equal-timestamp ordering deterministically. */
  def scd2FromLog(log: DataFrame, keys: Seq[String], tsCol: String,
                  tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("valid_from_us"), col(tieCol))
    log
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Incremental SCD2 merge: close the open versions of keys that appear
    * in `newLog` (their `valid_to_us` becomes the key's first new change
    * time) and append the new log's versions. Equivalent to rebuilding
    * with [[scd2FromLog]] over the concatenated log whenever the log is
    * split at a per-key time boundary (asserted as a property in
    * OpsSpec) — which is exactly the incremental-sync situation: each
    * sync's changes are newer than everything already merged.
    *
    * Physical shape: one aggregation of the (small) new log for the
    * close times, one broadcastable left join against the history, one
    * union — the history table is scanned once and never shuffled. */
  def scd2Merge(hist: DataFrame, newLog: DataFrame, keys: Seq[String],
                tsCol: String, tieCol: String): DataFrame = {
    val upd = scd2FromLog(newLog, keys, tsCol, tieCol)
    val firstNew = newLog
      .groupBy(keys.map(col): _*)
      .agg(min(unix_micros(col(tsCol))).as("__first_new_us"))
    hist.join(firstNew, keys, "left")
      .withColumn("valid_to_us",
        when(col("valid_to_us").isNull && col("__first_new_us").isNotNull,
          col("__first_new_us")).otherwise(col("valid_to_us")))
      .withColumn("is_current",
        col("valid_to_us").isNull)
      .drop("__first_new_us")
      .unionByName(upd)
  }
}
