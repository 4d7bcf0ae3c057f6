package graft.pipeline

import graft.ops.{Dedup, Merge, Watermark}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two-phase sync pipeline re-expressed over immutable
  * DataFrames (reference entry point: src/main.py:43-67; PySpark path
  * spark_deltalake_sync.py:312-336).
  *
  * Phase 1 (dimension): snapshot overwrite — O14
  * (spark_deltalake_sync.py:151-165): the new extract *is* the new table.
  *
  * Phase 2 (fact): for each key, fetch rows in the watermark window, argmax-
  * dedup them, and recency-merge into the target. The reference fans out
  * per-symbol over a thread pool (src/utils/multithreading.py:20-76); under
  * Spark the whole batch is one partitioned DataFrame job — task
  * parallelism replaces thread orchestration wholesale (SURVEY §2.8 D1).
  *
  * Backfill mode (D2) is just `lookbackDays = 36500`
  * (postgres_sync.py:262): same plan, wider window.
  */
object Sync {

  /** O14 — dimension snapshot refresh. */
  def companySnapshot(extract: DataFrame): DataFrame = extract

  /** One incremental sync round for the fact table.
    *
    * @param target   current state of the fact table
    * @param fetched  newly-extracted rows (may overlap target, may contain
    *                 intra-batch duplicates)
    * @param keys     the fact grain, e.g. (symbol, date)
    * @param dedupOrd total order picking the winner among duplicates
    *                 (reference: max close — pse_edge.py:259)
    * @param recencyCol timestamp guarding stale updates (O11)
    */
  def syncRound(target: DataFrame, fetched: DataFrame, keys: Seq[String],
                dedupOrd: Seq[Column], recencyCol: String): DataFrame = {
    val deduped = Dedup.argmaxWindow(fetched, keys, dedupOrd)
    Merge.recencyMerge(target, deduped, keys, recencyCol)
  }

  /** D4 — idempotent init / existence probe (reference:
    * `DeltaTable.isDeltaTable` → create-empty-with-schema,
    * spark_deltalake_sync.py:131-140; `TableNotFoundError` catch,
    * deltalake_sync.py:58-60): read the target if it exists, otherwise
    * return an empty relation with the declared schema so the first sync
    * round behaves identically to every later one. */
  def loadOrInit(spark: org.apache.spark.sql.SparkSession, path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame = {
    // Existence probe goes through the Hadoop FileSystem resolved from the
    // path's own scheme — a java.io.File check only sees the local disk and
    // would treat an existing hdfs:///s3:// target as absent, silently
    // replacing real state with an empty relation.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The work-list filter: keys whose watermark window is non-empty
    * (reference skip logic: postgres_sync.py:205). */
  def pendingKeys(target: DataFrame, allKeys: DataFrame, key: String,
                  dateCol: String, lookbackDays: Int, freshnessDays: Int,
                  asOf: Column): DataFrame =
    Watermark.syncWindows(
      Watermark.latestDates(target, key, dateCol),
      allKeys, key, lookbackDays, freshnessDays, asOf)
      .filter(!col("skip"))
}
