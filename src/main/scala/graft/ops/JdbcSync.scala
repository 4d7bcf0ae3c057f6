package graft.ops

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The warehouse/JDBC destination path (reference `src/etl/postgres_sync
  * .py:36-86` — batched INSERT … ON CONFLICT into Postgres; `src/utils/
  * bigquery.py` — the BigQuery twin). Spark-first shape: `df.write.jdbc`
  * pushes partition-parallel batched inserts through the executor-side
  * JDBC driver (no driver-side tuple loops like the reference's row
  * string building), `spark.read.jdbc` plans a partitioned parallel
  * scan, and the ON CONFLICT upsert becomes the standard warehouse
  * two-step: bulk-load a staging table, one set-based MERGE into the
  * target — the same staged shape as the reference's BigQuery merge
  * (`src/etl/sql/bigquery_dml__upsert_daily_stock_price.sql`).
  *
  * Tests/queries run against EMBEDDED Apache Derby (in the Spark
  * distribution, zero egress); everything here is plain java.sql + Spark
  * JDBC API, so a production URL (Postgres etc.) drops in unchanged.
  *
  * Scale notes: writes parallelize per partition with `batchsize`-d
  * prepared-statement batches — `coalesce` the frame to what the
  * warehouse's connection/ingest limits tolerate; reads parallelize via
  * (partitionColumn, lowerBound, upperBound, numPartitions) range
  * predicates so each executor pulls a slice. The MERGE runs inside the
  * warehouse — Spark ships only the delta, which is the entire point of
  * the staged upsert at 100 TB: the network carries the updates, never
  * the target. */
object JdbcSync {

  private def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Overwrite-load `df` into `table` (create or replace). Derby maps
    * StringType to CLOB by default, which can't be equality-joined in a
    * MERGE — `varcharCols` forces named columns to VARCHAR(n). */
  def overwrite(df: DataFrame, url: String, table: String,
                varcharCols: Map[String, Int] = Map.empty): Unit = {
    val w0 = df.write.mode("overwrite")
    val w =
      if (varcharCols.isEmpty) w0
      else w0.option("createTableColumnTypes",
        varcharCols.map { case (c, n) => s"$c VARCHAR($n)" }.mkString(", "))
    w.jdbc(url, table, props())
  }

  /** Append `df` with explicit executor-side batching. */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 1000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props())

  /** Partitioned parallel read: each of `numPartitions` tasks pulls a
    * `partCol` range slice. */
  def read(spark: SparkSession, url: String, table: String,
           partCol: String, lower: Long, upper: Long,
           numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions,
      props())

  /** Single-partition read (small dims / staging checks). */
  def readAll(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props())

  /** The reference's ON CONFLICT DO UPDATE as a warehouse-side staged
    * MERGE: bulk-load `updates` into `staging`, then one set-based
    * `MERGE INTO target USING staging` (update on key match, insert
    * otherwise), then drop staging. Last-writer-wins, matching
    * [[Merge.upsert]]. Runs on any MERGE-capable engine (Derby 10.11+,
    * Postgres 15+, BigQuery, Snowflake). */
  def upsertViaStaging(updates: DataFrame, url: String, target: String,
                       staging: String, keys: Seq[String],
                       varcharCols: Map[String, Int] = Map.empty): Unit = {
    overwrite(updates, url, staging, varcharCols)
    val cols = updates.columns.toSeq
    // Spark's JDBC writer creates columns as QUOTED identifiers, so the
    // MERGE must quote them too (unquoted names fold to uppercase and
    // miss the case-exact quoted ones).
    def q(c: String) = "\"" + c + "\""
    val onClause = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val setClause = cols.filterNot(keys.contains)
      .map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
    val insertCols = cols.map(q).mkString(", ")
    val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    val merge =
      s"""MERGE INTO $target t USING $staging s ON $onClause
         |WHEN MATCHED THEN UPDATE SET $setClause
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)
         |""".stripMargin
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(merge)
      finally {
        // drop staging even when the MERGE throws — a leftover staging
        // table would silently absorb the next run's overwrite and hide
        // schema drift between runs
        try st.executeUpdate(s"DROP TABLE $staging")
        catch { case _: java.sql.SQLException => () }
        st.close()
      }
    } finally conn.close()
  }
}
