package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Fixture loaders + typed row models.
  *
  * The engine's two core logical tables mirror the reference's data model
  * (reference: src/db/postgres/company.sql:7-16 and
  * daily_stock_price.sql:5-18): a snapshot dimension keyed by `symbol` and
  * an incrementally-growing fact keyed by (`symbol`, `date`). The driver's
  * TPC-H-ish parquet fixtures stand in for those tables (see FIXTURES.md §C
  * for the mapping).
  *
  * Scale note: every loader is a plain parquet scan — Catalyst pushes
  * filters and prunes columns into the scan, so downstream operators must
  * NOT `.cache()`/`.collect()` here. At 100 TB these paths would be
  * partitioned directories (e.g. `date=.../`) and the same code gets
  * partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Pin the fixture-reader confs before any parquet scan. Two fixture
    * generations exist: generation 1 wrote `events.ts` as
    * TIMESTAMP(NANOS), which Spark's reader rejects outright unless it is
    * surfaced as a nanos-since-epoch LONG; generation 2 (driver refresh of
    * 2026-08-13) writes TIMESTAMP(MICROS) with isAdjustedToUTC=false,
    * which Spark ≥3.4 infers as TIMESTAMP_NTZ by default. Disabling NTZ
    * inference reads that column as a plain session-tz TIMESTAMP straight
    * out of the scan — the session time zone is pinned to UTC at every
    * entry point, so values are the same instants — and, critically, keeps
    * predicate pushdown on the raw column (an NTZ→LTZ cast wrapper would
    * block it). */
  def fixtureConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Normalize an `events.ts` column to TIMESTAMP whatever dtype the scan
    * surfaced: LONG = generation-1 nanos fixture (truncate to micros with
    * integer `div` — a double roundtrip at 1.7e18 loses sub-µs precision);
    * TIMESTAMP_NTZ = generation-2 fixture read without [[fixtureConf]]
    * (cast is exact under the pinned UTC session zone); TIMESTAMP = no-op.
    * Scale caveat: only the LONG branch hides the raw column from parquet
    * predicate pushdown ([[graft.plans.NanosPredicatePushdown]] restores
    * it); the TIMESTAMP path out of [[fixtureConf]] pushes down natively. */
  def tsCol(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    dt match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _ => col("ts")
    }
  }

  /** Session-scoped memo of RESOLVED fixture relations. `spark.read
    * .parquet` re-lists the directory and re-reads a schema footer on
    * every call, and one bench pass loads the same ten immutable fixture
    * tables a few thousand times — identical resolution work each time
    * (~10 ms of driver metadata per load). Memoizing the analyzed
    * DataFrame reuses the relation (file list + schema) exactly the way
    * a catalog table with a metastore entry would; every ACTION still
    * scans the parquet data afresh, so this is metadata reuse, never
    * result caching. Keyed by (session, dir, table) and LRU-bounded like
    * SparkEntry's graph memo so a long-lived server cannot pin dead
    * sessions' relations. */
  private val loadMemo: java.util.Map[String, DataFrame] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, DataFrame](32, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, DataFrame]): Boolean =
          size() > 64
      })

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = System.identityHashCode(spark) + "|" + dir + "|" + name
    val hit = loadMemo.get(key)
    if (hit != null) return hit
    loadMemo.computeIfAbsent(key, _ => {
      fixtureConf(spark)
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" &&
          raw.schema("ts").dataType != org.apache.spark.sql.types.TimestampType)
        raw.withColumn("ts", tsCol(raw.schema("ts").dataType))
      else raw
    })
  }

  /** Reference-shaped dimension row (company.sql:7-16). */
  final case class Company(
      symbol: String,
      company_name: Option[String],
      sector: Option[String],
      subsector: Option[String],
      listing_date: Option[java.sql.Date],
      extracted_at: Option[java.sql.Timestamp])

  /** Reference-shaped fact row (daily_stock_price.sql:5-18); OHLC
    * standardized to Double (SURVEY.md §1.2). */
  final case class DailyStockPrice(
      symbol: String,
      date: java.sql.Date,
      open: Option[Double],
      high: Option[Double],
      low: Option[Double],
      close: Option[Double],
      extracted_at: Option[java.sql.Timestamp])

  def companies(spark: SparkSession, rows: Seq[Company]): Dataset[Company] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  def prices(spark: SparkSession, rows: Seq[DailyStockPrice]): Dataset[DailyStockPrice] = {
    import spark.implicits._
    spark.createDataset(rows)
  }
}
