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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    // rejects outright; read it as nanos-since-epoch LONG and truncate to
    // micros. `div` (integer division) — a double roundtrip at 1.7e18 loses
    // sub-µs precision. Scale caveat: predicates on the converted column
    // cannot push into the parquet scan (the conversion hides the raw
    // column) — a property of this nanos fixture, not the engine; a
    // production events table in TIMESTAMP(MICROS), or one partitioned by
    // date, gets full predicate/partition pruning with the same code.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
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
