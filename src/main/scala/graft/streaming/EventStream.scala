package graft.streaming

import graft.ops.Exact
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming surface (SURVEY.md §2.9 [ext]).
  *
  * The reference's "streaming" is a daily scheduled micro-batch with
  * watermark state kept in the destination table. The Spark-native
  * equivalent: a file-source `readStream`, event-time tumbling window
  * aggregation, `Trigger.AvailableNow` for the batch-like daily run.
  *
  * Scale notes: AvailableNow processes the backlog in rate-limited
  * micro-batches with checkpointed state — the 100 TB shape is the same
  * code pointed at an arriving-files directory with a real checkpoint
  * location; state for a tumbling window is bounded by (#days × #types).
  * The decimal-sum trick (see [[graft.ops.Exact]]) keeps the streamed
  * aggregate bit-identical to the batch oracle regardless of micro-batch
  * boundaries, because decimal addition is associative.
  */
object EventStream {

  /** Tumbling 1-day totals per event_type over the events fixture,
    * executed as a real streaming query into a memory sink, returned as a
    * batch DataFrame for the verify/oracle harness. */
  def dailyTotals(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong surfaces the TIMESTAMP(NANOS) fixture column as a nanos
    // LONG; restore a proper event-time column for the window (micros
    // truncation, same as the batch path in Tables.load).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file stream source wants a *directory* of arriving files (its
    // production shape); the fixture is a single parquet file, so stage a
    // copy into a temp landing dir.
    val landing = java.nio.file.Files.createTempDirectory("graft_stream_in_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      landing.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(landing.toString)
      .withColumn("ts",
        if (schema("ts").dataType == org.apache.spark.sql.types.TimestampType) col("ts")
        else timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(Exact.Money)).as("tv"))
    val name = s"stream_daily_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(to_date(col("w.start")).as("event_date"), col("event_type"),
        col("n"), col("tv").cast(DoubleType).as("total_value"))
      .orderBy("event_date", "event_type")
  }
}
