package graft

import graft.pipeline.Sync
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline-composition specs + property-style checks over seeded random
  * batches (SURVEY.md §5.2): merge idempotence and result-grain
  * uniqueness. (scalatestplus isn't resolvable offline, so the properties
  * run over a deterministic seeded generator rather than ScalaCheck's
  * Prop machinery.) */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def pricesDF(rows: Seq[(String, String, Double, Int)]): DataFrame =
    rows.toDF("symbol", "date", "close", "extracted_at")

  private def randomBatch(seed: Long, n: Int = 12): Seq[(String, String, Double, Int)] = {
    val rnd = new scala.util.Random(seed)
    val syms = Seq("JFC", "ALI", "MBT")
    Seq.fill(n)((syms(rnd.nextInt(3)), f"2024-01-${rnd.nextInt(5) + 1}%02d",
      (rnd.nextInt(999) + 1).toDouble, rnd.nextInt(100) + 1))
  }

  private val ord = Seq(col("close").desc, col("extracted_at").desc)

  private def round(target: DataFrame, fetched: Seq[(String, String, Double, Int)]) =
    Sync.syncRound(target, pricesDF(fetched), Seq("symbol", "date"), ord, "extracted_at")

  test("syncRound: dedups the fetch then recency-merges into target") {
    val target = pricesDF(Seq(("JFC", "2024-01-01", 10.0, 50)))
    val fetched = Seq(
      ("JFC", "2024-01-01", 11.0, 60), // fresh duplicate pair: max close wins
      ("JFC", "2024-01-01", 13.0, 60),
      ("ALI", "2024-01-02", 5.0, 10))
    val out = round(target, fetched).orderBy("symbol")
    assert(rowsOf(out) === Seq(
      Seq("ALI", "2024-01-02", 5.0, 10),
      Seq("JFC", "2024-01-01", 13.0, 60)))
  }

  test("property: syncRound is idempotent over random batches") {
    for (seed <- 1L to 5L) {
      val target = round(pricesDF(Seq.empty), randomBatch(seed))
      val fetch = randomBatch(seed + 100)
      val once = round(target, fetch)
      val twice = round(once, fetch)
      assert(rowsOf(once.orderBy("symbol", "date", "close")) ===
        rowsOf(twice.orderBy("symbol", "date", "close")), s"seed=$seed")
    }
  }

  test("property: one-round result grain is unique on (symbol,date)") {
    for (seed <- 10L to 14L) {
      val out = round(pricesDF(Seq.empty), randomBatch(seed))
      assert(out.count() === out.select("symbol", "date").distinct().count(),
        s"seed=$seed")
    }
  }

  test("pendingKeys filters up-to-date keys (reference skip fast path)") {
    val target = pricesDF(Seq(("JFC", "2024-01-10", 1.0, 1)))
      .withColumn("date", col("date").cast("date"))
    val allKeys = Seq("JFC", "NEW").toDF("symbol")
    val out = Sync.pendingKeys(target, allKeys, "symbol", "date",
      lookbackDays = 0, freshnessDays = 1, asOf = lit("2024-01-11"))
    assert(rowsOf(out.select("symbol")) === Seq(Seq("NEW")))
  }

  test("loadOrInit: empty typed relation for a missing path, data when present") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("symbol", StringType),
      StructField("close", DoubleType)))
    val missing = Sync.loadOrInit(spark, "/tmp/graft_no_such_dir_xyz", schema)
    assert(missing.schema === schema)
    assert(missing.count() === 0)
    // first sync round against the empty init == bootstrap
    val fetched = Seq(("JFC", 1.0)).toDF("symbol", "close")
    assert(graft.ops.Merge.upsert(missing, fetched, Seq("symbol")).count() === 1)

    val dir = TempWork.fresh("init_spec") + "/t"
    fetched.write.parquet(dir)
    assert(Sync.loadOrInit(spark, dir, fetched.schema).count() === 1)
  }

  test("flagship entry pipeline returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
