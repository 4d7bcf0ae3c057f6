package graft

import graft.ops.{Audit, Dedup, Exact, Merge, Transforms, Watermark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit specs for the reference-traceable operator core (SURVEY.md §2):
  * argmax dedup (A2), merge/upsert semantics (O10/O11), watermark state
  * (A1/P10), scalar transforms (P1–P10), exact aggregation. Golden-value
  * style mirrors the reference's integration tests
  * (reference: tests/integration/test_pse_edge.py:37-75). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  // (symbol, date, close, extracted_at) — the reference's fact grain
  private def prices(rows: (String, String, Double, String)*) =
    rows.toSeq.toDF("symbol", "date", "close", "extracted_at")

  test("argmaxWindow keeps the max-close row per (symbol,date)") {
    val df = prices(
      ("JFC", "2022-03-01", 10.0, "t1"), ("JFC", "2022-03-01", 12.0, "t2"),
      ("JFC", "2022-03-02", 11.0, "t3"), ("ALI", "2022-03-01", 5.0, "t4"))
    val out = Dedup.argmaxWindow(df, Seq("symbol", "date"),
      Seq(col("close").desc, col("extracted_at")))
      .orderBy("symbol", "date")
    assert(rowsOf(out) === Seq(
      Seq("ALI", "2022-03-01", 5.0, "t4"),
      Seq("JFC", "2022-03-01", 12.0, "t2"),
      Seq("JFC", "2022-03-02", 11.0, "t3")))
  }

  test("argmaxWindow is deterministic under input row order shuffling") {
    val base = Seq(
      ("JFC", "2022-03-01", 10.0, "a"), ("JFC", "2022-03-01", 10.0, "b"),
      ("JFC", "2022-03-01", 12.0, "c"))
    val out1 = Dedup.argmaxWindow(prices(base: _*), Seq("symbol", "date"),
      Seq(col("close").desc, col("extracted_at"))).collect()
    val out2 = Dedup.argmaxWindow(prices(base.reverse: _*), Seq("symbol", "date"),
      Seq(col("close").desc, col("extracted_at"))).collect()
    assert(out1 === out2)
  }

  test("argmaxMaxBy agrees with argmaxWindow on tie-free data") {
    val df = prices(
      ("JFC", "2022-03-01", 10.0, "t1"), ("JFC", "2022-03-01", 12.0, "t2"),
      ("ALI", "2022-03-01", 5.0, "t4"))
    val viaAgg = Dedup.argmaxMaxBy(df, Seq("symbol", "date"),
      Seq("close" -> col("close"), "extracted_at" -> col("extracted_at")),
      col("close")).orderBy("symbol").collect()
    val viaWin = Dedup.argmaxWindow(df, Seq("symbol", "date"),
      Seq(col("close").desc))
      .select("symbol", "date", "close", "extracted_at")
      .orderBy("symbol").collect()
    assert(viaAgg === viaWin)
  }

  test("exactByContent groups duplicates and keeps min id") {
    val docs = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("doc_id", "text")
    val out = Dedup.exactByContent(docs, "text", "doc_id")
      .orderBy("keep_id").select("n_dups", "keep_id")
    assert(rowsOf(out) === Seq(Seq(2L, 1L), Seq(1L, 2L)))
  }

  test("upsert: updates replace matched keys, target rows otherwise survive") {
    val target = prices(("JFC", "d1", 1.0, "t1"), ("ALI", "d1", 2.0, "t1"))
    val updates = prices(("JFC", "d1", 9.0, "t2"), ("MBT", "d1", 3.0, "t2"))
    val out = Merge.upsert(target, updates, Seq("symbol", "date")).orderBy("symbol")
    assert(rowsOf(out) === Seq(
      Seq("ALI", "d1", 2.0, "t1"),
      Seq("JFC", "d1", 9.0, "t2"),
      Seq("MBT", "d1", 3.0, "t2")))
  }

  test("recencyMerge drops stale updates (O11 vs O10 semantics divergence)") {
    val target = prices(("JFC", "d1", 1.0, "2024-02-01"), ("ALI", "d1", 2.0, "2024-02-01"))
    val updates = prices(
      ("JFC", "d1", 9.0, "2024-01-01"), // STALE: older than target
      ("ALI", "d1", 8.0, "2024-03-01"), // fresh: replaces
      ("MBT", "d1", 3.0, "2024-01-01")) // new key: inserts regardless
    val out = Merge.recencyMerge(target, updates, Seq("symbol", "date"), "extracted_at")
      .orderBy("symbol")
    assert(rowsOf(out) === Seq(
      Seq("ALI", "d1", 8.0, "2024-03-01"),
      Seq("JFC", "d1", 1.0, "2024-02-01"),
      Seq("MBT", "d1", 3.0, "2024-01-01")))
  }

  test("merge idempotence: merge(merge(t,u),u) == merge(t,u)") {
    val target = prices(("JFC", "d1", 1.0, "t1"), ("ALI", "d1", 2.0, "t3"))
    val updates = prices(("JFC", "d1", 9.0, "t2"), ("MBT", "d2", 3.0, "t2"))
    def once = Merge.recencyMerge(target, updates, Seq("symbol", "date"), "extracted_at")
    val twice = Merge.recencyMerge(once, updates, Seq("symbol", "date"), "extracted_at")
    assert(rowsOf(twice.orderBy("symbol", "date")) ===
      rowsOf(once.orderBy("symbol", "date")))
  }

  test("latestDates computes per-key max date") {
    val df = prices(("JFC", "2022-03-01", 1.0, "t"), ("JFC", "2022-03-05", 1.0, "t"),
      ("ALI", "2022-02-01", 1.0, "t"))
    val out = Watermark.latestDates(df, "symbol", "date").orderBy("symbol")
    assert(rowsOf(out.select(col("symbol"), col("latest_date").cast("string"))) ===
      Seq(Seq("ALI", "2022-02-01"), Seq("JFC", "2022-03-05")))
  }

  test("syncWindows: epoch default for never-synced keys, skip when current") {
    val latest = Seq(("JFC", "2024-01-10")).toDF("symbol", "latest_date")
      .select(col("symbol"), col("latest_date").cast("date").as("latest_date"))
    val allKeys = Seq("JFC", "NEW").toDF("symbol")
    val out = Watermark.syncWindows(latest, allKeys, "symbol",
      lookbackDays = 0, freshnessDays = 1, asOf = lit("2024-01-11"))
      .orderBy("symbol")
      .select(col("symbol"), col("latest_date").cast("string"),
        col("target_start").cast("string"), col("target_end").cast("string"),
        col("skip"))
    // lookback=0: start = latest+1; JFC latest=2024-01-10 → start 01-11 >
    // end 01-10 → skip (the reference's up-to-date fast path,
    // postgres_sync.py:205); NEW defaults to epoch → backfill from 1970.
    assert(rowsOf(out) === Seq(
      Seq("JFC", "2024-01-10", "2024-01-11", "2024-01-10", true),
      Seq("NEW", "1970-01-01", "1970-01-02", "2024-01-10", false)))
  }

  test("transforms: escape/concat-key/extract-id golden values") {
    val df = Seq(("O'Brien & Co", "JFC", "2022-03-01",
      "onclick=\"cmDetail('654')\"")).toDF("name", "symbol", "date", "attr")
    val out = df.select(
      Transforms.escapeQuotes(col("name")).as("esc"),
      Transforms.concatKey(col("symbol"), col("date")).as("ck"),
      Transforms.extractId(col("attr")).as("id"))
    assert(rowsOf(out) === Seq(Seq("O''Brien & Co", "JFC::2022-03-01", "654")))
  }

  test("upsertAudited stamps the audit column on written rows only (K8)") {
    val target = prices(("JFC", "d1", 1.0, "t1"))
    val updates = prices(("ALI", "d1", 2.0, "t2"))
    val out = Merge.upsertAudited(target, updates, Seq("symbol", "date"),
      "inserted_at", lit("2024-06-01 00:00:00").cast("timestamp"))
      .orderBy("symbol")
    val rows = out.select(col("symbol"), col("inserted_at").cast("string")).collect()
    assert(rows(0).getString(0) === "ALI" && rows(0).getString(1) === "2024-06-01 00:00:00")
    assert(rows(1).getString(0) === "JFC" && rows(1).isNullAt(1))
  }

  test("SQL-registered native functions evaluate through spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "shingle_hash('a b c d', 3) AS sh").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getSeq[Long](1).length === 2) // "a b c", "b c d"
  }

  test("moneySum is exact where naive double sum drifts") {
    // 0.1 + 0.2 != 0.3 in IEEE doubles; decimal path lands exactly on 0.3
    val df = Seq(0.1, 0.2).toDF("v")
    val Row(exact: Double) = df.agg(Exact.moneySum(col("v"))).head()
    assert(exact === 0.3)
  }

  test("revenueSum matches hand-computed decimal arithmetic") {
    val df = Seq((100.10, 0.05), (200.20, 0.10)).toDF("price", "disc")
    val Row(rev: Double) = df.agg(Exact.revenueSum(col("price"), col("disc"))).head()
    // 100.10*0.95 + 200.20*0.90 = 95.095 + 180.18 = 275.275
    assert(rev === 275.275)
  }

  test("deleteAll empties a partitioned layout but keeps it readable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_delete_").toString
    Seq((1L, 10.0, "click"), (2L, 20.0, "view"), (3L, 30.0, "click"))
      .toDF("id", "v", "kind")
      .write.mode("overwrite").partitionBy("kind").parquet(tmp)
    val schemaBefore = spark.read.parquet(tmp).schema
    assert(graft.ops.Maintenance.deleteAll(spark, tmp) === 3L)
    // the table stays readable (one schema-bearing empty file — a bare
    // dir wipe would break schema inference) with zero rows and the same
    // logical schema, partition column included
    val after = spark.read.parquet(tmp)
    assert(after.count() === 0L)
    assert(after.schema.fields.map(f => (f.name, f.dataType)).toSet ===
      schemaBefore.fields.map(f => (f.name, f.dataType)).toSet)
    // and the next partitioned write re-establishes the layout
    Seq((9L, 90.0, "signup")).toDF("id", "v", "kind")
      .write.mode("overwrite").partitionBy("kind").parquet(tmp)
    assert(spark.read.parquet(tmp).count() === 1L)
    graft.TempWork.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  test("audit: all checks in one pass, NULL predicate counts as failure") {
    val df = Seq((Option(1), "a"), (None, "b"), (Option(-1), null))
      .toDF("x", "s")
    val rep = Audit.audit(df, Seq(
        "x_pos" -> (col("x") > 0),
        "s_not_null" -> col("s").isNotNull))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // x > 0: NULL x is not proven positive → failure, like the -1 row
    assert(rep === Array(("s_not_null", 2L, 1L), ("x_pos", 1L, 2L)))
  }

  test("OHLC bars: open/close follow (ts, event_id) order, not input order") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // deliberately out of order; two ticks share a timestamp (tie →
    // event_id decides open)
    val df = Seq(
      (3L, ts("2024-01-01 12:00:00"), 7L, 30.0),
      (1L, ts("2024-01-01 09:00:00"), 7L, 10.0),
      (2L, ts("2024-01-01 09:00:00"), 7L, 20.0),
      (4L, ts("2024-01-02 10:00:00"), 7L, 5.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val bars = df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
      .orderBy("day").collect()
    assert(bars.length === 2)
    val d1 = bars(0)
    assert((d1.getDouble(2), d1.getDouble(3), d1.getDouble(4), d1.getDouble(5))
      === ((10.0, 30.0, 10.0, 30.0))) // open=event 1 (tie-break), close=event 3
    val d2 = bars(1)
    assert((d2.getDouble(2), d2.getDouble(5)) === ((5.0, 5.0)))
  }

  test("temperature mixing upsamples rare sources and caps the head") {
    val out = graft.ops.Sampling.temperatureMix(
        Tables.load(spark, sf0001, "documents"), "source", "doc_id", 0.5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length > 1)
    out.foreach { case (_, n, thresh, kept) =>
      assert(thresh >= 0L && thresh <= 1000000L)
      assert(kept <= n)
    }
    // sampling rate ∝ n^(-1/2): strictly larger sources get strictly
    // smaller (or equal at the p=1 cap) thresholds
    out.sortBy(_._2).sliding(2).foreach {
      case Array((_, n1, t1, _), (_, n2, t2, _)) if n1 < n2 =>
        assert(t1 >= t2, s"rate must not rise with size ($n1→$t1, $n2→$t2)")
      case _ =>
    }
    // achieved totals land near the 50% budget (hash-threshold noise only)
    val (kept, all) = (out.map(_._4).sum.toDouble, out.map(_._2).sum.toDouble)
    assert(kept / all > 0.3 && kept / all < 0.7, s"kept ${kept / all}")
  }
}
