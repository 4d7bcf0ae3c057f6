package graft

import graft.functions.{KMinValues, SimHashOf}
import graft.operators.{Sessions, Similarity, TextDedup}
import graft.ops.{RuntimeFilter, Sampling}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the round-2 additions: KMV sketch, verifiable simhash/IVF,
  * sessionization, deterministic sampling, bloom semi-join pruning. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMinValues keeps the k smallest distinct values across partitions") {
    val df = spark.range(0, 1000).repartition(7)
      .select((col("id") * 37 % 1000).as("h")) // a permutation of 0..999
    val got = df.agg(KMinValues(col("h"), 5).as("kmv"))
      .head().getSeq[Long](0)
    assert(got === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("KMinValues dedups and returns fewer than k when input is small") {
    val df = Seq(9L, 9L, 3L, 3L, 7L).toDF("h")
    val got = df.agg(KMinValues(col("h"), 16).as("kmv")).head().getSeq[Long](0)
    assert(got === Seq(3L, 7L, 9L))
  }

  test("KMV estimate tracks the true distinct count within ~2/sqrt(k)") {
    val n = 50000
    val df = spark.range(0, n)
      .select(Sampling.shaHash60(col("id")).as("h"))
    val k = 64
    val kth = df.agg(KMinValues(col("h"), k).as("kmv"))
      .select(element_at(col("kmv"), k)).head().getLong(0)
    val est = (k - 1).toDouble * math.pow(2, 60) / kth.toDouble
    assert(math.abs(est - n) / n < 2.0 / math.sqrt(k),
      s"estimate $est too far from $n")
  }

  test("SimHashOf matches the vote definition on a tiny golden case") {
    // hashes 0b01 and 0b01 and 0b10: bit0 votes +1+1-1=1 → set;
    // bit1 votes -1-1+1=-1 → clear; all higher bits negative.
    val got = Seq(Seq(1L, 1L, 2L)).toDF("hs")
      .select(SimHashOf(col("hs"), 60)).head().getLong(0)
    assert(got === 1L)
    // empty input → 0
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .select(SimHashOf(col("hs"), 60)).head().getLong(0)
    assert(empty === 0L)
  }

  test("ShingleHashSha bit-matches the sha2/conv expression-tree form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two"), // fewer tokens than the shingle width
      (3L, "")         // degenerate: one empty-window hash
    ).toDF("doc_id", "text")
    val native = TextDedup.shingleSetsSha(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val hof = TextDedup.shingleSetsShaHof(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(native.toSeq === hof.toSeq)
  }

  test("SimHashSha bit-matches SimHashOf over the sha token hashes") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "")
    ).toDF("doc_id", "text")
    val native = docs.select(graft.functions.SimHashSha(col("text")))
      .collect().map(_.getLong(0))
    val hof = docs.select(
      SimHashOf(TextDedup.shaTokenHashes(col("text")), 60))
      .collect().map(_.getLong(0))
    assert(native.toSeq === hof.toSeq)
  }

  test("BitsetOf bit-matches the per-slot HOF form and BitAndCount agrees") {
    val nSlots = 3
    val df = Seq(Seq(0, 1, 63, 64, 127, 128, 190), Seq.empty[Int])
      .toDF("wids")
    val pow2 = array((0 until 64).map(k => lit(1L << k)): _*)
    val hofMask = transform(sequence(lit(0), lit(nSlots - 1)), j =>
      aggregate(
        filter(col("wids"), w => floor(w / 64).cast("int") === j),
        lit(0L),
        (acc, w) => acc.bitwiseOR(element_at(pow2, pmod(w, lit(64)) + 1))))
    val rows = df.select(
      graft.functions.BitsetOf(col("wids"), nSlots).as("native"),
      hofMask.as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // popcount of the self-intersection equals the id count
    val Row(c: Int) = df.limit(1).select(
      graft.functions.BitAndCount(
        graft.functions.BitsetOf(col("wids"), nSlots),
        graft.functions.BitsetOf(col("wids"), nSlots))).head()
    assert(c === 7)
  }

  test("verifiable simhash pairs finds identical docs at hamming 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "utterly different content entirely unrelated words")
    ).toDF("doc_id", "text")
    val out = TextDedup.simhashNearDupsVerifiable(docs, "doc_id", "text")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(out.head.getLong(2) === 0L)
  }

  test("ivfTopKVerifiable returns vectors from probed cells only, top-k by cosine") {
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 0.37 + j * 0.11).toFloat)))
      .toDF("vec_id", "embedding")
    val q = (0 until 64).map(j => math.sin(0.37 + j * 0.11)) // = vector 1
    val out = Similarity.ivfTopKVerifiable(vecs, "vec_id", "embedding",
      query = q, k = 5)
    val rows = out.collect()
    assert(rows.length === 5)
    // the query equals vector 1, which must be its own nearest neighbor
    // provided its cell is probed — and it is, since its dot ranking
    // equals the query's
    assert(rows.head.getLong(0) === 1L)
    assert(math.abs(rows.head.getDouble(2) - 1.0) < 1e-9)
    // sims are non-increasing
    val sims = rows.map(_.getDouble(2))
    assert(sims.sorted.reverse.toSeq === sims.toSeq)
  }

  test("sessionize splits on gaps > threshold and aggregates per session") {
    val events = Seq(
      // user 1: two sessions — 3 events within 10m, then a 2h gap
      (1L, "2024-01-01 10:00:00", 10L, 1.0),
      (2L, "2024-01-01 10:05:00", 10L, 2.0),
      (3L, "2024-01-01 10:10:00", 10L, 3.0),
      (4L, "2024-01-01 12:10:00", 10L, 4.0),
      // user 2: one session
      (5L, "2024-01-01 00:00:00", 20L, 5.0)
    ).toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Sessions.sessionize(events, "user_id", "ts", "event_id",
      "value", gapUs = 3600L * 1000000L) // 1h
      .orderBy("user_id", "session_id").collect()
    assert(out.length === 3)
    val s1 = out(0)
    assert(s1.getLong(1) === 1L && s1.getLong(4) === 3L) // 3 events
    assert(s1.getDouble(5) === 6.0)
    val s2 = out(1)
    assert(s2.getLong(1) === 2L && s2.getLong(4) === 1L)
    // exact-boundary check: a gap of exactly 1h MERGES (session_window's
    // window end is inclusive; both forms must agree — see Sessions)
    val boundary = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "2024-01-01 11:00:00", 1L, 1.0)
    ).toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    assert(Sessions.sessionize(boundary, "user_id", "ts", "event_id",
      "value", gapUs = 3600L * 1000000L).count() === 1)
    assert(Sessions.sessionWindows(boundary, "user_id", "ts", "value", "1 hour")
      .count() === 1)
  }

  test("sessionWindows agrees with sessionize on session boundaries") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "2024-01-01 10:30:00", 1L, 1.0),
      (3L, "2024-01-01 12:00:00", 1L, 1.0) // 90m gap → new session
    ).toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val a = Sessions.sessionize(events, "user_id", "ts", "event_id",
      "value", gapUs = 3600L * 1000000L)
      .select("user_id", "session_start_us", "n_events")
      .orderBy("session_start_us").collect()
    val b = Sessions.sessionWindows(events, "user_id", "ts", "value", "1 hour")
      .select("user_id", "session_start_us", "n_events")
      .orderBy("session_start_us").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("stratifiedSample is deterministic and respects the zero/full rates") {
    val df = spark.range(0, 1000).select(col("id"),
      when(col("id") % 2 === 0, lit("even")).otherwise(lit("odd")).as("parity"))
    val rate = when(col("parity") === "even", lit(100L)).otherwise(lit(0L))
    val out = Sampling.stratifiedSample(df, col("id"), rate)
    assert(out.filter(col("parity") === "odd").count() === 0L)
    assert(out.filter(col("parity") === "even").count() === 500L)
    // rerun with different partitioning → identical selection
    val again = Sampling.stratifiedSample(df.repartition(13), col("id"), rate)
    assert(again.select("id").collect().map(_.getLong(0)).sorted
      === out.select("id").collect().map(_.getLong(0)).sorted)
  }

  test("connectedComponents labels every component by its smallest member") {
    // two components {1,2,3,9} (path) and {5,6}, singleton edges absent
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = graft.operators.Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents propagates across a long chain (multi-round)") {
    // driverThreshold = 0 forces the distributed join loop — the chain
    // needs several pointer-jumping rounds, the loop's hardest shape
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.operators.Components.connectedComponents(
        edges, driverThreshold = 0L)
      .collect().map(r => r.getLong(1)).distinct
    assert(got === Array(1L))
  }

  test("connectedComponents driver and distributed paths agree on string ids") {
    // string ids exercise label-ordering parity: the driver path must not
    // substitute JVM string order for the engine's UTF8 binary order
    val edges = Seq(("doc_b", "doc_a"), ("doc_b", "doc_c"), ("doc_x", "doc_y"))
      .toDF("id_a", "id_b")
    val viaDriver = graft.operators.Components.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaLoop = graft.operators.Components.connectedComponents(
        edges, driverThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaDriver === viaLoop)
    assert(viaDriver === Map("doc_a" -> "doc_a", "doc_b" -> "doc_a",
      "doc_c" -> "doc_a", "doc_x" -> "doc_x", "doc_y" -> "doc_x"))
  }

  test("decontaminate flags only docs sharing a shingle with the benchmark") {
    val train = Seq(
      (1L, "aa bb cc dd ee ff gg"),      // contains bench shingle aa..ee
      (2L, "zz yy xx ww vv uu tt"),      // disjoint
      (3L, "")                           // zero tokens: excluded
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val got = TextDedup.decontaminate(train, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L))
  }

  test("registered SQL surface covers the round-2 natives") {
    GraftExtensions.register(spark)
    Seq((1L, "alpha beta beta gamma"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
    // sha-simhash through SQL matches the Column API
    val viaSql = spark.sql(
      "SELECT doc_id, simhash_sha(text) AS s FROM sql_docs ORDER BY doc_id")
      .collect().map(_.getLong(1))
    val viaApi = Seq((1L, "alpha beta beta gamma"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
      .select(graft.functions.SimHashSha(col("text"))).orderBy()
      .collect().map(_.getLong(0))
    assert(viaSql.toSet === viaApi.toSet)
    // KMV aggregate usable from SQL
    spark.range(0, 100).select((col("id") * 7 % 100).as("h"))
      .createOrReplaceTempView("sql_hashes")
    val kmv = spark.sql("SELECT k_min_values(h, 4) FROM sql_hashes")
      .head().getSeq[Long](0)
    assert(kmv === Seq(0L, 1L, 2L, 3L))
    // DISTINCT and FILTER variants resolve (the builder returns the bare
    // AggregateFunction so the analyzer owns the wrapping)
    val kmvD = spark.sql(
      "SELECT k_min_values(DISTINCT h, 4) FILTER (WHERE h >= 2) FROM sql_hashes")
      .head().getSeq[Long](0)
    assert(kmvD === Seq(2L, 3L, 4L, 5L))
    // bitset build + popcount round-trip in SQL
    val cnt = spark.sql(
      "SELECT bit_and_count(bitset_of(array(1, 64, 130), 3), bitset_of(array(1, 64, 7), 3))")
      .head().getInt(0)
    assert(cnt === 2)
    // Count-Min grid from SQL: 2×8 grid over 100 hashes, rows sum to N
    val grid = spark.sql("SELECT count_min_grid(h, 2, 8) FROM sql_hashes")
      .head().getSeq[Long](0)
    assert(grid.length === 16)
    assert(grid.slice(0, 8).sum === 100L && grid.slice(8, 16).sum === 100L)
  }

  test("property: sessionize and sessionWindows agree on random event sets") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val events = (1 to 300).map { i =>
        val user = 1L + rnd.nextInt(5)
        val ts = new java.sql.Timestamp(1704067200000L + rnd.nextInt(500000) * 1000L)
        (i.toLong, ts, user, rnd.nextDouble() * 10)
      }.toDF("event_id", "ts", "user_id", "value")
      val a = Sessions.sessionize(events, "user_id", "ts", "event_id",
        "value", gapUs = 3600L * 1000000L)
        .select("user_id", "session_start_us", "session_end_us", "n_events", "total_value")
        .orderBy("user_id", "session_start_us").collect().toSeq
      val b = Sessions.sessionWindows(events, "user_id", "ts", "value", "1 hour")
        .select(col("user_id"), col("session_start_us"),
          // window end = last event + gap by definition; normalize back
          (col("session_end_us") - 3600L * 1000000L).as("session_end_us"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start_us").collect().toSeq
      assert(a === b, s"trial $trial diverged")
    }
  }

  test("property: connectedComponents matches a union-find reference") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 3) {
      val edges = (1 to 80).map(_ =>
        (1L + rnd.nextInt(60), 1L + rnd.nextInt(60)))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
      for (threshold <- Seq(0L, 5000000L)) { // loop path AND driver path
        val got = graft.operators.Components.connectedComponents(
          edges.toDF("id_a", "id_b"), driverThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"trial $trial threshold $threshold diverged")
      }
    }
  }

  test("incremental SCD2 merge equals a full rebuild over the whole log") {
    import graft.ops.Merge
    val e = Tables.load(spark, sf0001, "events")
      .select("user_id", "event_id", "value", "ts")
    val oldLog = e.filter(col("ts") < lit("2024-01-15"))
    val newLog = e.filter(col("ts") >= lit("2024-01-15"))
    val rebuild = Merge.scd2FromLog(e, Seq("user_id"), "ts", "event_id")
    val incremental = Merge.scd2Merge(
      Merge.scd2FromLog(oldLog, Seq("user_id"), "ts", "event_id"),
      newLog, Seq("user_id"), "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "value", "valid_from_us",
        "valid_to_us", "is_current")
        .orderBy("user_id", "valid_from_us", "event_id").collect().toSeq
    assert(canon(incremental) === canon(rebuild))
    // exactly one open version per key
    val opens = incremental.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(opens === 0L)
  }

  test("compact merges small files and preserves the data exactly") {
    val tmp = TempWork.fresh("compact_spec")
    // simulate incremental appends: 20 tiny files
    spark.range(0, 2000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(20)
      .write.mode("overwrite").parquet(tmp)
    val beforeRows = spark.read.parquet(tmp).orderBy("id").collect()
    val (nBefore, nAfter) = graft.ops.Maintenance.compact(spark, tmp,
      targetBytes = 1024L * 1024)
    assert(nBefore === 20)
    assert(nAfter < nBefore)
    val afterRows = spark.read.parquet(tmp).orderBy("id").collect()
    assert(afterRows.toSeq === beforeRows.toSeq)
  }

  test("bloomSemiJoin equals the plain semi join") {
    val fact = spark.range(0, 10000).select(col("id").as("k"),
      (col("id") % 97).as("v"))
    val dim = spark.range(0, 10000).filter(col("id") % 11 === 0)
      .select(col("id").as("dk"))
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "k", "dk",
      expectedItems = 4096)
      .orderBy("k").collect()
    val want = fact.join(dim.select(col("dk").as("k")), Seq("k"), "left_semi")
      .orderBy("k").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("SpaceSaving is exact when capacity covers the distinct set") {
    import graft.functions.SpaceSaving
    // zipfish frequencies over 20 tokens, shuffled across 7 partitions
    val df = spark.range(0, 5000).repartition(7)
      .select(concat(lit("t"), (pmod(col("id") * col("id"), lit(400L)) % 20)
        .cast("string")).as("tok"))
    val got = df.agg(SpaceSaving(col("tok"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = df.groupBy("tok").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.forall(_._3 === 0L), "exact regime must report zero error")
    assert(got.map(t => t._1 -> t._2).toMap === want)
    // output ordering is (cnt desc, token asc) — deterministic
    assert(got.sortBy(t => (-t._2, t._1)).toSeq === got.toSeq)
  }

  test("SpaceSaving error bounds hold in the evicting regime") {
    import graft.functions.SpaceSaving
    // 2000 distinct tokens but capacity 32: heavy hitters (freq 200)
    // versus a long tail of singletons
    val heavy = (0 until 5).flatMap(i => Seq.fill(200)(s"hh$i"))
    val tail = (0 until 1000).map(i => s"tail$i")
    val df = spark.sparkContext.parallelize(heavy ++ tail, 4).toDF("tok")
    val trueCounts = (heavy ++ tail).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = df.agg(SpaceSaving(col("tok"), 32).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 32)
    got.foreach { case (tok, cnt, err) =>
      val truth = trueCounts(tok)
      assert(truth <= cnt, s"$tok: sketch count $cnt under true $truth")
      assert(cnt - err <= truth, s"$tok: lower bound ${cnt - err} over true $truth")
    }
    // every item with frequency > N/m must survive (SpaceSaving guarantee)
    val n = heavy.size + tail.size
    val surviving = got.map(_._1).toSet
    trueCounts.filter(_._2 > n / 32).keys.foreach(k =>
      assert(surviving.contains(k), s"frequent item $k evicted"))
  }

  test("SpaceSaving merge bounds hold when an item straddles evicting partitions") {
    import graft.functions.SpaceSaving
    // partition 0: "straddler"×3 lands first, then five tokens ×10 each
    // evict it (capacity 4); its mass lives only in that partial's min
    // counter. partition 1: "straddler"×5 survives (partial never fills).
    // The naive union-merge reports cnt=5 for a true count of 8 — the
    // mergeable rule must charge partition 0's min counter to cnt and err
    // of every item absent from it (Berinde PODS'09 / Agarwal PODS'12).
    val p0 = Seq.fill(3)("straddler") ++
      Seq("a", "b", "c", "d", "e").flatMap(t => Seq.fill(10)(t))
    val p1 = Seq.fill(5)("straddler") ++ Seq("x", "y")
    val df = spark.sparkContext.parallelize(p0, 1)
      .union(spark.sparkContext.parallelize(p1, 1)).toDF("tok")
    val got = df.agg(SpaceSaving(col("tok"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val trueCounts = (p0 ++ p1).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(got.length === 4)
    got.foreach { case (tok, cnt, err) =>
      val truth = trueCounts(tok)
      assert(truth <= cnt,
        s"$tok: merged count $cnt under true $truth — evicted mass lost")
      assert(cnt - err <= truth,
        s"$tok: lower bound ${cnt - err} over true $truth")
    }
    // Survival here is NOT the heavy-hitter guarantee (straddler's true
    // frequency 8 is under N/m = 60/4 = 15): it follows from the
    // absent-bound charge — the merge adds partition 0's min counter (10)
    // to straddler's p1 count (5), and 15 outranks the 10/11-count items,
    // keeping it in the merged top-4 deterministically.
    assert(got.exists(_._1 === "straddler"), "straddling heavy item evicted")
  }

  test("KMV Jaccard estimates track true overlap within sampling error") {
    val k = 64
    val ev = Tables.load(spark, sf0001, "events")
    val est = SparkEntry.queries("q152_kmv_jaccard")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    val sets = ev.select(col("event_type"), col("user_id")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    for (((a, b), j) <- est) {
      val truth = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      // k=64 → standard error ≈ J(1−J)/√k; 0.2 is a ~3σ band here
      assert(math.abs(j - truth) < 0.2,
        s"($a,$b): estimate $j vs true $truth")
    }
    assert(est.size === 10, "expected all 5-choose-2 type pairs")
  }

  test("CountMin grid: row sums equal N, estimates bound every true count") {
    import graft.functions.CountMin
    val d = 4; val w = 64
    val docs = Tables.load(spark, sf0001, "documents").limit(200)
    val toks = docs.select(
      explode(TextDedup.shaTokenHashes(col("text"))).as("h"))
    val grid = toks.agg(CountMin(col("h"), d, w).as("g"))
      .select(col("g"), lit(1).as("k"))
    val cells = grid.select(explode(col("g")).as("c")).collect().map(_.getLong(0))
    val n = toks.count()
    // every row of the grid partitions the full input: d identical sums
    (0 until d).foreach { i =>
      assert(cells.slice(i * w, (i + 1) * w).sum === n, s"row $i sum != N")
    }
    // point estimates: min over the key's d cells is always >= true count
    val trueCounts = toks.groupBy("h").agg(count(lit(1)).as("n_true"))
    val est = trueCounts.crossJoin(broadcast(grid))
      .select(col("h"), col("n_true"),
        CountMin.estimate(col("g"), col("h"), d, w).as("n_est"))
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"hash ${r.getLong(0)}: estimate ${r.getLong(2)} under true ${r.getLong(1)}")
    }
  }

  // splitmix64 finalizer masked to 60 bits: a genuine mixing hash —
  // `i * const mod 2^60` is monotonic for small i and samples a prefix,
  // not a uniform subset
  private def mix60(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & ((1L << 60) - 1)
  }

  test("BottomKSample is partition-order-free and equals the sorted prefix") {
    import graft.functions.BottomKSample
    val rows = (1L to 1000L).map(i => (mix60(i), (i % 97).toDouble))
    val one = spark.createDataFrame(rows).toDF("h", "v").coalesce(1)
    val many = spark.createDataFrame(rows).toDF("h", "v").repartition(9)
    def sample(df: org.apache.spark.sql.DataFrame) =
      df.agg(BottomKSample(col("h"), col("v"), 50).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.h"), col("e.v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val s1 = sample(one)
    val s9 = sample(many)
    assert(s1 === s9, "sample depends on partitioning")
    val expect = rows.sortBy(identity).take(50)
    assert(s1 === expect, "sample is not the 50 smallest (h, v) pairs")
  }

  test("sample quantiles track the true distribution within sampling error") {
    import graft.functions.BottomKSample
    // values 0..999 uniformly; a k=256 uniform sample's median must land
    // well inside the central band
    val rows = (1L to 1000L).map(i => (mix60(i), (i % 1000).toDouble))
    val df = spark.createDataFrame(rows).toDF("h", "v")
    val med = df.agg(BottomKSample(col("h"), col("v"), 256).as("s"))
      .select(element_at(array_sort(transform(col("s"), x => x.getField("v"))), 128))
      .head().getDouble(0)
    assert(med > 350 && med < 650, s"sample median $med far from true 499.5")
  }

  test("q233 HLL registers estimate distinct users within the m=64 band") {
    // estimate = α₆₄·m²/Σ2^(−M_j) over all 64 buckets (absent bucket ⇒
    // register 0 ⇒ term 1). Standard error at m=64 is 1.04/√64 ≈ 13%;
    // assert a generous 3σ band against the exact distinct count.
    val regs = SparkEntry.queries("q233_hll_registers")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = Tables.load(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val m = 64
    val alpha = 0.709
    for ((t, n) <- exact) {
      val byBucket = regs.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      val z = (0 until m).map(b =>
        math.pow(2.0, -byBucket.getOrElse(b.toLong, 0L).toDouble)).sum
      val raw = alpha * m * m / z
      // Flajolet's small-range correction: below 2.5m with empty
      // buckets, linear counting E* = m·ln(m/V) replaces the raw
      // estimate (the raw form overshoots badly at n ≪ m)
      val v = (0 until m).count(b => !byBucket.contains(b.toLong))
      val est = if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v)
                else raw
      assert(math.abs(est - n) / n < 0.39,
        s"$t: HLL est $est vs exact $n (>3σ off)")
    }
    // merge soundness: the '__all' registers are the max over types
    val all = regs.filter(_._1 == "__all").map(r => r._2 -> r._3).toMap
    for (b <- all.keys) {
      val mx = regs.filter(r => r._1 != "__all" && r._2 == b).map(_._3).max
      assert(all(b) === mx, s"bucket $b: __all register is not the max")
    }
  }

  test("CountMin merge is partition-order-free (grids add element-wise)") {
    import graft.functions.CountMin
    val d = 2; val w = 32
    val vals = (1L to 500L).map(v => v * v * 2654435761L % (1L << 60))
    val one = spark.createDataFrame(vals.map(Tuple1(_))).toDF("h").coalesce(1)
    val many = spark.createDataFrame(vals.map(Tuple1(_))).toDF("h").repartition(7)
    val g1 = one.agg(CountMin(col("h"), d, w)).collect()(0).getSeq[Long](0)
    val g7 = many.agg(CountMin(col("h"), d, w)).collect()(0).getSeq[Long](0)
    assert(g1 === g7)
  }
}
