package graft

import graft.functions.TextOps
import graft.operators.TextDedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the text-analysis and near-dup surface (north-star ops). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private val doc = "the quick brown fox jumps over the lazy dog"

  test("token counts, distinct counts, stopword ratio on a known sentence") {
    val df = Seq(doc).toDF("text")
    val Row(n: Long, d: Long, stop: Double) = df.select(
      TextOps.tokenCount(col("text")),
      TextOps.distinctTokenCount(col("text")),
      TextOps.stopwordRatio(col("text"))).head()
    assert(n === 9)
    assert(d === 8) // "the" twice
    assert(stop === 2.0 / 9.0) // two "the"s
  }

  test("tokens are robust to repeated spaces") {
    val Row(n: Long) = Seq("a  b   c").toDF("text")
      .select(TextOps.tokenCount(col("text"))).head()
    assert(n === 3)
  }

  test("regexTokens splits on non-alphanumeric runs") {
    val toks = Seq("Hello, world! x2")
      .toDF("text").select(TextOps.regexTokens(col("text"))).head().getSeq[String](0)
    assert(toks === Seq("hello", "world", "x2"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq("abc", "acb", "abc").toDF("text")
    val fps = df.select(TextOps.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) === fps(2)) // same text → same fp
    assert(fps(0) !== fps(1)) // permuted text → different fp (rolling hash)
    // golden: h("abc") = ((0*31+97)*31+98)*31+99 = 96354
    assert(fps(0) === ((97L * 31 + 98) * 31 + 99))
  }

  test("langId picks the profile with most matching bigrams") {
    val out = Seq("the weather is fine here", "zzz qqq xxx")
      .toDF("text").select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    assert(out(0) === "en")
    assert(out(1) === "und")
  }

  test("jaccardNearDups finds a known near-pair and skips far pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"), // jaccard 5/7 ≈ 0.714
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    val out = TextDedup.jaccardNearDups(docs, "doc_id", "text",
      threshold = 0.6, bandWidth = 8).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 2L)
    assert(math.abs(out(0).getDouble(2) - 5.0 / 7.0) < 1e-12)
  }

  test("q80 segment candidates recall a worst-case 6-edit pair exactly at the bound") {
    // adversarial corpus for the PassJoin pigeonhole: doc 2 edits SIX of
    // doc 1's seven prefix segments (only "ggg" survives — the minimum
    // the theorem guarantees); doc 3 adds a 7th edit (dist 7, excluded);
    // doc 4 is an exact copy; docs 5/6 exercise the short-prefix "" path
    val docs = spark.createDataFrame(Seq(
      (1L, "en", "aaaabbbbccccdddeeefffggg", 24L),
      (2L, "en", "XaaaXbbbXcccXddXeeXffggg", 24L),
      (3L, "en", "XaaaXbbbXcccXddXeeXffXgg", 24L),
      (4L, "en", "aaaabbbbccccdddeeefffggg", 24L),
      (5L, "en", "shrt", 4L),
      (6L, "en", "shrt", 4L)
    )).toDF("doc_id", "lang", "text", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("q80docs")
    try {
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = SparkEntry.queries("q80_fuzzy_block_join")(spark, tmp.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out === Set((1L, 2L, 6L), (1L, 4L, 0L), (2L, 3L, 1L),
        (2L, 4L, 6L), (5L, 6L, 0L)))
    } finally {
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      finally walk.close()
    }
  }

  test("minhashNearDups recalls identical and near-identical docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val out = TextDedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.9, shingleLen = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("native ShingleHash matches the expression-tree shingle pipeline on fixtures") {
    val docs = Tables.load(spark, sf0001, "documents").limit(200)
    val a = TextDedup.shingleSets(docs, "doc_id", "text", 3).orderBy("doc_id").collect()
    val b = TextDedup.shingleSetsHof(docs, "doc_id", "text", 3).orderBy("doc_id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) === y.getLong(0))
      assert(x.getSeq[Long](1) === y.getSeq[Long](1))
    }
  }

  test("native MinHashSig matches the expression-tree minhash family on fixtures") {
    val sets = TextDedup.shingleSets(
      Tables.load(spark, sf0001, "documents").limit(100), "doc_id", "text", 3)
    val both = sets.select(
      graft.functions.MinHashSig(col("sh"), 16).as("fast"),
      TextDedup.minhashSigHof(col("sh"), 16).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("native SimHash64 matches the explode+aggregate formulation on fixtures") {
    val docs = Tables.load(spark, sf0001, "documents").limit(200)
    val fast = TextDedup.simhashDocs(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    val ref = TextDedup.simhashDocsAgg(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(fast === ref)
  }

  test("simhashNearDups pairs identical docs at hamming 0, skips unrelated") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different unrelated content words here")
    ).toDF("doc_id", "text")
    val out = TextDedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ===
      Set((1L, 2L, 0)))
  }

  test("minhashNearDupsVerifiable matches the production pipeline's verified pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely unrelated sentence about database engines and joins"),
      (4L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    // both variants verify candidates with exact jaccard over the same
    // word-shingle sets, so identical docs must pair in both; the sha
    // variant's candidate set may differ on borderline pairs (different
    // minhash values), but never on identical documents
    val sha = TextDedup.minhashNearDupsVerifiable(docs, "doc_id", "text",
      threshold = 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prod = TextDedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sha.contains((1L, 4L)))
    assert(prod.contains((1L, 4L)))
    assert(!sha.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("shingleSetsSha: 60-bit sha shingle hashes, distinct per doc") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
    val sets = TextDedup.shingleSetsSha(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(sets(0) === sets(1))          // same text, same hashes
    assert(sets(0).toSet.intersect(sets(2).toSet).isEmpty)
    assert(sets(0).forall(h => h >= 0L && h < (1L << 60)))
  }

  test("simhash: identical docs collide, disjoint docs differ") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "unrelated content entirely different")
    ).toDF("doc_id", "text")
    val sh = TextDedup.simhashDocs(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(sh(0) === sh(1))
    assert(sh(0) !== sh(2))
  }

  test("q92 token-id encoding: counts, UNK, and zero-token docs") {
    val rows = SparkEntry.queries("q92_token_ids")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every document appears exactly once, including any zero-token ones
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.length === nDocs)
    rows.foreach { case (_, nTok, nUnk, fp) =>
      assert(nUnk <= nTok)                 // UNKs are a subset of tokens
      assert(nTok > 0 || fp === 0L)        // empty doc → zero fingerprint
      // fingerprint bound: ids ≤ 16 (vocab cap), positions < nTok
      assert(fp <= 16L * nTok * (nTok + 1) / 2)
    }
    // the 16-entry vocab cannot cover the corpus' 31-token vocabulary
    assert(rows.map(_._3).sum > 0L)
  }

  test("token_stats generator: first positions, counts, null and empty rows") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq((1L, Some("b a b  c a b")), (2L, Some("")), (3L, None))
      .toDF("id", "text")
    val rows = df.selectExpr("id", "token_stats(text) AS (token, first_pos, n)")
      .orderBy("id", "first_pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1 only: empty text → zero tokens → zero rows; NULL → zero rows
    assert(rows.toSeq === Seq(
      (1L, "b", 0L, 3L), (1L, "a", 1L, 2L), (1L, "c", 3L, 1L)))
  }

  test("bloom decontamination equals the exact broadcast form") {
    val docs = Tables.load(spark, sf0001, "documents")
    val train = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val exact = TextDedup.decontaminate(train, bench, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = TextDedup.decontaminateBloom(train, bench, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom === exact)
    assert(exact.nonEmpty)
    // both sides of the adaptive prefilter decision are value-identical:
    // force the explicit-bloom branch (threshold 0) on the same corpus
    val forced = TextDedup.decontaminateBloom(train, bench, "doc_id",
      "text", 4, prefilterTrainBytes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(forced === exact)
  }

  test("feature-hash score: ordered slot-weight fold, both classes occur") {
    import spark.implicits._
    import graft.functions.{FeatureHashScore, Sha60}
    val df = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("id", "text")
    val got = df.select(col("id"), FeatureHashScore(col("text")).as("s"))
      .orderBy("id").collect().map(_.getDouble(1))
    def w(tok: String) = FeatureHashScore.weightInt(
      (Sha60.hash(tok) % 64).toInt) / 1000.0
    assert(got(0) === 0.0 + w("alpha") + w("beta") + w("alpha"))
    assert(got(1) === 0.0)
    // the fixture corpus must exercise both sides of the gate
    val keeps = SparkEntry.queries("q161_feature_hash_gate")(spark, sf0001)
      .collect().map(_.getBoolean(2)).toSet
    assert(keeps === Set(true, false))
  }

  test("q159 incremental minhash equals the full pipeline's batch pairs") {
    val docs = Tables.load(spark, sf0001, "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val sigTable = TextDedup.minhashSigTable(corpus, "doc_id", "text")
    val inc = TextDedup.minhashIncremental(sigTable, batch,
        "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: the full from-scratch pipeline, batch-involving pairs
    val full = TextDedup.minhashNearDupsVerifiable(docs, "doc_id", "text",
        threshold = 0.5)
      .filter(pmod(col("id_a"), lit(10)) === 0 ||
        pmod(col("id_b"), lit(10)) === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("q157 prefix filter is recall-exact vs the unblocked all-pairs join") {
    val docs = Tables.load(spark, sf0001, "documents")
    val viaPrefix = TextDedup.prefixFilterNearDups(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: every pair, no blocking at all (500 docs → 125k pairs)
    val words = docs.select(col("doc_id"),
        array_distinct(graft.functions.TextOps.tokens(col("text"))).as("ws"))
      .filter(size(col("ws")) > 0)
    val aw = words.select(col("doc_id").as("id_a"), col("ws").as("ws_a"))
    val bw = words.select(col("doc_id").as("id_b"), col("ws").as("ws_b"))
    val naive = aw.crossJoin(bw).filter(col("id_a") < col("id_b"))
      .withColumn("j", TextDedup.jaccardExpr(col("ws_a"), col("ws_b")))
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix === naive,
      s"missed ${(naive -- viaPrefix).size}, extra ${(viaPrefix -- naive).size}")
    assert(naive.nonEmpty)
  }

  test("q153 substring dedup: shared spans counted, unique docs dropped") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro $span tail one"),       // shares the 10-token span with 2
      (2L, s"other lead $span closing"),
      (3L, "completely different words with no ten token overlap at all here")
    ).toDF("doc_id", "text")
    val out = TextDedup.substringDupStats(docs, "doc_id", "text", window = 10)
      .orderBy("doc_id").collect()
    // doc 3 has no shared window → filtered out
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    out.foreach { r =>
      val (nW, nDup) = (r.getLong(1), r.getLong(2))
      // both docs have 13 tokens → 4 windows; exactly one window (the
      // span itself) is shared
      assert(nDup === 1L)
      assert(r.getDouble(3) === nDup.toDouble / nW)
    }
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 4L))
  }

  test("containment finds a quoted doc that resemblance-Jaccard misses") {
    import spark.implicits._
    // doc 2 = doc 1 verbatim + a long unrelated tail: containment(1→2)=1,
    // Jaccard well under the 0.8 bar. doc 3 unrelated.
    val quote = "alpha beta gamma delta epsilon zeta"
    val tail = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, s"$quote $tail"),
      (3L, "totally different content here")).toDF("doc_id", "text")
    val got = graft.operators.TextDedup.containmentPairs(
      docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    assert(got.toSeq === Seq((1L, 2L, "a_in_b")))
    val jac = graft.operators.TextDedup.minhashNearDupsVerifiable(
      docs, "doc_id", "text", threshold = 0.8)
      .collect()
    assert(jac.isEmpty, "Jaccard at 0.8 should NOT pair the quote")
  }
}
