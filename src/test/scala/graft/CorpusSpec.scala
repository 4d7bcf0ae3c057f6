package graft

import graft.operators.Corpus
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the training-corpus preparation surface
  * ([[graft.operators.Corpus]]): sequence packing, chunking, PII
  * redaction, repetition gating, incremental batch-vs-corpus dedup. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences assigns cumulative-sum packs per group, overflow opens next pack") {
    // group g: doc 1 (3 tok), doc 2 (4 tok), doc 3 (2 tok), budget 5:
    //   doc 1 before=0 -> pack 0; doc 2 before=3 -> pack 0 (overflows to 7);
    //   doc 3 before=7 -> pack 1. Group h packs independently.
    val docs = Seq(
      (1L, "a b c", "g"), (2L, "d e f g", "g"), (3L, "h i", "g"),
      (4L, "x y z w v", "h")).toDF("doc_id", "text", "lang")
    val out = Corpus.packSequences(docs, "doc_id", "text", "lang", 5)
      .orderBy("lang", "pack_id")
    assert(rowsOf(out) === Seq(
      Seq("g", 0L, 2L, 7L),
      Seq("g", 1L, 1L, 2L),
      Seq("h", 0L, 1L, 5L)))
  }

  test("packSequences is deterministic under input shuffling") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Corpus.packSequences(docs, "doc_id", "text", "lang", 512)
    val b = Corpus.packSequences(docs.orderBy(rand(7)), "doc_id", "text", "lang", 512)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("chunk produces stride-offset windows; last chunk short; empty doc none") {
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    // size=4, stride=3 over 10 chars -> offsets 0,3,6,9
    val out = Corpus.chunk(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
    assert(rowsOf(out) === Seq(
      Seq(1L, 0L, "abcd"), Seq(1L, 1L, "defg"),
      Seq(1L, 2L, "ghij"), Seq(1L, 3L, "j")))
  }

  test("chunk offsets never start past the text end") {
    // length 9 = exactly 3 strides: last offset must be 6, not 9
    val docs = Seq((1L, "abcdefghi")).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, "doc_id", "text", size = 4, stride = 3)
    assert(out.count() === 3)
  }

  test("redactPii replaces emails before digit runs and counts both") {
    val docs = Seq((1L, "mail bob.smith+x@corp.example.org ref 12345678 ok"),
                   (2L, "clean text")).toDF("doc_id", "text")
    val out = Corpus.redactPii(docs, "doc_id", "text").orderBy("doc_id")
    assert(rowsOf(out) === Seq(
      Seq(1L, "mail <EMAIL> ref <ID> ok", 1L, 1L),
      Seq(2L, "clean text", 0L, 0L)))
  }

  test("redactPii leaves short digit runs alone") {
    val Row(_, red: String, _, runs: Long) =
      Corpus.redactPii(Seq((1L, "v1 build 12345 x")).toDF("doc_id", "text"),
        "doc_id", "text").head()
    assert(red === "v1 build 12345 x" && runs === 0L)
  }

  test("repetitionStats computes dup fractions and keep flag") {
    val docs = Seq(
      (1L, "a a a a"),           // 4 tokens, 1 distinct -> dup 0.75; bigrams "a a" x3 -> dup 2/3
      (2L, "a b c d"),           // all distinct -> 0.0 / 0.0
      (3L, "")).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(docs, "doc_id", "text").orderBy("doc_id")
    assert(rowsOf(out) === Seq(
      Seq(1L, 4L, 0.75, 1.0 - 1.0 / 3.0, false), // = 0.666…67: the engine computes 1 - d/t, not d'/t
      Seq(2L, 4L, 0.0, 0.0, true),
      Seq(3L, 0L, 0.0, 0.0, true)))
  }

  test("property: packing conserves tokens and pack ids are contiguous from 0") {
    val rnd = new scala.util.Random(42)
    val docs = (1L to 300L).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(60))("w" + rnd.nextInt(20))
      (i, words.mkString(" "), "g" + rnd.nextInt(4))
    }.toDF("doc_id", "text", "lang")
    val packs = Corpus.packSequences(docs, "doc_id", "text", "lang", 128)
    val byGroup = packs.groupBy("lang")
      .agg(sum("pack_tokens").as("total"), max("pack_id").as("max_p"),
        countDistinct("pack_id").as("n_p"), min("pack_id").as("min_p"))
      .collect()
    val truth = docs.select(col("lang"),
      graft.functions.TextOps.tokenCount(col("text")).as("n"))
      .groupBy("lang").agg(sum("n").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byGroup.foreach { r =>
      assert(r.getLong(1) === truth(r.getString(0)), "tokens conserved")
      assert(r.getLong(4) === 0L, "first pack is 0")
      assert(r.getLong(3) === r.getLong(2) + 1, "pack ids contiguous")
    }
  }

  test("property: non-overlapping chunks reconstruct the text exactly") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 50L).map { i =>
      (i, rnd.alphanumeric.take(rnd.nextInt(400)).mkString)
    }.toDF("doc_id", "text")
    val rebuilt = Corpus.chunk(docs, "doc_id", "text", size = 64, stride = 64)
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("chunk_idx"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val bad = docs.join(rebuilt, Seq("doc_id"))
      .filter(col("text") =!= col("rebuilt") && length(col("text")) > 0)
    assert(bad.isEmpty, "chunks at stride==size must tile the text")
  }

  test("property: redacted output never matches the PII patterns") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 100L).map { i =>
      val noise = Seq.fill(5)(rnd.alphanumeric.take(6).mkString).mkString(" ")
      (i, s"$noise user$i@x$i.example.net id ${1000000 + rnd.nextInt(999999)} $noise")
    }.toDF("doc_id", "text")
    val out = Corpus.redactPii(docs, "doc_id", "text")
    assert(out.filter(regexp_count(col("redacted"), lit(Corpus.EmailRe)) > 0 ||
      regexp_count(col("redacted"), lit(Corpus.DigitRunRe)) > 0).isEmpty)
    assert(out.filter(col("n_emails") =!= 1L || col("n_digit_runs") =!= 1L).isEmpty)
  }

  test("NULL text: zero-token pack/stats rows, zero redaction counts, never dedup-matched") {
    val docs = Seq((1L, null: String, "g"), (2L, "a b", "g"))
      .toDF("doc_id", "text", "lang")
    val packs = Corpus.packSequences(docs, "doc_id", "text", "lang", 5)
    assert(rowsOf(packs.select("pack_id", "n_docs", "pack_tokens")) ===
      Seq(Seq(0L, 2L, 2L)), "null doc joins pack 0 with 0 tokens")
    val stats = Corpus.repetitionStats(docs, "doc_id", "text").orderBy("doc_id")
    assert(rowsOf(stats) === Seq(
      Seq(1L, 0L, 0.0, 0.0, true), Seq(2L, 2L, 0.0, 0.0, true)))
    val red = Corpus.redactPii(docs, "doc_id", "text").orderBy("doc_id").head()
    assert(red.isNullAt(1) && red.getLong(2) === 0L && red.getLong(3) === 0L)
    val kept = Corpus.dedupAgainstCorpus(
      docs, Seq((9L, null: String), (10L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text").select("doc_id")
    assert(rowsOf(kept) === Seq(Seq(9L)), "null batch text kept, exact match dropped")
  }

  test("dedupAgainstCorpus drops exact re-extracts, keeps changed docs") {
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val batch = Seq((11L, "alpha"), (12L, "beta v2"), (13L, "delta"))
      .toDF("doc_id", "text")
    val out = Corpus.dedupAgainstCorpus(corpus, batch, "doc_id", "text")
      .select("doc_id").orderBy("doc_id")
    assert(rowsOf(out) === Seq(Seq(12L), Seq(13L)))
  }

  test("curate chains gate -> dedup -> decontaminate -> cap") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, s"$base alpha beta", "en"),                       // kept
      (2L, s"$base alpha beta", "en"),                       // exact dup of 1 -> dropped
      (3L, "spam spam spam spam spam spam spam spam spam spam spam", "en"), // repetitive -> gated
      (4L, s"$base w1 w2 w3 w4", "en"))                      // shares a 4-gram with eval -> dropped
      .toDF("doc_id", "text", "lang")
    val eval = Seq((100L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val out = Corpus.curate(docs, "doc_id", "text", "lang", eval, capPerGroup = 10)
    assert(rowsOf(out) === Seq(Seq("en", 1L, 14L)))
  }

  test("curate tolerates an input that already has an n_tokens column") {
    // the stat columns are internally prefixed, so a pre-existing
    // n_tokens (common in pre-profiled corpora) must neither collide
    // ambiguously nor be read by the gate — the bogus value 999 would
    // flip the minTokens filter if it were
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten eleven", "en", 999L))
      .toDF("doc_id", "text", "lang", "n_tokens")
    val eval = Seq((100L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = Corpus.curate(docs, "doc_id", "text", "lang", eval, capPerGroup = 5)
    assert(rowsOf(out) === Seq(Seq("en", 1L, 11L)))
  }

  test("curate per-group cap bounds the kept docs deterministically") {
    val docs = (1L to 30L).map(i =>
      (i, s"uniq$i one two three four five six seven eight nine ten", "en"))
      .toDF("doc_id", "text", "lang")
    val eval = Seq((100L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = Corpus.curate(docs, "doc_id", "text", "lang", eval, capPerGroup = 7)
    assert(rowsOf(out) === Seq(Seq("en", 7L, 77L)))
  }

  test("dedupAgainstCorpus is idempotent: re-running against corpus+batch drops everything") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq((11L, "alpha"), (12L, "new")).toDF("doc_id", "text")
    val merged = corpus.unionByName(
      Corpus.dedupAgainstCorpus(corpus, batch, "doc_id", "text"))
    assert(Corpus.dedupAgainstCorpus(merged, batch, "doc_id", "text").isEmpty)
  }

  test("BPE learns the hand-computed merges on a golden corpus") {
    import graft.operators.Bpe
    // vocab: "low" x5, "lower" x2, "newest" x6, "widest" x3  (the
    // classic Sennrich example). Round 1: (e,s)=6+3=9 ties (s,t)=9 →
    // smallest pair string "e|s" wins. Round 2: newest n,e,w,es,t /
    // widest w,i,d,es,t → (es,t)=9 max. Round 3: after "est" forms,
    // (w,e) survives only in lower (=2); max is the (l,o)/(o,w) tie at
    // 5+2=7 → "l|o".
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val got = Bpe.learnMerges(docs, "text", nMerges = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got === Seq((1, "e|s", 9L), (2, "es|t", 9L), (3, "l|o", 7L)))
  }

  test("BPE merge learning is partition-independent") {
    import graft.operators.Bpe
    val docs = Tables.load(spark, sf0001, "documents")
    val a = Bpe.learnMerges(docs, "text", nMerges = 2).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val b = Bpe.learnMerges(docs.repartition(13), "text", nMerges = 2)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(a === b)
  }

  test("bigramLmScore: hand-computed MLE probabilities, ordered fold") {
    import spark.implicits._
    // c2(a,b)=2 c2(b,a)=1 c2(a,c)=1 → c1(a)=3 c1(b)=1
    // doc1 fold: ((0 + 2/3) + 1/1) + 1/3, /3 ; doc2: 2/3 ; doc3 dropped
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = Corpus.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val p_ab = 2.0 / 3.0; val p_ba = 1.0 / 1.0; val p_ac = 1.0 / 3.0
    val want = Seq(
      (1L, 3L, (0.0 + p_ab + p_ba + p_ac) / 3.0),
      (2L, 1L, (0.0 + p_ab) / 1.0))
    assert(got.toSeq === want)
  }

  test("bigramLmScore is partitioning-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b"), (2L, "b c a"), (3L, "c a b c"))
      .toDF("doc_id", "text")
    val once = Corpus.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val again = Corpus.bigramLmScore(docs.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(once === again)
  }
}
