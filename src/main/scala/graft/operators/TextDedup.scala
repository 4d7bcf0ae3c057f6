package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection over a documents table (north-star LLM-pipeline
  * operators; no reference implementation — see SURVEY.md §2.10).
  *
  * Three families, all designed so the expensive pairwise comparison only
  * happens *within buckets*, never as a global cross join:
  *
  *   - MinHash + LSH banding: shingle → k minhashes → b bands; documents
  *     sharing any band bucket become candidate pairs; candidates are
  *     verified with exact Jaccard. At 100 TB: shingling + minhashing are
  *     narrow (scan-local); the only shuffles are the band-bucket
  *     self-join (keys are (band, 64-bit bucket hash) — tiny rows) and the
  *     final verify. Classic MMDS ch.3 construction.
  *   - SimHash: 64-bit fingerprint whose Hamming distance tracks cosine
  *     similarity of the token multiset; grouping by the fingerprint (or
  *     by rotations of it) finds near-dups with zero pairwise work.
  *   - Bucketed n-gram Jaccard: exact Jaccard over distinct word sets,
  *     blocked by distinct-token-count band (a true near-dup pair has
  *     similar vocabulary size, so blocking loses little recall while
  *     cutting the candidate space quadratically). Right when qualifying
  *     pairs dominate the bands (dense template corpora — the fixtures);
  *     sparse corpora route to the minhash path, whose candidates scale
  *     with true matches instead of band sizes.
  */
object TextDedup {

  // 2^31 - 1: keeps (h mod p) * a + b far below 2^63 so the expression tree
  // never overflows under ANSI mode (p=2^61-1 would need 128-bit mults).
  private val MersennePrime = 2147483647L

  /** Ensure CPU-heavy per-row work (sha rounds, shingling, minhash walks)
    * has at least one task per core. A small corpus arrives as one file →
    * one scan partition → one task, serializing the whole hash pipeline;
    * repartitioning a few thousand raw rows is free next to the hashing it
    * parallelizes. At real scale the scan already has ≫ parallelism
    * splits and this is a no-op (no shuffle inserted). */
  private def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Distinct hashed `shingleLen`-word shingles per document: one 64-bit
    * xxhash64 per sliding window over the token array (expression-tree, no
    * UDF). Hashing up front means every downstream set operation
    * (minhash, exact-Jaccard verify) runs on longs, not strings — and at
    * 100 TB the shingle arrays, not the raw text, are all that flows
    * through the pipeline. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  shingleLen: Int): DataFrame =
    docs.select(col(idCol),
      graft.functions.ShingleHash(col(textCol), shingleLen).as("sh"))

  /** Shingle hashes every ANSI-SQL engine reproduces bit-for-bit: the
    * first 15 hex chars (60 bits) of sha256 over the space-joined
    * shingle, parsed as a BIGINT. Production paths use [[shingleSets]]
    * (xxhash64 — one multiply per word instead of a sha round); this form
    * exists so the MinHash pipeline can be oracle-verified end-to-end
    * ([[minhashNearDupsVerifiable]]). */
  def shingleSetsSha(docs: DataFrame, idCol: String, textCol: String,
                     shingleLen: Int): DataFrame =
    docs.select(col(idCol),
      graft.functions.ShingleHashSha(col(textCol), shingleLen).as("sh"))

  /** Expression-tree form of [[shingleSetsSha]]; kept as the pure-built-in
    * reference for equivalence tests (the native form exists because this
    * tree's Janino compile dominates small-corpus wall clock). */
  def shingleSetsShaHof(docs: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val shingles = transform(
      sequence(lit(1), greatest(size(toks) - (shingleLen - 1), lit(1))),
      i => conv(substring(sha2(concat_ws(" ", slice(toks, i, lit(shingleLen))), 256),
        1, 15), 16, 10).cast(LongType))
    docs.select(col(idCol), array_distinct(shingles).as("sh"))
  }

  /** Expression-tree form of [[shingleSets]] (4 nested higher-order
    * functions — seconds of Janino compile per embedding plan); kept as
    * the pure-built-in reference for equivalence tests. */
  def shingleSetsHof(docs: DataFrame, idCol: String, textCol: String,
                     shingleLen: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val shingles = transform(
      sequence(lit(1), greatest(size(toks) - (shingleLen - 1), lit(1))),
      i => xxhash64(concat_ws(" ", slice(toks, i, lit(shingleLen)))))
    docs.select(col(idCol), array_distinct(shingles).as("sh"))
  }

  /** Per-document minhash signature rows: (id, band, bucket).
    *
    * k minhashes from the base shingle hashes via the usual
    * (a_i * h + b_i) mod p family; signature split into `bands` bands of
    * `rowsPerBand` hashes; each band hashed to one bucket value.
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame =
    bandsOfShingles(shingleSets(docs, idCol, textCol, shingleLen), idCol,
      bands, rowsPerBand)

  /** k-minhash signature, expression-tree form: k re-walks of the shingle
    * array. Kept as the pure-built-in reference for tests; hot paths use
    * the native [[graft.functions.MinHashSig]] (identical values). */
  def minhashSigHof(sh: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    array((0 until k).map { i =>
      val a = 2 * i + 1
      val b = 7919 * (i + 1)
      array_min(transform(sh,
        h => pmod(pmod(h, lit(MersennePrime)) * lit(a.toLong) + lit(b.toLong),
          lit(MersennePrime))))
    }: _*)

  private def bandsOfShingles(sets: DataFrame, idCol: String,
                              bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val sig = sets.select(col(idCol),
      graft.functions.MinHashSig(col("sh"), k).as("sig"))
    val bandRows = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandRows: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from LSH banding, verified with exact Jaccard over
    * the same distinct shingle sets the signatures were built from (the
    * self-consistent MinHash pipeline: LSH approximates exactly the
    * quantity the verifier computes); keeps pairs >= threshold.
    *
    * Shingle length is the selectivity lever: 1-word shingles degrade to
    * bag-of-words (documents from a small vocabulary all collide and LSH
    * degenerates to all-pairs); 3-word shingles keep sequences distinctive
    * so candidate volume tracks true near-dups. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, shingleLen: Int = 3,
                      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    // The shingle sets feed three plan branches (banding + both sides of
    // candidate verification); Spark cannot share subplans across
    // branches, so without an explicit persist the tokenize+shingle tree
    // is re-evaluated (and re-codegen'd) three times. MEMORY_AND_DISK:
    // spills rather than recomputes at scale.
    val sets = shingleSets(widen(docs), idCol, textCol, shingleLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = bandsOfShingles(sets, idCol, bands, rowsPerBand)
    val l = bb.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val r = bb.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val pairs = candidates
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardExpr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // Materialize the (small) survivor set eagerly, then release the cached
    // shingle sets — without this, repeated invocations (Bench runs every
    // query in one session) accumulate cache blocks for the session's
    // lifetime. The checkpointed result's own blocks are reclaimed by the
    // ContextCleaner once the returned frame is unreachable.
    val out = pairs.localCheckpoint(true)
    sets.unpersist()
    out
  }

  /** [[minhashNearDups]] with every engine-specific hash swapped for a
    * cross-engine-reproducible one, so the full LSH pipeline — shingle →
    * k-minhash → band bucket → candidate join → exact-Jaccard verify —
    * hash-matches an ANSI-SQL oracle instead of getting a rows-only
    * check. Two substitutions: shingles via [[shingleSetsSha]], and the
    * band bucket is the band's minhash values themselves joined as a
    * string (no 64-bit band hash; the key is a few bytes longer, the
    * candidate set is identical). Same shuffle structure and scale
    * behavior as the production form. */
  def minhashNearDupsVerifiable(docs: DataFrame, idCol: String, textCol: String,
                                threshold: Double = 0.5, shingleLen: Int = 3,
                                bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val sets = shingleSetsSha(widen(docs), idCol, textCol, shingleLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = bands * rowsPerBand
    val sig = sets.select(col(idCol),
      graft.functions.MinHashSig(col("sh"), k).as("sig"))
    val bandRows = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", transform(
          slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string"))).as("bucket"))
    }
    val bb = sig.select(col(idCol), explode(array(bandRows: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    val l = bb.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val r = bb.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val pairs = candidates
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardExpr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val out = pairs.localCheckpoint(true)
    sets.unpersist()
    out
  }

  /** Benchmark decontamination (north-star): flag training documents that
    * share any `shingleLen`-word shingle with an evaluation/benchmark set
    * — the standard n-gram-overlap test-set-contamination check run
    * before every training run. Returns (id, n_hits) for contaminated
    * docs, n_hits = how many distinct shingles of the doc appear in the
    * benchmark set.
    *
    * Plan shape at 100 TB: both sides reduce to hashed shingles at the
    * scan (narrow, sha-60 for oracle parity); the benchmark side is tiny
    * (an eval suite) → its distinct shingle set broadcasts, and the check
    * is a broadcast join against the exploded training shingles — no
    * shuffle of the corpus. Zero-token docs are excluded on both sides
    * (their degenerate empty-window hash would cross-match all of them). */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, shingleLen: Int = 5): DataFrame = {
    // zero-token exclusion via trim (equivalent to tokens>0, but avoids a
    // second full tokenization in the filter predicate — ShingleHashSha
    // already tokenizes once inside its fused loop)
    def shingles(df: DataFrame) = widen(df.filter(length(trim(col(textCol))) > 0))
      .select(col(idCol),
        graft.functions.ShingleHashSha(col(textCol), shingleLen).as("sh"))
    val t = shingles(train).select(col(idCol), explode(col("sh")).as("h"))
    val b = shingles(bench).select(explode(col("sh")).as("h")).distinct()
    t.join(broadcast(b), Seq("h"))
      .groupBy(idCol).agg(countDistinct(col("h")).as("n_hits"))
  }

  /** |A ∩ B| / |A ∪ B| over distinct-element arrays, as exact integer
    * counts divided in double (cross-engine bit-stable). Two empty sets
    * yield 0.0, not 0/0 = NaN — NaN compares greatest under Spark/DuckDB
    * ordering semantics and would make empty docs spurious "duplicates". */
  def jaccardExpr(wsA: org.apache.spark.sql.Column, wsB: org.apache.spark.sql.Column) = {
    val inter = size(array_intersect(wsA, wsB)).cast(DoubleType)
    val union = (size(wsA) + size(wsB)).cast(DoubleType) - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Exact Jaccard pairs blocked by distinct-token-count band: documents
    * land in bucket floor(|words| / bandWidth) and are compared within a
    * bucket only. */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, bandWidth: Int = 8): DataFrame = {
    // Zero-token documents are excluded (here AND in the bitset form, so the
    // two plans stay value-identical): an empty word set has Jaccard 0 to
    // everything, so it can never be a near-dup pair member.
    val words = widen(docs).select(col(idCol).as("id"),
      array_distinct(TextOps.tokens(col(textCol))).as("ws"))
      .filter(size(col("ws")) > 0)
      .withColumn("bucket", floor(size(col("ws")) / bandWidth))
    val a = words.select(col("id").as("id_a"), col("ws").as("ws_a"), col("bucket"))
    val b = words.select(col("id").as("id_b"), col("ws").as("ws_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardExpr(col("ws_a"), col("ws_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard pairs via a vocabulary bitmap: identical semantics to
    * [[jaccardNearDups]], different physical plan. Each document's
    * distinct word set becomes a fixed-width bitmask over a dense
    * vocabulary id space, so the per-pair intersection is
    * `Σ bit_count(a & b)` over a handful of longs instead of a string
    * array intersect — an order of magnitude cheaper when millions of
    * candidate pairs share a small vocabulary.
    *
    * Scale notes: dense vocab ids come from two-phase range-partitioned
    * ranking ([[Ranking.withGlobalRank]]) — no single-partition window
    * anywhere in this plan; the bounds are the broadcast word→id map
    * (fine to ~10^7 vocab — beyond that drop the broadcast hint and let
    * the map-side join shuffle) and the nSlots mask width (10^7 vocab →
    * ~1.2 MB masks). Candidate generation stays banded ALL-PAIRS by
    * design: on near-dup-dense corpora like the fixtures, ~80% of
    * within-band pairs pass the t=0.6 verify, so candidates ≈ output and
    * no candidate filter can win — a rarest-first prefix filter
    * (Bayardo WWW'07) was measured here at 9× candidate-row duplication
    * with <1% candidate reduction, because template corpora share their
    * "rare" tokens across whole clusters. For SPARSE corpora (real webtext
    * at scale, where qualifying pairs ≪ band pairs) route to
    * [[minhashNearDups]]: its band-bucket equi-join generates candidates
    * proportional to true matches, needs no global ids, and its verify is
    * the same exact-Jaccard predicate. */
  def jaccardNearDupsBitset(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double, bandWidth: Int = 8): DataFrame = {
    // filter matches jaccardNearDups: zero-token docs are excluded there,
    // and would otherwise silently vanish here anyway (explode emits no
    // rows) — make the exclusion explicit and identical in both forms.
    val words = widen(docs).select(col(idCol).as("id"),
      array_distinct(TextOps.tokens(col(textCol))).as("ws"))
      .filter(size(col("ws")) > 0)
    val tok = words.select(col("id"), explode(col("ws")).as("w"))
    val byWord = tok.select("w").distinct()
    // ordered ids are not semantically required (any bijection works) —
    // ranking just keeps the mask layout deterministic for the spec tests
    val vocab = Ranking.withGlobalRank(byWord, "__rk", "__V", col("w").asc)
      .select(col("w"), (col("__rk") - 1).cast(IntegerType).as("wid"))
    val vocabSize = byWord.count().toInt // plan parameter: mask width
    val nSlots = (vocabSize + 63) / 64
    // doc → wid list → bitmask array<long> of width nSlots: one native
    // pass (O(nSlots + |wids|)); the HOF form re-walked the wid list per
    // slot — see BitsetOf (equivalence asserted in tests)
    val masks = tok.join(broadcast(vocab), Seq("w"))
      .groupBy("id").agg(collect_set(col("wid")).as("wids"))
      .select(col("id"), size(col("wids")).as("n"),
        graft.functions.BitsetOf(col("wids"), nSlots).as("mask"))
      .withColumn("bucket", floor(col("n") / bandWidth))
      // both sides of the self-join read these masks; persist so the
      // explode+join+bitmask build runs (and compiles) once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = masks.select(col("id").as("id_a"), col("n").as("n_a"),
      col("mask").as("m_a"), col("bucket"))
    val b = masks.select(col("id").as("id_b"), col("n").as("n_b"),
      col("mask").as("m_b"), col("bucket"))
    // native fused popcount loop — the HOF form
    // aggregate(zip_with(..., bit_count(x & y))) is value-identical but
    // allocates lambda frames per slot per candidate pair (see BitAndCount).
    val inter = graft.functions.BitAndCount(col("m_a"), col("m_b"))
      .cast(DoubleType)
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__i", inter)
      .withColumn("jaccard",
        col("__i") / ((col("n_a") + col("n_b")).cast(DoubleType) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // same cache discipline as minhashNearDups: materialize survivors,
    // release the mask cache.
    val out = pairs.localCheckpoint(true)
    masks.unpersist()
    out
  }

  /** SimHash near-dup pairs: candidates share at least one of four
    * 16-bit bands of the fingerprint (pigeonhole: any pair within
    * Hamming distance 3 must agree on ≥1 band), then verified with the
    * exact popcount of the XOR. The classic Manku/Jain/Sarma (WWW'07)
    * banding scheme — candidate generation is an equi-join on a 16-bit
    * key, never an all-pairs scan. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = simhashDocs(widen(docs), idCol, textCol)
    val banded = sh.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("bits"))): _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.band"), col("bb.bits"))
    val l = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("bits"))
    val r = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("bits"))
    l.join(r, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** 64-bit SimHash per document — native per-row expression
    * ([[graft.functions.SimHash64]]): zero shuffle, one loop. */
  def simhashDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      graft.functions.SimHash64(col(textCol)).as("simhash"))

  /** Per-token-occurrence 60-bit sha-derived hashes (multiset — simhash
    * voting weights repeated tokens). Same cross-engine hash construction
    * as [[shingleSetsSha]]; stays an expression tree (sha2 + conv are
    * codegen'd built-ins). */
  def shaTokenHashes(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(TextOps.tokens(text),
      t => conv(substring(sha2(t, 256), 1, 15), 16, 10).cast(LongType))

  /** [[simhashDocs]] with the engine-private xxhash64 swapped for the
    * sha-derived 60-bit token hash, so the fingerprint — and everything
    * built on it — hash-matches an ANSI-SQL oracle. Production stays
    * [[simhashDocs]] (xxhash64 is one multiply-rotate per token vs a sha
    * round); the plan shape (pure per-row map, zero shuffle) is identical. */
  def simhashDocsVerifiable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      graft.functions.SimHashSha(col(textCol)).as("simhash"))

  /** [[simhashNearDups]] over the verifiable 60-bit fingerprint: four
    * 15-bit bands (pigeonhole guarantee holds for Hamming ≤ 3), exact
    * XOR-popcount verify. Same candidate-generation equi-join structure as
    * the production form. */
  def simhashNearDupsVerifiable(docs: DataFrame, idCol: String, textCol: String,
                                maxHamming: Int = 3): DataFrame = {
    val sh = simhashDocsVerifiable(widen(docs), idCol, textCol)
    val banded = sh.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 15)
            .bitwiseAND(lit(0x7FFFL)).as("bits"))): _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.band"), col("bb.bits"))
    val l = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("bits"))
    val r = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("bits"))
    l.join(r, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Explode + 64-sum-aggregate formulation of the same fingerprint;
    * kept as the pure-built-in reference for equivalence tests (it
    * shuffles vote rows and compiles a 64-aggregate class — the native
    * form exists because of exactly that cost). */
  def simhashDocsAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val voteAggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L))).as(s"v_$i")
    }
    val votes = tok.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"v_$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col(idCol), sim.as("simhash"))
  }
}
