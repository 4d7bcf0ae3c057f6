package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus preparation operators (north-star LLM-pipeline surface;
  * no reference implementation — SURVEY.md §2.10). These are the steps that
  * sit between "deduped documents" and "tensors on a training host":
  * sequence packing, context-window chunking, PII redaction, repetition
  * quality filtering, and incremental batch-vs-corpus dedup (the
  * reference's daily re-extract upsert pattern, `postgres_sync.py:205`,
  * applied to a document corpus instead of a price table).
  *
  * Scale design: chunking / redaction / repetition are pure per-row
  * expression trees — zero shuffle, they pipeline inside the scan's
  * whole-stage codegen at any corpus size. Packing shuffles once on the
  * pack-group key and never builds a global ordering. Incremental dedup is
  * one hash equi-join whose build side is the (small) daily batch.
  */
object Corpus {

  /** Greedy sequence packing: assign documents to fixed token-budget packs.
    *
    * Documents are packed *within* a group key (language/source/shard —
    * packs never straddle groups, which is also what keeps this scalable:
    * the running sum is a window over the group partition, one shuffle,
    * no global total order; at 100 TB pack groups are thousands of
    * (source, shard) cells, each a few GB). Order within a group is the
    * deterministic id order, so re-runs produce identical packs.
    *
    * A document whose tokens cross the boundary opens the next pack
    * (cumulative-sum bucketing): pack_id = floor(tokens_before / budget).
    * Packs can overflow by at most one document — the standard
    * approximation that avoids per-pack sequential state.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    groupCol: String, tokenBudget: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      // NULL text = 0 tokens: without the coalesce a NULL propagates into
      // pack_id and the row lands in a phantom NULL pack
      .select(col(groupCol), col(idCol),
        coalesce(TextOps.tokenCount(col(textCol)), lit(0L)).as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("tokens_before") / tokenBudget))
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
  }

  /** Context-window chunking: overlapping character windows of `size` at
    * `stride` offsets — the retrieval/long-doc-training splitter. Chunk i
    * covers [i*stride, i*stride+size); the last chunk starts at the last
    * stride offset that still lands inside the text. Empty docs yield no
    * chunks. posexplode keeps the offset as chunk_idx (UDTF shape).
    * Per-row generate + substring: no shuffle, scan-pipelined. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val n = length(col(textCol))
    val offsets = when(n > 0,
      sequence(lit(0), floor((n - 1) / stride).cast(IntegerType)))
      .otherwise(array().cast(ArrayType(IntegerType)))
    docs
      // offsets is sequence(0, k) step 1, so the element IS the index —
      // one column serves as both chunk_idx and the substring offset
      .select(col(idCol), col(textCol), explode(offsets).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast(LongType).as("chunk_idx"),
        substring(col(textCol), col("chunk_idx") * stride + 1, lit(size)).as("chunk"))
  }

  /** Email-address pattern shared by the redactor and its tests. Kept to
    * syntax RE2 and java.util.regex agree on (no backrefs/lookaround) so
    * the DuckDB oracle replays it byte-for-byte. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (ids, phone fragments, account numbers). */
  val DigitRunRe = "[0-9]{6,}"

  /** PII redaction: replace emails and long digit runs with typed
    * placeholders and count what was removed (the audit trail a data-
    * governance pass needs). Order matters: emails first, so their
    * digit-bearing local parts don't get half-eaten by the digit rule.
    * Pure regexp expression work — shuffle-free at any scale. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      // NULL text stays NULL, but its audit counts are 0 (nothing removed)
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        DigitRunRe, "<ID>").as("redacted"),
      coalesce(regexp_count(col(textCol), lit(EmailRe)).cast(LongType), lit(0L))
        .as("n_emails"),
      coalesce(regexp_count(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        lit(DigitRunRe)).cast(LongType), lit(0L)).as("n_digit_runs"))

  /** Gopher-style repetition signals: duplicate-word fraction and
    * duplicate-bigram fraction (1 - distinct/total), plus a keep flag.
    * Both are array-expression work over the token list — linear per row,
    * no explode, no shuffle; the whole quality gate runs inside the scan.
    * Exact integer ratios divide reproducibly across engines. */
  /** The three repetition stat columns over a text column — exposed so
    * callers ([[curate]]) can compute them inline in the document scan
    * instead of joining a stats projection back to the corpus. NULL text
    * = 0 tokens (keep=true like the empty doc, not a NULL flag that
    * silently falls out of both keep and drop filters). */
  private def repetitionCols(textCol: String,
                             prefix: String = ""): Seq[org.apache.spark.sql.Column] = {
    val toks = TextOps.tokens(col(textCol))
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast(ArrayType(StringType)))
    def dupFrac(arr: org.apache.spark.sql.Column) =
      when(size(arr) > 0,
        lit(1.0) - size(array_distinct(arr)).cast(DoubleType) /
          size(arr).cast(DoubleType))
        .otherwise(lit(0.0))
    Seq(
      coalesce(size(toks).cast(LongType), lit(0L)).as(s"${prefix}n_tokens"),
      coalesce(dupFrac(toks), lit(0.0)).as(s"${prefix}dup_word_frac"),
      coalesce(dupFrac(bigrams), lit(0.0)).as(s"${prefix}dup_bigram_frac"))
  }

  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      maxDupWordFrac: Double = 0.4,
                      maxDupBigramFrac: Double = 0.25): DataFrame =
    docs.select(col(idCol) +: repetitionCols(textCol): _*)
      .withColumn("keep",
        col("dup_word_frac") <= maxDupWordFrac &&
          col("dup_bigram_frac") <= maxDupBigramFrac)

  /** [[repetitionStats]] that KEEPS the document's own columns — the
    * fused-scan spelling: a caller aggregating volume, token mass, and
    * the repetition gate together pays the tokenizer ONCE on one scan
    * instead of once per projection. Appends `n_tokens`,
    * `dup_word_frac`, `dup_bigram_frac`, `keep`. */
  def repetitionAugmented(docs: DataFrame, textCol: String,
                          maxDupWordFrac: Double = 0.4,
                          maxDupBigramFrac: Double = 0.25): DataFrame =
    docs.select(col("*") +: repetitionCols(textCol): _*)
      .withColumn("keep",
        col("dup_word_frac") <= maxDupWordFrac &&
          col("dup_bigram_frac") <= maxDupBigramFrac)

  /** End-to-end curation pipeline — the operators of this module plus
    * dedup/decontamination composed the way a real corpus build chains
    * them: repetition quality gate → exact content dedup (keep min id) →
    * n-gram decontamination against an eval set → deterministic per-group
    * cap. Returns the per-group summary (docs kept, tokens kept).
    *
    * Every stage keeps its individual scale shape: the gate is scan-local
    * expression work; dedup is one window keyed on the content digest;
    * decontamination broadcasts the eval shingle set and shuffles only
    * (id, 8-byte shingle hash) pairs; the cap is one window over the
    * group key. Nothing in the composition adds a shuffle a standalone
    * stage wouldn't pay, and no stage ever cross-joins or collects.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             groupCol: String, evalSet: DataFrame, capPerGroup: Int,
             minTokens: Int = 10, maxDupWordFrac: Double = 0.4,
             maxDupBigramFrac: Double = 0.25): DataFrame = {
    // the gate stats are pure per-row expressions, so they are computed
    // INLINE on the document scan — joining a stats projection back to
    // the corpus would shuffle the whole table by id for no reason.
    // Stat columns carry a reserved internal prefix so an input that
    // already has n_tokens/dup_*_frac columns can't collide ambiguously.
    require(!docs.columns.exists(_.startsWith("__graft_")),
      "curate reserves the __graft_ column prefix")
    // exact dedup FIRST: keep the smallest id per content group. The
    // window is keyed on the 256-bit content hash, not the text: same
    // groups (the oracle partitions by text — collision-free at any
    // feasible corpus size), but the shuffle sorts/compares 64-char
    // digests instead of arbitrarily long documents.
    val dedupW = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    // EXPLICIT width on the content-hash exchange: it satisfies the
    // window's required distribution (no second exchange) and, unlike
    // the implicit window shuffle, an explicit repartition width is
    // never AQE-coalesced — the byte-small corpus would land on ONE
    // post-shuffle task and serialize the gate's tokenize CPU behind it
    val deduped0 = docs.repartition(32, sha2(col(textCol), 256))
      .withColumn("dup_rn", row_number().over(dedupW))
      .filter(col("dup_rn") === 1).drop("dup_rn")
    // the repetition gate runs AFTER the dedup window — result-identical
    // (the predicate is a pure function of the text, so every copy in a
    // content group passes or fails together and the min-id owner is
    // unchanged) but the tokenize-heavy stats now (a) compute on dedup
    // SURVIVORS only and (b) run distributed on the window shuffle's
    // partitions instead of the corpus scan's input splits — probed at
    // sf0.1, the gate was a 0.58 s single-task stage when it ran on the
    // one-split scan before any exchange.
    // materialized once: BOTH the contamination probe and the clean-set
    // anti join consume this relation — without the checkpoint each
    // branch re-runs the gate + dedup window over the whole corpus (the
    // same double-compute Components paid before its round-3 fix)
    val deduped = deduped0
      .select(col("*") +: repetitionCols(textCol, prefix = "__graft_"): _*)
      .filter(col("__graft_dup_word_frac") <= maxDupWordFrac &&
        col("__graft_dup_bigram_frac") <= maxDupBigramFrac &&
        col("__graft_n_tokens") >= minTokens)
      .drop("__graft_dup_word_frac", "__graft_dup_bigram_frac")
      .localCheckpoint(true)
    val contaminated = TextDedup.decontaminate(
      deduped, evalSet, idCol, textCol, shingleLen = 4)
      .select(idCol)
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")
    val capW = Window.partitionBy(groupCol)
      .orderBy(graft.ops.Sampling.shaHash60(col(idCol)), col(idCol))
    clean.withColumn("cap_rn", row_number().over(capW))
      .filter(col("cap_rn") <= capPerGroup)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__graft_n_tokens")).as("n_tokens"))
  }

  /** Incremental dedup: drop batch rows whose content already exists in
    * the corpus — the daily-re-extract guard (reference skips symbols
    * whose watermark is current; a corpus skips documents whose text it
    * already holds). Left-anti hash join on the 60-bit sha content key:
    * the batch (small, one day's crawl) is the streamed side and Spark
    * broadcasts the smaller side under AQE; corpus text never moves, only
    * its 8-byte hashes. NULL text hashes to a NULL key, which matches
    * nothing under join equality — NULL-text batch rows are always kept
    * (standard SQL comparison semantics; filter them upstream if NULLs
    * should dedup). */
  def dedupAgainstCorpus(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String): DataFrame = {
    // 60-bit sha content key (first 15 hex chars of sha256, base-16) —
    // the repo-wide cross-engine hash (see graft.functions.Sha60): an
    // 8-byte shuffle key the DuckDB oracle reproduces bit-for-bit.
    val key = conv(substring(sha2(col(textCol), 256), 1, 15), 16, 10)
      .cast(LongType)
    val corpusKeys = corpus.select(key.as("content_key")).distinct()
    batch.withColumn("content_key", key)
      .join(corpusKeys, Seq("content_key"), "left_anti")
      .drop("content_key")
  }

  /** Bigram language-model plausibility score per document — the
    * model-based quality gate of CCNet/Wenzek LREC'20 (there: a KenLM
    * 5-gram; here: a bigram MLE learned from the corpus itself, the same
    * count machinery at n=2). p(w₂|w₁) = c(w₁w₂)/c(w₁·) from two
    * aggregates over the corpus bigram stream; a document's score is the
    * MEAN conditional probability of its bigrams (the arithmetic-mean
    * surrogate for per-token perplexity: every p is an exact int/int
    * double division and the sum folds in position order, so the score —
    * unlike a log-prob sum, whose `ln` is not exact-rounded — replays
    * bit-for-bit on any ANSI engine).
    *
    * Shuffle shape: bigram-count exchange on (w₁,w₂), prefix-count
    * re-aggregate on w₁ (model-sized, ≪ corpus), doc-bigrams ⋈ model on
    * (w₁,w₂), one doc-key exchange for the ordered fold. At web scale the
    * model table is Zipf-headed — AQE skew-splits the join, and a
    * min-count prune (drop c₂ = 1 hapax bigrams) bounds it the way real
    * LM quality filters do; the fixture keeps every bigram so the oracle
    * replays the full model. */
  def bigramLmScore(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    // width pinned before the CPU-bound tokenize+explode (the one-split
    // corpus scan would otherwise run it on a single core, and every
    // downstream map-side partial aggregate inherits this width)
    val withTk = docs.repartition(32)
      .select(col(idCol).as("doc_id"),
        graft.functions.TextOps.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = withTk
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(tk) - 2)," +
          " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")))
      .select(col("doc_id"), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val model = c2
      .join(c2.groupBy("w1").agg(sum("c2").as("c1")), "w1")
      .select(col("w1"), col("w2"),
        (col("c2").cast(DoubleType) / col("c1").cast(DoubleType)).as("p"))
    pairs.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(array_sort(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")).as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("psum") / col("n_bigrams").cast(DoubleType)).as("score"))
  }
}
