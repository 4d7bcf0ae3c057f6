package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-encoding merge LEARNING (Sennrich et al., ACL'16) — the
  * tokenizer-training step that q92/q140's encode queries take as given.
  * Classic BPE over a word-frequency vocabulary: start from character
  * sequences, repeatedly (1) count adjacent symbol pairs weighted by
  * word frequency, (2) pick the most frequent pair (ties → smallest
  * pair string), (3) fuse that pair left-to-right in every sequence.
  *
  * Distribution shape: the vocabulary (distinct word, freq) is the
  * working set — pre-aggregated once, so corpus size only enters through
  * that first word-count; each round pays ONE pair-count aggregate
  * (map-side combined, ≤ |symbol-pairs| rows) whose argmax row — a
  * single (pair, cnt) — comes back to the driver as the next round's
  * plan parameter (the q92-vocabulary / k-means-centroid pattern).
  * Merge application is a row-local fold inside the scan: no join, no
  * shuffle, no explode at rest.
  *
  * Cross-engine exactness: symbols stay lowercase-ASCII (`^[a-z]+$`
  * words only — character splitting is code-unit-ambiguous beyond
  * ASCII), pair counts are positional (overlapping pairs in "aaa"
  * count twice — both engines count the same way), weights are bigint
  * sums, and the left-to-right fuse is an identical fold in Spark
  * `aggregate` and DuckDB `list_reduce`.
  */
object Bpe {

  /** lowercase-ASCII vocabulary: (word, freq), the BPE working set */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** split a word into single-character symbols */
  private def charSeq(word: Column): Column =
    filter(split(word, ""), c => c =!= lit(""))

  /** adjacent-pair keys "a|b" of a symbol sequence ('|' never occurs in
    * a symbol: symbols are concatenations of [a-z] chars) */
  private def pairKeys(seq: Column): Column =
    when(size(seq) >= 2,
      transform(sequence(lit(1), size(seq) - 1),
        i => concat(element_at(seq, i), lit("|"), element_at(seq, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** fuse every left-to-right (a, b) adjacency into the symbol a+b —
    * a fold: append x unless the accumulator ends with `a` and x is `b`,
    * in which case the tail is replaced by the fused symbol. (The fused
    * symbol can itself fuse with a LATER b, exactly like reference BPE's
    * greedy scan.) */
  private def applyMerge(seq: Column, a: String, b: String): Column =
    aggregate(seq, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learns `nMerges` merges; returns one row per learned merge:
    * (step starting at 1, pair "a|b", cnt = its weighted pair count). */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"need at least one merge, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var seqs = vocab(docs, textCol)
      .select(col("freq"), charSeq(col("word")).as("seq"))
    val learned = Seq.newBuilder[(Int, String, Long)]
    for (step <- 1 to nMerges) {
      // ONE aggregate: weighted positional pair counts, argmax to driver
      val Array(pair: String, cnt: Long) = seqs
        .select(col("freq"), explode(pairKeys(col("seq"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect().headOption.map(r => Array[Any](r.getString(0), r.getLong(1)))
        .getOrElse(Array[Any]("", 0L))
      if (pair.nonEmpty) {
        learned += ((step, pair, cnt))
        val Array(a, b) = pair.split('|')
        seqs = seqs.select(col("freq"), applyMerge(col("seq"), a, b).as("seq"))
          .localCheckpoint(true) // truncate the per-round fold lineage
      }
    }
    learned.result().toDF("step", "pair", "cnt")
  }
}
