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
  *     cutting the candidate space quadratically).
  */
object TextDedup {

  // 2^31 - 1: keeps (h mod p) * a + b far below 2^63 so the expression tree
  // never overflows under ANSI mode (p=2^61-1 would need 128-bit mults).
  private val MersennePrime = 2147483647L

  /** Per-document minhash signature rows: (id, band, bucket).
    *
    * k minhashes from one base 64-bit hash per shingle via the usual
    * (a_i * h + b_i) mod p family; signature split into `bands` bands of
    * `rowsPerBand` hashes; each band hashed to one bucket value.
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val toks = TextOps.tokens(col(textCol))
    // 3-word shingles: slice windows out of the token array (expression-tree,
    // no UDF); xxhash64 gives the 64-bit base hash per shingle.
    val shingles = transform(
      sequence(lit(1), greatest(size(toks) - (shingleLen - 1), lit(1))),
      i => xxhash64(concat_ws(" ", slice(toks, i, lit(shingleLen)))))
    val minhashes = (0 until k).map { i =>
      val a = 2 * i + 1
      val b = 7919 * (i + 1)
      array_min(transform(shingles,
        h => pmod(pmod(h, lit(MersennePrime)) * lit(a.toLong) + lit(b.toLong),
          lit(MersennePrime)))).as(s"mh_$i")
    }
    val sig = docs.select(col(idCol), array(minhashes: _*).as("sig"))
    val bandRows = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandRows: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from LSH banding, verified with exact Jaccard over
    * distinct word sets; keeps pairs with jaccard >= threshold. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, shingleLen: Int = 3,
                      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val bb = minhashBands(docs, idCol, textCol, shingleLen, bands, rowsPerBand)
    val l = bb.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val r = bb.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val words = docs.select(col(idCol),
      array_distinct(TextOps.tokens(col(textCol))).as("ws"))
    candidates
      .join(words.select(col(idCol).as("id_a"), col("ws").as("ws_a")), Seq("id_a"))
      .join(words.select(col(idCol).as("id_b"), col("ws").as("ws_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardExpr(col("ws_a"), col("ws_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** |A ∩ B| / |A ∪ B| over distinct-element arrays, as exact integer
    * counts divided in double (cross-engine bit-stable). */
  def jaccardExpr(wsA: org.apache.spark.sql.Column, wsB: org.apache.spark.sql.Column) = {
    val inter = size(array_intersect(wsA, wsB)).cast(DoubleType)
    val union = (size(wsA) + size(wsB)).cast(DoubleType) - inter
    inter / union
  }

  /** Exact Jaccard pairs blocked by distinct-token-count band: documents
    * land in bucket floor(|words| / bandWidth) and are compared within a
    * bucket only. */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, bandWidth: Int = 8): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
      array_distinct(TextOps.tokens(col(textCol))).as("ws"))
      .withColumn("bucket", floor(size(col("ws")) / bandWidth))
    val a = words.select(col("id").as("id_a"), col("ws").as("ws_a"), col("bucket"))
    val b = words.select(col("id").as("id_b"), col("ws").as("ws_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardExpr(col("ws_a"), col("ws_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash per document: for each bit position, sum +1/-1 votes
    * from each token's xxhash64; bit set iff the vote is positive.
    * Implemented as explode + 64 sum-aggregates so Spark's partial (map-
    * side) hash aggregation does the voting before any shuffle — at 100 TB
    * the shuffle carries one 64-long row per (doc, partition), not tokens. */
  def simhashDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
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
