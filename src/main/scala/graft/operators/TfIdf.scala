package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Sparse TF-IDF document similarity over 3-token shingles (q199's
  * core, factored for the ScaleProbe).
  *
  * Integer-exact by construction: tf is a count, idf is the quantized
  * surrogate (n_docs·1000) DIV df (no transcendental log — replays on
  * any engine), weights/norms/dot products are exact BIGINT sums, and
  * the only floating-point ops are one sqrt·sqrt product and one
  * division per surviving pair.
  *
  * Scale shape: the pair join is blocked on the shingle itself. The df
  * cap (df·5 < n_docs) bounds per-shingle fan-out, so candidate mass is
  * Σ df² over RARE shingles — shared boilerplate (high df) never joins,
  * and df=1 shingles (most of any real corpus) still count toward norms
  * but produce no pairs. The probe tracks that candidate count against
  * corpus replication.
  */
object TfIdf {

  /** (doc_id, doc_id, sim) for every doc pair sharing ≥1 rare shingle,
    * doc_a < doc_b, sim = exact-integer cosine in [0, 1]. */
  def pairSims(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    // Spread the shingle hashing across all cores (TextDedup.widen: a
    // small fixture arrives as 1-2 parquet splits and would hash
    // serially; at real scale the scan already has >> parallelism
    // splits and this is a no-op).
    val target = docs.sparkSession.sparkContext.defaultParallelism
    val wideDocs = TextDedup.widen(docs)
    val ts = graft.functions.TextOps.tokens(col(textCol))
    val sh = wideDocs.select(col(idCol).as("doc_id"), ts.as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("ts")) - 2), i =>
          concat_ws(" ", element_at(col("ts"), i),
            element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))))
        .as("sh"))
    // tf feeds TWO consumers (the df aggregate and the weight join);
    // unpinned, each re-runs the shingle explode + sha hashing — the
    // most expensive scalar work in the plan (same boundary-pinning
    // rationale as containmentPairs' tok persist).
    val tf = sh.groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfc = tf.groupBy("sh").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    // The weight relation feeds FOUR consumers (both sides of the pair
    // join and both norm joins); without materialization each one
    // re-executes the whole shingle→tf→df chain. One executor-local
    // checkpoint of the narrow (doc, sh, df, w) projection collapses
    // the plan to a single upstream pass — the same boundary-pinning
    // move Ranking.withGlobalRank documents.
    val w = tf.join(dfc, "sh").crossJoin(broadcast(nd))
      .where(col("df") * 5 < col("n_docs"))
      .select(col("doc_id"), col("sh"), col("df"),
        (col("tf") * expr("(n_docs * 1000) DIV df")).as("w"))
      .localCheckpoint(true)
    tf.unpersist() // w is materialized; the hash pass is paid exactly once
    // Norms and dots accumulate in DECIMAL(38,0), not BIGINT: a df=1
    // shingle at 100k docs weighs ~1e8, so w² ≈ 1e16 per term and a doc
    // with ~900+ unique rare shingles would wrap past 2^63 under Spark's
    // non-ANSI BIGINT sum (silent negative n2 → NaN sim), while DuckDB's
    // HUGEINT sum stays exact — breaking parity. DECIMAL(38,0) matches
    // the oracle's exactness up to 1e38 (≫ any realistic corpus: w² ≤
    // 8e37 per term requires w ≤ 9e18, i.e. n_docs·1000·tf at the BIGINT
    // edge; Σ over a doc's shingles has 21 orders of headroom).
    val wd = col("w").cast(DecimalType(19, 0))
    val norm = w.groupBy("doc_id")
      .agg(sum(wd * wd).cast(DecimalType(38, 0)).as("n2"))
    // Explicit-width repartition on the join key: the pair join is
    // CPU-quadratic per shingle block but small in BYTES, so AQE's
    // size-based coalescing squeezes it onto a few cores; a
    // user-specified width is preserved, and both aliases of the same
    // partitioned child make the self-join exchange-free.
    val p = w.where(col("df") >= 2).repartition(target, col("sh"))
    val dot = p.select(col("doc_id").as("doc_a"), col("sh"),
        col("w").as("wa"))
      .join(p.select(col("doc_id").as("doc_b"), col("sh"),
        col("w").as("wb")), "sh")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("wa").cast(DecimalType(19, 0)) *
        col("wb").cast(DecimalType(19, 0)))
        .cast(DecimalType(38, 0)).as("dot"))
    dot
      .join(norm.select(col("doc_id").as("doc_a"), col("n2").as("na2")),
        "doc_a")
      .join(norm.select(col("doc_id").as("doc_b"), col("n2").as("nb2")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("dot").cast(DoubleType) /
          (sqrt(col("na2").cast(DoubleType)) *
            sqrt(col("nb2").cast(DoubleType)))).as("sim"))
  }
}
