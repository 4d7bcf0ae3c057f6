package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a seeded RNG *per partition*, so the selected
  * set changes with partitioning/task retries — unacceptable when the
  * sample defines a training corpus that must be reproducible. The
  * hash-threshold form instead derives a stable per-row "coin" from a
  * content key: `sha2(key) mod 100 < rate`. The same rows are chosen on
  * every engine, every partitioning, every rerun, and the predicate
  * pipelines inside whole-stage codegen at the scan (no shuffle, no
  * state). Stratification = a per-stratum rate expression.
  */
object Sampling {

  /** 60-bit sha-derived hash of a key column (cross-engine reproducible:
    * `('0x' || substr(sha256(k),1,15))::BIGINT` in DuckDB). */
  def shaHash60(key: Column): Column =
    conv(substring(sha2(key.cast(StringType), 256), 1, 15), 16, 10).cast(LongType)

  /** Keep rows where hash(key) mod 100 < ratePercent(row). */
  def stratifiedSample(df: DataFrame, key: Column, ratePercent: Column): DataFrame =
    df.filter(pmod(shaHash60(key), lit(100L)) < ratePercent)

  /** Temperature-scaled source mixing — the α-sampling rule of
    * multilingual/multi-source LM training (sample source s ∝ n_s^α,
    * α = 1/2: rare sources upsampled relative to their natural share,
    * head sources capped), materialized as deterministic hash-threshold
    * keep-predicates. Per source: weight √n_s, target take
    * (√n_s/Σ√n)·⌊budgetFrac·N⌋, rate capped at 1, threshold
    * ⌊rate·10⁶⌋ against sha-60(id) mod 10⁶.
    *
    * The per-source count table is a bounded plan parameter (one
    * map-side-combined aggregate, |sources| rows — the vocab-collect
    * discipline); Σ√n folds in source-name order on the driver so the
    * double sum is partition-independent and replays as an ordered
    * `list_reduce`. The apply pass is ONE conditional-aggregation scan
    * (no filter + second pass); the keep decision is scan-local
    * expression work at any corpus size. */
  def temperatureMix(docs: DataFrame, sourceCol: String, idCol: String,
                     budgetFrac: Double): DataFrame = {
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val nTotal = counts.map(_._2).sum
    val budget = math.floor(budgetFrac * nTotal)
    var sumw = 0.0
    counts.foreach { case (_, n) => sumw += math.sqrt(n.toDouble) }
    val th = counts.map { case (s, n) =>
      val p = math.min(1.0,
        (math.sqrt(n.toDouble) / sumw) * budget / n.toDouble)
      (s, math.floor(p * 1000000.0).toLong)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val thDf = th.toSeq.toDF(sourceCol, "thresh")
    docs.join(broadcast(thDf), Seq(sourceCol))
      .withColumn("hh", pmod(shaHash60(col(idCol)), lit(1000000L)))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        first(col("thresh")).as("thresh"),
        sum(when(col("hh") < col("thresh"), lit(1L)).otherwise(lit(0L)))
          .as("n_kept"))
  }
}
