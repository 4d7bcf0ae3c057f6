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
}
