package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for low-cardinality / hot-key aggregation.
  *
  * When the grouping key has fewer distinct values than there are
  * reducers (e.g. 5 event types across a 1000-executor shuffle), a plain
  * `groupBy` sends each key's entire volume to one task. Salting splits
  * each key into `nSalts` sub-groups for the first (wide, heavy)
  * aggregation, then merges the per-salt partials in a second (tiny)
  * aggregation. Both stages are algebraic (sum/count merge by addition;
  * decimal sums stay exact and order-independent — see [[Exact]]), so the
  * result is identical to the unsalted form.
  *
  * The salt is `xxhash64(keys, value) mod nSalts` — deterministic (no
  * RNG, reproducible plans/retries) while spreading a hot key's rows
  * across salts. Hashing only the columns the aggregate reads (never the
  * whole row) keeps column pruning intact: the scan stays as narrow as
  * the unsalted query's. Map-side partial aggregation already combines
  * within a task; salting additionally balances the *reduce* side, which
  * is what melts at 100 TB.
  */
object Skew {

  /** Skew-safe equi-join of a hot-keyed fact table against a small-but-
    * not-broadcastable dimension: the fact side gets a deterministic salt
    * `xxhash64(saltCols) mod nSalts`, the dim side is replicated once per
    * salt value, and the join key becomes `(key, salt)` — so one hot key's
    * rows spread over `nSalts` reducer partitions instead of landing on
    * one. Row-for-row identical to the unsalted join (every fact row still
    * meets every dim row of its key exactly once).
    *
    * This is the engine-level skew lever AQE's skew-join split cannot
    * reach: AQE (sort-merge only) splits an oversized *partition* into
    * chunks, but each chunk still holds the full hot key on one task when
    * one key IS the partition; salting divides the key itself. The dim
    * side is forced to a shuffled hash join — with a broadcastable dim
    * there is no shuffle and thus no skew to mitigate, so the plan under
    * test is the one a 100 TB fact ⋈ 10 GB dim would get.
    *
    * Cost: dim ×nSalts replication (explode is row-local, no extra
    * shuffle) — cheap precisely when skew mitigation is needed (dim ≪
    * fact). `saltCols` must be row-varying fact columns (a unique id, or
    * key+measure) so the salt actually spreads each key's rows. */
  def saltedReplicateJoin(fact: DataFrame, dim: DataFrame, key: String,
                          saltCols: Seq[Column], nSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(nSalts.toLong)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** count + exact money-sum per key, computed skew-safe in two stages.
    * Output: keys..., n (count), total_value (double). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     nSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ valueCol: _*), lit(nSalts.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(valueCol.cast(Exact.Money)).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__sum")).cast(DoubleType).as("total_value"))
  }
}
