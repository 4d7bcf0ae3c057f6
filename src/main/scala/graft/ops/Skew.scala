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
