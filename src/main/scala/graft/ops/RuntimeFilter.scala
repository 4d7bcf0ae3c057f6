package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the hand-rolled form of Spark's
  * runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter`,
  * which only injects automatically under specific shuffle-stage shapes).
  *
  * Shape: aggregate the dim side's join keys into one bloom filter (a few
  * KB), broadcast it, and pre-filter the fact scan with `might_contain`
  * before the exact join. At 100 TB the exact semi join still shuffles
  * whatever survives — the bloom prefilter drops the non-matching bulk at
  * the scan (no false negatives, so the exact join sees a superset of the
  * true matches and the final result is *identical* to the plain semi
  * join — which is exactly what lets a DuckDB oracle check it).
  */
object RuntimeFilter {

  /** `bloom_filter_agg` over a long key column (single-row, binary). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    GraftShim.column(
      new BloomFilterAggregate(GraftShim.expression(key),
        Literal(expectedItems), Literal(expectedItems * 8))
        .toAggregateExpression())

  def mightContain(bloom: Column, key: Column): Column =
    GraftShim.column(
      BloomFilterMightContain(GraftShim.expression(bloom),
        GraftShim.expression(key)))

  /** Fact rows whose `factKey` appears in `dim.dimKey`: bloom prefilter at
    * the fact scan, then the exact `left_semi` join (removes the bloom's
    * false positives). Result equals `fact ⋉ dim` exactly.
    *
    * The bloom is materialized at the driver and embedded as a binary
    * literal — `might_contain` requires a constant (or scalar-subquery)
    * filter side, and this is exactly how Spark's own injected runtime
    * filters ship the sketch: one driver-side job over the (small) dim
    * side, then a few-hundred-KB constant broadcast with the task
    * closures. The fact side never shuffles for the prefilter. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long = 1000000L): DataFrame = {
    val bloomBytes = dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    fact.filter(mightContain(lit(bloomBytes), col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
