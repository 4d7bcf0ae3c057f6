package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** A2 — argmax dedup, the reference's signature transform: keep the row
  * with the greatest ordering value per key group
  * (reference: src/utils/pse_edge.py:259 `df.loc[df.groupby(['date',
  * 'symbol'])['close'].idxmax()]`, repeated at postgres_sync.py:215,
  * bigquery_sync.py:187, deltalake_sync.py:204, spark_deltalake_sync.py:270).
  *
  * Two idiomatic Spark forms:
  *   - window `row_number` (general: any number of tiebreak columns,
  *     survives ties deterministically);
  *   - `max_by` aggregate (one shuffle, pure hash-agg — cheaper at scale
  *     when the kept payload is small, since it avoids the window sort).
  *
  * Scale note: the window form shuffles on `keys` then sorts within
  * partitions; the max_by form is a partial+final hash aggregate with
  * map-side combine — prefer it when group cardinality is high and rows
  * per group are many (100 TB: avoids a full sort of the fact table).
  */
object Dedup {

  /** Window form. `order` must define a total order within each key group
    * (add a unique id as final tiebreak) so the result is deterministic. */
  def argmaxWindow(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** max_by form: one row per key, carrying `payload` of the row that
    * maximizes `ord`. `ord` must be tie-free per group (or wrap it in a
    * struct with a unique tiebreak) for determinism. */
  def argmaxMaxBy(df: DataFrame, keys: Seq[String], payload: Seq[(String, Column)],
                  ord: Column): DataFrame = {
    val aggs = payload.map { case (name, c) => max_by(c, ord).as(name) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact whole-row duplicate removal keyed by a column's content hash —
    * the "exact dedup" LLM-pipeline op. Keeps min(id) per content group.
    * At 100 TB the 256-bit hash (not the raw text) is the shuffle key, so
    * shuffle volume is O(rows × 32B) regardless of document size. */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
}
