package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** P1–P10 — the reference's scalar transform surface (SURVEY.md §2.3),
  * all Catalyst built-ins (codegen'd; no UDFs — P5's quote-escaping and
  * P7's attribute parsing were driver-side Python in the reference and
  * become `regexp_replace`/`regexp_extract` columns here).
  */
object Transforms {

  /** P1 — bulk rename (reference: pse_edge.py:105-112 header snake_casing,
    * spark_deltalake_sync.py:212 `max(date) → latest_date`). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** P3 — literal stamping (pse_edge.py:91,101: `symbol`, `extracted_at`
    * from the HTTP Date header stamped onto every row). */
  def stamp(df: DataFrame, name: String, value: Column): DataFrame =
    df.withColumn(name, value)

  /** P4 — date parse/format round-trip (pse_edge.py:113-114,254-255).
    * The reference shuttles dates as strings because of CSV staging; the
    * engine keeps DateType end-to-end and formats only at sink boundaries. */
  def formatDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** P5 — SQL-injection-style quote escaping (pse_edge.py:115
    * `str.replace("'","''")`). Unnecessary in Spark (no string-spliced
    * SQL); kept as the scalar-fn demo. */
  def escapeQuotes(c: Column): Column = regexp_replace(c, "'", "''")

  /** P6 — composite-key synthesis `symbol || '::' || date`
    * (bigquery_dml__upsert_daily_stock_price.sql:20). Prefer the 2-column
    * semi join (Merge/left_semi) — this exists for parity. */
  def concatKey(cols: Column*): Column = concat_ws("::", cols: _*)

  /** P7 — attribute parsing: `onclick`-style id extraction
    * (pse_edge.py:165-166) as a regexp over a column. */
  def extractId(c: Column): Column = regexp_extract(c, "cmDetail\\('([^']+)'\\)", 1)
}
