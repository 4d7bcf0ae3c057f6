package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** One-pass data-quality constraint audit (the engine form of the
  * reference's test-layer assertions — column dtypes, shape lower
  * bounds, exact golden values, tests/integration/test_pse_edge.py:20-26,
  * 49-55).
  *
  * All checks evaluate in a SINGLE scan: each constraint becomes a
  * conditional-count aggregate, so auditing N constraints over 100 TB
  * costs one pass (map-side partial aggregation, one 1-row reduce), not
  * N scans. The 1×2N aggregate row is then pivoted to a (check_name,
  * n_pass, n_fail) long report driver-side — the explode is over a
  * 1-row, N-element array, not data. A NULL predicate counts as a
  * failure (the row did not prove the constraint).
  */
object Audit {

  def audit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    // aggregate columns get positional generated names (c0_pass, c0_total,
    // …), never the user-supplied check name: a name containing '.' or '`'
    // would otherwise be re-parsed as a nested-field reference when the
    // report selects it back
    val aggs = checks.zipWithIndex.flatMap { case ((_, pred), i) =>
      Seq(
        sum(when(pred, 1L).otherwise(0L)).as(s"c${i}_pass"),
        count(lit(1)).as(s"c${i}_total"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val reportRows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("check_name"),
        coalesce(col(s"c${i}_pass"), lit(0L)).as("n_pass"),
        (coalesce(col(s"c${i}_total"), lit(0L)) -
          coalesce(col(s"c${i}_pass"), lit(0L))).as("n_fail"))
    }
    one.select(explode(array(reportRows: _*)).as("c"))
      .select(col("c.check_name"), col("c.n_pass"), col("c.n_fail"))
      .orderBy("check_name")
  }
}
