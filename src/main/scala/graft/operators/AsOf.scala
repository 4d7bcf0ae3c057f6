package graft.operators

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, GraftShim}

/** Public API over the native backward as-of join
  * ([[graft.plans.AsOfJoinPlan]] / [[graft.plans.AsOfJoinExec]]).
  *
  * `asofBackward(purchases, clicks, ...)` attaches to each left row the
  * right row with the same key and the greatest right timestamp `<=` the
  * left timestamp (optionally within `toleranceUs`); unmatched left rows
  * keep null right columns. Ensures the planner strategy is installed on
  * the session (idempotent) — config-based installs go through
  * `spark.sql.extensions=graft.GraftExtensions` instead.
  */
object AsOf {

  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTsCol: String, rightTsCol: String,
                   toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = GraftShim.logicalPlan(left)
    val rp = GraftShim.logicalPlan(right)
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides share attribute ids (self-join): alias the right " +
        "side's columns (select ... .as(...)) so both sides are distinct")
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    GraftShim.ofRows(spark, AsOfJoinPlan(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTsCol), attr(rp, rightTsCol), toleranceUs))
  }
}
