package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Exact per-group quantiles without a global sort — the two-pass
  * histogram-refine shape that replaces `ORDER BY value` at corpus scale:
  *
  *   pass 1: one map-side-combined (group, bin) count — the only full
  *           scan that aggregates; its result (groups × occupied bins) is
  *           a bounded plan parameter, same contract as q92's vocabulary
  *           or q128's PQ codebook;
  *   locate: per group walk the sorted bins on the driver to find, for
  *           each requested p, the bin holding rank ⌈p·n⌉ and the count
  *           of rows strictly below it;
  *   pass 2: re-scan filtered to candidate (group, bin) pairs (a
  *           broadcast join — rows touched ≈ n/‖bins‖ per group), sort
  *           ONLY within (group, p) partitions, and pick the row whose
  *           within-bin rank plus the below-bin count equals the target.
  *
  * The quantile definition is rank-based (value at 1-based rank ⌈p·n⌉
  * under the (value, tie) total order — no interpolation), so the result
  * is an actual data value and replays exactly on any engine. Bins are
  * `floor(value / binWidth)` — monotone in value, which is what lets
  * below-bin counts stand in for below-row counts. At adversarial value
  * ranges the bin count is bounded by sizing binWidth from a min/max
  * pre-pass (histogram stays a plan parameter); fixtures use a fixed
  * width.
  */
object Quantiles {

  def twoPassExact(df: DataFrame, groupCol: String, valueCol: String,
                   tieCol: String, ps: Seq[Double], binWidth: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val binned = df.withColumn("bin",
      floor(col(valueCol) / binWidth).cast(LongType))

    // pass 1: bounded histogram (groups × occupied bins)
    val hist = binned.groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // locate: per group and per p, the candidate bin + rows below it
    val cand = hist.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = sorted.map(_._3).sum
      ps.flatMap { p =>
        val rank = math.ceil(p * n).toLong.max(1L)
        var cum = 0L
        val hit = sorted.find { case (_, _, c) =>
          val in = rank <= cum + c; if (!in) cum += c; in
        }
        hit.map { case (_, bin, _) => (g, bin, p, rank, cum, n) }
      }
    }.toDF(groupCol, "bin", "p", "rank", "below", "n")

    // pass 2: only candidate-bin rows are sorted, per (group, p)
    val w = Window.partitionBy(col(groupCol), col("p"))
      .orderBy(col(valueCol), col(tieCol))
    val picked = binned.join(broadcast(cand), Seq(groupCol, "bin"))
      .withColumn("rn", row_number().over(w).cast(LongType) + col("below"))
      .filter(col("rn") === col("rank"))

    val aggs = ps.map { p =>
      max(when(col("p") === p, col(valueCol)))
        .as("p" + math.round(p * 100))
    }
    picked.groupBy(col(groupCol), col("n"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: col("n") +:
        ps.map(p => col("p" + math.round(p * 100))): _*)
  }
}
