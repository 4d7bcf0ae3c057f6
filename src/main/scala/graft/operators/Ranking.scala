package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.sql.{Column, DataFrame}

/** Scale-safe global ranking.
  *
  * `Window.orderBy(...)` with no partition key plans an
  * `Exchange SinglePartition`: every row funnels through ONE task, so a
  * global rank over 1B keys is a single-reducer bottleneck no matter how
  * many executors the cluster has. This operator computes the same
  * total-order row numbers as a two-phase range-partitioned plan:
  *
  *   1. `repartitionByRange` on the sort key — partition i holds rows that
  *      order entirely before partition i+1 (boundaries from Spark's
  *      reservoir sample; AQE may coalesce, which merges ADJACENT ranges
  *      and so preserves the ordering property);
  *   2. local `row_number` per range (window partitioned by
  *      `spark_partition_id()` — parallel across ranges, each task sorts
  *      only its own slice);
  *   3. per-range row counts (a partial-aggregate over the SAME range
  *      exchange — reused, not recomputed) cross-joined broadcast
  *      (≤ shuffle-partition-count rows, a plan parameter, not data) into
  *      cumulative offsets and the total row count;
  *   4. global rank = offset + local rank.
  *
  * The plan contains NO `Exchange SinglePartition` (guarded by
  * `PlanShapeSpec`). From (rank, N) the rank-family window functions are
  * pure arithmetic — see [[ntileOf]], [[percentRankOf]], [[cumeDistOf]] —
  * so a global ntile/percent_rank/cume_dist never needs the global window
  * either.
  *
  * Requirement: `order` must be a TOTAL order (tie-break with a unique
  * key) — equal keys may straddle a range boundary, which would make the
  * split of a tie group between partitions arbitrary. With a total order
  * the result is independent of the sampled boundaries.
  */
object Ranking {

  private val Pid = "__graft_pid"
  private val LocalRank = "__graft_lrank"
  private val PidB = "__graft_pid_b"
  private val NB = "__graft_n_b"
  private val Off = "__graft_off"

  /** Adds `rankCol` = 1-based global row number under `order` and
    * `nCol` = total row count, without a single-partition exchange.
    *
    * The range-partitioned relation is eagerly `localCheckpoint`ed
    * before fan-out. This is correctness, not caching: `ranged` is
    * consumed by BOTH the local-rank window and the per-range counts,
    * and without materialization each consumer re-executes its own
    * `repartitionByRange`, whose boundaries come from an independently
    * seeded reservoir sample — on data large enough that the sample is
    * not the whole input, the two executions can pick DIFFERENT
    * boundaries, making the pid→offset join silently wrong (Spark's
    * ReuseExchange does not unify the branches here — verified on the
    * q77 plan, which re-scanned the source three times). Pinning the
    * partitions costs one executor-local materialization of the
    * projected ranking columns — the same order of cost Spark's own
    * global sort pays — and also collapses the plan to a single source
    * scan and a single range exchange. */
  def withGlobalRank(df: DataFrame, rankCol: String, nCol: String,
                     order: Column*): DataFrame = {
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn(LocalRank,
      row_number().over(Window.partitionBy(Pid).orderBy(order: _*)))
    // Tiny side: one row per range, read from the checkpointed partitions.
    val counts = ranged.groupBy(col(Pid)).agg(count(lit(1)).as("__graft_n"))
    val offsets = counts
      .crossJoin(broadcast(
        counts.select(col(Pid).as(PidB), col("__graft_n").as(NB))))
      .groupBy(col(Pid))
      .agg(
        coalesce(sum(when(col(PidB) < col(Pid), col(NB))), lit(0L)).as(Off),
        sum(col(NB)).as(nCol))
    local.join(broadcast(offsets), Seq(Pid))
      .withColumn(rankCol, (col(Off) + col(LocalRank)).cast(LongType))
      .drop(Pid, LocalRank, Off, "__graft_n")
  }

  /** Adds `cumCol` = running total of `weight` under `order` (inclusive of
    * the current row) and `totalCol` = the grand total, without a
    * single-partition exchange — the prefix-sum sibling of
    * [[withGlobalRank]], same two-phase shape: per-range local cumulative
    * sums in parallel, plus broadcast per-range weight offsets. `weight`
    * must be integral (LongType) so the running totals are exact and
    * independent of partitioning; the same `localCheckpoint` boundary-
    * pinning argument as withGlobalRank applies. */
  def withPrefixSum(df: DataFrame, cumCol: String, totalCol: String,
                    weight: Column, order: Column*): DataFrame = {
    val W = "__graft_w"
    val ranged = df.withColumn(W, weight.cast(LongType))
      .repartitionByRange(order: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn(LocalRank,
      sum(col(W)).over(Window.partitionBy(Pid).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sums = ranged.groupBy(col(Pid)).agg(sum(col(W)).as("__graft_n"))
    val offsets = sums
      .crossJoin(broadcast(
        sums.select(col(Pid).as(PidB), col("__graft_n").as(NB))))
      .groupBy(col(Pid))
      .agg(
        coalesce(sum(when(col(PidB) < col(Pid), col(NB))), lit(0L)).as(Off),
        sum(col(NB)).as(totalCol))
    local.join(broadcast(offsets), Seq(Pid))
      .withColumn(cumCol, (col(Off) + col(LocalRank)).cast(LongType))
      .drop(Pid, LocalRank, Off, "__graft_n", W)
  }

  /** SQL-standard `ntile(buckets)` from a total-order 1-based rank and the
    * row count: the first `N mod buckets` tiles get `ceil(N/buckets)` rows,
    * the rest `floor(N/buckets)` — identical to Spark's and DuckDB's
    * window ntile under the same (total) ordering. */
  def ntileOf(buckets: Int, rank: Column, n: Column): Column = {
    val b = lit(buckets.toLong)
    val q = floor(n / b).cast(LongType)
    val rem = n - q * b
    // branch 2 divides by q and is only reached when rank > rem*(q+1),
    // which implies q >= 1 (when q = 0, rem = N covers every row)
    when(rank <= rem * (q + lit(1L)),
      floor((rank - lit(1L)) / (q + lit(1L))) + lit(1L))
      .otherwise(rem + floor((rank - rem * (q + lit(1L)) - lit(1L)) / q) + lit(1L))
      .cast(IntegerType)
  }

  /** `percent_rank()` under a total order: (rank-1)/(N-1), 0.0 for N=1. */
  def percentRankOf(rank: Column, n: Column): Column =
    when(n === lit(1L), lit(0.0))
      .otherwise((rank - lit(1L)).cast(DoubleType) / (n - lit(1L)).cast(DoubleType))

  /** `cume_dist()` under a total order: rank/N. */
  def cumeDistOf(rank: Column, n: Column): Column =
    rank.cast(DoubleType) / n.cast(DoubleType)
}
