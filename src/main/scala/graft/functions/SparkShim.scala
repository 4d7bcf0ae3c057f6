package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge to the `private[sql]` Expression ↔ Column
  * converters — the standard pattern for libraries that ship custom
  * Catalyst expressions (the public `Column` API intentionally hides its
  * expression node since Spark 4's Connect split). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a raw logical plan (the `private[sql]`
    * `Dataset.ofRows`) — needed to surface custom logical operators
    * (e.g. [[graft.plans.AsOfJoinPlan]]) through the public Dataset API. */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan under a Dataset. */
  def logicalPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Re-root a micro-batch DataFrame (the streaming-tagged plan a v1
    * `Sink.addBatch` receives) as an ordinary batch DataFrame — the
    * exact materialization `ForeachBatchSink` itself performs
    * (`LogicalRDD.fromDataset(toRdd, …, isStreaming = false)`), so a
    * custom sink can hand the batch to any batch writer. */
  def asBatch(df: Dataset[_]): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[_]]
    val node = execution.LogicalRDD.fromDataset(
      cdf.queryExecution.toRdd, cdf, isStreaming = false)
    classic.Dataset.ofRows(cdf.sparkSession, node)
  }

  /** Re-root a BATCH DataFrame as a STREAMING-tagged one — what a v1
    * `Source.getBatch` must return (the engine splices the plan into
    * the micro-batch; Kafka's source uses the same private
    * `internalCreateDataFrame(…, isStreaming = true)`). The inverse of
    * [[asBatch]]. */
  def asStreaming(df: Dataset[_]): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[_]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** Late (post-build) function registration on a live session — the
    * runtime twin of SparkSessionExtensions.injectFunction. */
  def registerFunctions(
      spark: SparkSession,
      fns: Seq[(String, catalyst.expressions.ExpressionInfo,
        Seq[catalyst.expressions.Expression] => catalyst.expressions.Expression)]): Unit =
    fns.foreach { case (name, info, builder) =>
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
        .registerFunction(catalyst.FunctionIdentifier(name), info, builder)
    }
}
