package graft

import graft.functions.{BitAndCount, BitsetOf, BottomKSample, CosineSim,
  CountMin, HyperplaneSig, KMinValues, MinHashSig, ShingleHash,
  ShingleHashSha, SimHash64, SimHashOf, SimHashSha, SpaceSaving, ZValue}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session-extension registration for the engine's native expressions, so
  * SQL users call them like built-ins:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT cosine_sim(embedding, query_vec) FROM embeddings
  * }}}
  *
  * (For an already-built session — e.g. tests — use
  * [[GraftExtensions.register]].) This is the sanctioned Spark hook for
  * shipping custom Catalyst expressions with a library: no fork, no
  * session-internal APIs at call sites, full codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.NanosPredicatePushdown)
    ext.injectOptimizerRule(_ => graft.plans.EagerMinMaxAggregation)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL surfaces of the txnlog format: VERSION/TIMESTAMP AS OF and
    // MERGE INTO resolve onto the format's own read options / upsert.
    // These run in the HINTS batch (before the main Resolution batch):
    // Spark's own ResolveRelations refuses time travel over v1 temp
    // views/catalog tables by THROWING during resolution, so the claim
    // must happen before it ever sees the node.
    ext.injectHintResolutionRule(s => graft.plans.TxnLogTimeTravelRule(s))
    ext.injectHintResolutionRule(s => graft.plans.TxnLogMergeRule(s))
    ext.injectHintResolutionRule(s => graft.plans.TxnLogDmlRule(s))
    // a txnlog table must NEVER be written by the raw-file insert
    // command (unlogged files are silently invisible); the cached
    // catalog-relation INSERT route plans it — rewrite post-hoc
    ext.injectPostHocResolutionRule(s => graft.plans.TxnLogInsertGuard(s))
    // Delta's CDF table-valued function: table_changes('t', from[, to])
    // resolves inline to the readChangeFeed relation
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.plans.TableChangesFunction.getClass.getName,
        "table_changes"),
      (args: Seq[Expression]) =>
        graft.plans.TableChangesFunction.plan(args)))
    // maintenance statements Spark's grammar lacks: VACUUM / OPTIMIZE
    // [ZORDER BY] / DESCRIBE HISTORY — a delegating parser claims them,
    // every other statement reaches the stock parser untouched
    ext.injectParser((s, delegate) =>
      new graft.plans.GraftSqlParser(s, delegate))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("hyperplane_sig",
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (args: Seq[Expression]) => HyperplaneSig(args(0),
        intArg(args(1), "dim"), intArg(args(2), "nPlanes"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), intArg(args(1), "k"))),
    ("shingle_hash",
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      (args: Seq[Expression]) => ShingleHash(args(0), intArg(args(1), "n"))),
    ("shingle_hash_sha",
      new ExpressionInfo(classOf[ShingleHashSha].getName, "shingle_hash_sha"),
      (args: Seq[Expression]) => ShingleHashSha(args(0), intArg(args(1), "n"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("simhash_sha",
      new ExpressionInfo(classOf[SimHashSha].getName, "simhash_sha"),
      (args: Seq[Expression]) => SimHashSha(args(0))),
    ("simhash_of",
      new ExpressionInfo(classOf[SimHashOf].getName, "simhash_of"),
      (args: Seq[Expression]) => SimHashOf(args(0), intArg(args(1), "nBits"))),
    ("bitset_of",
      new ExpressionInfo(classOf[BitsetOf].getName, "bitset_of"),
      (args: Seq[Expression]) => BitsetOf(args(0), intArg(args(1), "nSlots"))),
    ("bit_and_count",
      new ExpressionInfo(classOf[BitAndCount].getName, "bit_and_count"),
      (args: Seq[Expression]) => BitAndCount(args(0), args(1))),
    ("k_min_values",
      new ExpressionInfo(classOf[KMinValues].getName, "k_min_values"),
      // return the bare AggregateFunction: the analyzer wraps it and owns
      // DISTINCT/FILTER handling (pre-wrapping toAggregateExpression here
      // would make those variants fail resolution)
      (args: Seq[Expression]) => KMinValues(args(0), intArg(args(1), "k"))),
    ("space_saving",
      new ExpressionInfo(classOf[SpaceSaving].getName, "space_saving"),
      // bare AggregateFunction for the same analyzer-wrapping reason
      (args: Seq[Expression]) => SpaceSaving(args(0), intArg(args(1), "m"))),
    ("count_min_grid",
      new ExpressionInfo(classOf[CountMin].getName, "count_min_grid"),
      // bare AggregateFunction for the same analyzer-wrapping reason
      (args: Seq[Expression]) => CountMin(args(0),
        intArg(args(1), "depth"), intArg(args(2), "width"))),
    ("bottom_k_sample",
      new ExpressionInfo(classOf[BottomKSample].getName, "bottom_k_sample"),
      // bare AggregateFunction for the same analyzer-wrapping reason
      (args: Seq[Expression]) => BottomKSample(args(0), args(1),
        intArg(args(2), "k"))),
    ("token_stats",
      new ExpressionInfo(classOf[graft.functions.TokenStats].getName,
        "token_stats"),
      // a Generator registers like any expression; the analyzer wraps it
      // in Generate when it appears in a SELECT (same path as explode)
      (args: Seq[Expression]) => graft.functions.TokenStats(args(0))),
    ("z_value",
      new ExpressionInfo(classOf[ZValue].getName, "z_value"),
      // SQL integer literals arrive as INT — widen like a built-in would
      (args: Seq[Expression]) => ZValue(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0),
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.LongType),
        intArg(args(2), "bits"))))

  /** Register on a live session (the extensions hook only runs at session
    * build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftShim.registerFunctions(spark, functions)
}
