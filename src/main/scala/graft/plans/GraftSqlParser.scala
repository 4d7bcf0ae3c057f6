package graft.plans

import graft.sources.TxnLog
import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Maintenance statements of the txnlog format as REAL SQL — the three
  * Delta utility commands a table operator runs daily, claimed by a
  * delegating parser (Spark's grammar has no VACUUM/OPTIMIZE/DESCRIBE
  * HISTORY, so nothing is shadowed; every other statement goes to the
  * stock parser untouched):
  *
  *   VACUUM t [RETAIN n HOURS]            → [[TxnLog.vacuum]]
  *   OPTIMIZE t [ZORDER BY (a, b, …)]     → [[TxnLog.compact]]
  *   DESCRIBE HISTORY t                   → [[TxnLog.history]]
  *
  * The target is a temp view / catalog table name (resolved through
  * [[TxnLogSqlSurface.lookupPath]]) or a quoted table path. Registered
  * via [[graft.GraftExtensions]]' `injectParser`. */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(spark, delegate, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  // MUST forward: `spark.sql(text, args)` binds named/positional
  // parameters through this entry point, and the trait's DEFAULT
  // implementation drops the parameter context (q39's :named args
  // then fail analysis as unbound)
  override def parsePlanWithParameters(sqlText: String,
      parameters: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftSqlParser.maintenancePlan(spark, delegate, sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private val Vacuum =
    """(?is)\s*VACUUM\s+(`[^`]+`|'[^']+'|[\w.]+)(?:\s+RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+(`[^`]+`|'[^']+'|[\w.]+)(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(`[^`]+`|'[^']+'|[\w.]+)\s*;?\s*""".r

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100",
      messageParameters = Map("message" -> msg))

  /** Target token → table path: a quoted literal path, or an
    * identifier resolved against the session catalog's txnlog views
    * and tables. */
  private def pathOf(spark: SparkSession, delegate: ParserInterface,
                     token: String): String = {
    val t = token.trim
    if (t.startsWith("'") || t.startsWith("`"))
      t.substring(1, t.length - 1)
    else TxnLogSqlSurface
      .lookupPath(spark, delegate.parseMultipartIdentifier(t))
      .getOrElse(fail(s"$t is not a txnlog view, table, or path — " +
        "VACUUM/OPTIMIZE/DESCRIBE HISTORY serve txnlog tables " +
        "(quote a table directory to address one by path)"))
  }

  private[graft] def maintenancePlan(spark: SparkSession,
                                     delegate: ParserInterface,
                                     sqlText: String)
      : Option[LogicalPlan] = sqlText match {
    case Vacuum(target, hours) =>
      Some(TxnLogVacuumCommand(pathOf(spark, delegate, target),
        Option(hours).map(_.toLong)))
    case Optimize(target, zorder) =>
      val cols = Option(zorder).toSeq.flatMap(_.split(','))
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      Some(TxnLogOptimizeCommand(pathOf(spark, delegate, target), cols))
    case History(target) =>
      Some(TxnLogHistoryCommand(pathOf(spark, delegate, target)))
    case _ => None
  }
}

/** `VACUUM t [RETAIN n HOURS]`: reclaim files unreferenced by the
  * retained snapshots (and prune the log/checkpoints below the
  * horizon) — returns the swept relative paths, Delta-style. */
case class TxnLogVacuumCommand(table: String, retainHours: Option[Long])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.vacuum(table,
      minAgeMs = retainHours.map(_ * 3600L * 1000L)
        .getOrElse(7L * 24 * 60 * 60 * 1000)).map(Row(_))
}

/** `OPTIMIZE t [ZORDER BY (a, b, …)]`: one transactional compaction
  * commit — bin-packing without ZORDER; with it, multi-column Hilbert
  * clustering (2-D walk / N-D Skilling transpose) plus fresh stats and
  * blooms on the cluster columns so pruning is effective on every one
  * of them. Returns (version, n_files_after). */
case class TxnLogOptimizeCommand(table: String, zorderBy: Seq[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v =
      if (zorderBy.isEmpty) TxnLog.compact(session, table)
      else TxnLog.compact(session, table,
        // enough output files that per-file bounding boxes stay narrow
        // in every clustered column — the point of the zorder layout
        targetFiles = math.max(8, session.sparkContext
          .defaultParallelism / 2),
        clusterBy = zorderBy, hilbert = zorderBy.size >= 2,
        statsCols = zorderBy, bloomCols = zorderBy)
    Seq(Row(v, TxnLog.files(table).size.toLong))
  }
}

/** `DESCRIBE HISTORY t`: the commit log as rows (version, operation,
  * add/remove/cdc file counts) — [[TxnLog.history]] through SQL. */
case class TxnLogHistoryCommand(table: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("n_cdc_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.history(session, table).collect().toSeq
}
