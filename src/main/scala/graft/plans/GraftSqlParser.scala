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

/** Maintenance + DDL statements of the txnlog format as REAL SQL,
  * claimed by a delegating parser. Two claim disciplines: statements
  * Spark's grammar LACKS (nothing shadowed) are claimed whenever they
  * parse —
  *
  *   VACUUM t [RETAIN n HOURS]            → [[TxnLog.vacuum]]
  *   OPTIMIZE t [ZORDER BY (a, b, …)]     → [[TxnLog.compact]]
  *   DESCRIBE HISTORY t                   → [[TxnLog.history]]
  *   DESCRIBE DETAIL t                    → [[TxnLog.detail]]
  *   RESTORE [TABLE] t TO VERSION/TIMESTAMP AS OF … → [[TxnLog.restore]]
  *   CREATE TABLE d SHALLOW CLONE s [VERSION AS OF n] [LOCATION '…']
  *                                        → [[TxnLog.shallowClone]]
  *
  * — while statements Spark ALSO parses (ALTER TABLE …, SHOW
  * TBLPROPERTIES) are claimed ONLY when the target resolves to a
  * txnlog table; everything else reaches the stock parser untouched:
  *
  *   ALTER TABLE t ADD COLUMN c TYPE      → [[TxnLog.addColumn]]
  *     (one column, primitive types — the common evolution; richer
  *     shapes go through the programmatic mergeSchema path)
  *   ALTER TABLE t RENAME COLUMN a TO b   → [[TxnLog.renameColumn]]
  *   ALTER TABLE t DROP COLUMN c          → [[TxnLog.dropColumn]]
  *   ALTER TABLE t ADD CONSTRAINT n CHECK (…) → [[TxnLog.addCheck]]
  *   ALTER TABLE t DROP CONSTRAINT n      → [[TxnLog.dropCheck]]
  *   ALTER TABLE t SET TBLPROPERTIES ('k'='v', …)
  *                                        → [[TxnLog.setProperties]]
  *   SHOW TBLPROPERTIES t                 → [[TxnLog.properties]]
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
  private val Tok = """(`[^`]+`|'[^']+'|[\w.]+)"""
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + Tok +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(?:\s+(DRY\s+RUN))?\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + Tok +
      """(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+(INCREMENTAL))?\s*;?\s*""").r
  // OPTIMIZE WHERE takes partition-value equalities only (Delta's
  // restriction): a conjunction of col = 'val' / col = val
  private val PartEq =
    """(?is)\s*(`[^`]+`|\w+)\s*=\s*('[^']*'|[\w.-]+)\s*""".r
  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + Tok + """\s*;?\s*""").r
  private val RestoreV =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + Tok +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreT =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + Tok +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val AlterAdd =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ADD\s+COLUMNS?\s+(.+?)\s*;?\s*""").r
  private val ColSpec =
    """(?is)\s*(`[^`]+`|\w+)\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)(?:\s+DEFAULT\s+(.+?))?\s*""".r
  private val CreateTableDdl =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" +
      """(IF\s+NOT\s+EXISTS\s+)?""" + Tok +
      """\s*\((.+)\)\s*USING\s+txnlog""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  private val TruncateStmt =
    ("""(?is)\s*TRUNCATE\s+TABLE\s+""" + Tok + """\s*;?\s*""").r
  // CREATE OR REPLACE TABLE … USING txnlog … AS SELECT — the one-
  // commit definition+data swap (no column list: schema from the query)
  private val CreateOrReplaceAs =
    ("""(?is)\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+""" + Tok +
      """\s+USING\s+txnlog""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s+AS\s+(\(?\s*SELECT\b.+)\s*;?\s*""").r
  private val AlterSetDefault =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*""").r
  private val AlterDropDefault =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+DROP\s+DEFAULT\s*;?\s*""").r
  private val AlterSetNotNull =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+SET\s+NOT\s+NULL\s*;?\s*""").r
  private val AlterDropNotNull =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+DROP\s+NOT\s+NULL\s*;?\s*""").r
  private val ConstraintClause =
    """(?is)\s*CONSTRAINT\s+(`[^`]+`|\w+)\s+CHECK\s*\((.*)\)\s*""".r
  // Delta's fsck: FSCK REPAIR TABLE t [DRY RUN] — drop log entries
  // whose data files are gone on storage
  private val FsckStmt =
    ("""(?is)\s*FSCK\s+REPAIR\s+TABLE\s+""" + Tok +
      """(?:\s+(DRY\s+RUN))?\s*;?\s*""").r
  // Delta's manifest generation (Presto/Trino interop):
  // GENERATE symlink_format_manifest FOR TABLE t
  private val GenerateStmt =
    ("""(?is)\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      Tok + """\s*;?\s*""").r
  // Delta's idempotent file ingestion: COPY INTO t FROM '<dir|glob>'
  // FILEFORMAT = CSV|PARQUET|JSON [FORMAT_OPTIONS(...)] [COPY_OPTIONS
  // ('force'='true')] — re-running the same statement loads nothing
  private val CopyIntoStmt =
    ("""(?is)\s*COPY\s+INTO\s+""" + Tok +
      """\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?""" +
      """(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?\s*;?\s*""").r
  // Delta's arbitrary-predicate replaceWhere as SQL:
  // INSERT INTO t REPLACE WHERE <pred> SELECT …
  private val InsertReplaceWhere =
    ("""(?is)\s*INSERT\s+INTO\s+""" + Tok +
      """\s+REPLACE\s+WHERE\s+(.+?)\s+(\(?\s*SELECT\b.+)\s*;?\s*""").r
  // the full column item of DDL-first CREATE TABLE: `name TYPE
  // [NOT NULL] [DEFAULT <expr>]` (the reference bootstrap's
  // `"created_at" TIMESTAMP NOT NULL DEFAULT NOW()`,
  // src/db/postgres/company.sql:14-15)
  private val CreateColSpec =
    """(?is)\s*(`[^`]+`|\w+)\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)(\s+NOT\s+NULL)?(?:\s+DEFAULT\s+(.+?))?\s*""".r
  private val GenColSpec =
    """(?is)\s*(`[^`]+`|\w+)\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s+GENERATED\s+ALWAYS\s+AS\s*\((.*)\)\s*""".r
  // `id BIGINT GENERATED ALWAYS AS IDENTITY [(START WITH n
  // [INCREMENT BY k])]` — Delta's identity columns
  private val IdentityColSpec =
    """(?is)\s*(`[^`]+`|\w+)\s+(\w+)\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY(?:\s*\(\s*START\s+WITH\s+(-?\d+)(?:\s+INCREMENT\s+BY\s+(\d+))?\s*\))?\s*""".r
  private val AlterRename =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+RENAME\s+COLUMN\s+(`[^`]+`|\w+)\s+TO\s+(`[^`]+`|\w+)\s*;?\s*""").r
  private val AlterType =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+TYPE\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*;?\s*""").r
  private val AlterDrop =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+DROP\s+COLUMNS?\s+\(?\s*((?:`[^`]+`|\w+)""" +
      """(?:\s*,\s*(?:`[^`]+`|\w+))*)\s*\)?\s*;?\s*""").r
  private val CloneStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+""" + Tok + """\s+SHALLOW\s+CLONE\s+""" +
      Tok + """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  private val AddConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+ADD\s+CONSTRAINT\s+(`[^`]+`|\w+)\s+CHECK\s*\((.*)\)\s*;?\s*""").r
  private val DropConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+DROP\s+CONSTRAINT\s+(`[^`]+`|\w+)\s*;?\s*""").r
  private val Detail =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + Tok + """\s*;?\s*""").r
  private val SetProps =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tok +
      """\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*;?\s*""").r
  private val ShowProps =
    ("""(?is)\s*SHOW\s+TBLPROPERTIES\s+""" + Tok + """\s*;?\s*""").r
  private val PropPair = """'([^']*)'\s*=\s*'([^']*)'""".r
  private val Convert =
    ("""(?is)\s*CONVERT\s+TO\s+TXNLOG\s+""" + Tok + """\s*;?\s*""").r
  private val ShowParts =
    ("""(?is)\s*SHOW\s+PARTITIONS\s+""" + Tok + """\s*;?\s*""").r

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

  /** Like [[pathOf]] but None instead of failing — for statements
    * Spark's own grammar ALSO parses (ALTER TABLE …): only a txnlog
    * target claims them; everything else reaches the stock parser. */
  private def maybePath(spark: SparkSession, delegate: ParserInterface,
                        token: String): Option[String] = {
    val t = token.trim
    if (t.startsWith("'") || t.startsWith("`"))
      Some(t.substring(1, t.length - 1))
    else scala.util.Try(TxnLogSqlSurface
      .lookupPath(spark, delegate.parseMultipartIdentifier(t)))
      .toOption.flatten
  }

  private def unquote(id: String): String =
    id.trim.stripPrefix("`").stripSuffix("`")

  /** Split a column-spec list on TOP-LEVEL commas only — `DECIMAL(10,2)`
    * and quoted DEFAULT literals keep their commas. Outer parentheses
    * (the optional `(a INT, b STRING)` wrapping) are stripped first. */
  private def splitColSpecs(raw: String): Seq[String] = {
    var s = raw.trim
    if (s.startsWith("(") && s.endsWith(")"))
      s = s.substring(1, s.length - 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inQuote = false
    s.foreach { ch =>
      if (inQuote) { cur += ch; if (ch == '\'') inQuote = false }
      else ch match {
        case '\'' => inQuote = true; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** The catalog identifier to REFRESH after a DDL commit (None for a
    * quoted path target — nothing is cached under a name). */
  private def refreshNameOf(token: String): Option[String] = {
    val t = token.trim
    if (t.startsWith("'") || t.startsWith("`")) None else Some(t)
  }

  private[graft] def maintenancePlan(spark: SparkSession,
                                     delegate: ParserInterface,
                                     sqlText: String)
      : Option[LogicalPlan] = sqlText match {
    case Vacuum(target, hours, dry) =>
      Some(TxnLogVacuumCommand(pathOf(spark, delegate, target),
        Option(hours).map(_.toLong), dryRun = dry != null))
    case Optimize(target, where, zorder, inc) =>
      val cols = Option(zorder).toSeq.flatMap(_.split(','))
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      val parts = Option(where).toSeq
        .flatMap(_.split("""(?i)\s+AND\s+""")).map {
          case PartEq(c, v) =>
            val value = if (v.startsWith("'")) v.substring(1, v.length - 1)
              else v
            unquote(c) -> value
          case bad => fail("OPTIMIZE WHERE takes a conjunction of " +
            s"partition equalities (col = 'value'), got: $bad")
        }
      if (inc != null && cols.isEmpty)
        fail("OPTIMIZE … INCREMENTAL needs ZORDER BY — it is the " +
          "clustering maintenance path")
      Some(TxnLogOptimizeCommand(pathOf(spark, delegate, target), cols,
        parts, incremental = inc != null))
    case History(target) =>
      Some(TxnLogHistoryCommand(pathOf(spark, delegate, target)))
    case RestoreV(target, v) =>
      Some(TxnLogRestoreCommand(pathOf(spark, delegate, target),
        Left(v.toLong), refreshNameOf(target)))
    case RestoreT(target, ts) =>
      Some(TxnLogRestoreCommand(pathOf(spark, delegate, target),
        Right(ts), refreshNameOf(target)))
    // DDL-first CREATE TABLE with a declared column list (the
    // reference's bootstrap shape, src/db/postgres/company.sql:7-16):
    // an EMPTY txnlog table born from schema alone. Claimed only for
    // USING txnlog, so every other provider reaches the stock parser.
    case CreateTableDdl(orReplace, ifNotExists, dest, colSpec, partBy,
        loc) =>
      val d = dest.trim
      val destPath =
        if (d.startsWith("'") || d.startsWith("`"))
          d.substring(1, d.length - 1)
        else Option(loc).getOrElse(fail(
          s"CREATE TABLE $d (…) USING txnlog: an identifier " +
            "destination needs LOCATION '<table dir>' (or quote a " +
            "path directly)"))
      // inline CONSTRAINT … CHECK (…) clauses ride the column list
      // (the SQL-standard spelling); split top-level items first so
      // CHECK expressions keep their commas/parens
      val items = splitColSpecs(colSpec)
      val (consItems, colItems) = items.partition(
        _.matches("""(?is)\s*CONSTRAINT\s+.*"""))
      val checks = consItems.map {
        case ConstraintClause(n, e) => unquote(n) -> e.trim
        case bad => fail(s"cannot parse table constraint: $bad " +
          "(expected: CONSTRAINT name CHECK (expr))")
      }
      // parse items individually so GENERATED ALWAYS AS columns (a
      // clause Spark's parseTableSchema does not accept) ride the
      // same list; the expression lands in field metadata and the
      // write path computes it (writers supply base columns only)
      // NOT NULL declarations lower to write-time CHECKs (one commit,
      // enforced by the same observe pass as user constraints) while
      // the declared nullability rides the schema for DESCRIBE
      val nnChecks = scala.collection.mutable.ArrayBuffer
        .empty[(String, String)]
      val fields = colItems.map {
        // IDENTITY first: its spelling is a prefix-cousin of the
        // expression form, and GenColSpec's paren capture must not
        // swallow "(START WITH …)"
        case IdentityColSpec(n, dt, start, step) =>
          org.apache.spark.sql.types.StructField(unquote(n),
            delegate.parseDataType(dt), nullable = true,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString("graft.identity",
                s"${Option(start).getOrElse("1")}," +
                  s"${Option(step).getOrElse("1")}").build())
        case GenColSpec(n, dt, genExpr) =>
          org.apache.spark.sql.types.StructField(unquote(n),
            delegate.parseDataType(dt), nullable = true,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString("graft.generate", genExpr.trim).build())
        // NOT NULL and/or DEFAULT: the default expression lands in
        // field metadata (CURRENT_DEFAULT — the INSERT-time fill
        // fillDefaults applies; EXISTS_DEFAULT too when constant, the
        // key parquet readers consume for footer-missing columns)
        case CreateColSpec(n, dt, nn, dflt)
            if nn != null || dflt != null =>
          val name = unquote(n)
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
          Option(dflt).map(_.trim).foreach { d =>
            mb.putString("CURRENT_DEFAULT", d)
            // non-constant defaults (NOW()) are INSERT-time only;
            // a constant doubles as the existence default
            if (scala.util.Try(
                delegate.parseExpression(d).foldable).getOrElse(false))
              mb.putString("EXISTS_DEFAULT", d)
          }
          if (nn != null)
            nnChecks += (s"nn_$name" -> s"$name IS NOT NULL")
          org.apache.spark.sql.types.StructField(name,
            delegate.parseDataType(dt), nullable = nn == null,
            mb.build())
        case item => scala.util.Try(delegate.parseTableSchema(item))
          .toOption.flatMap(_.fields.headOption)
          .getOrElse(fail(s"CREATE TABLE … USING txnlog: cannot " +
            s"parse column spec ($item)"))
      }
      val schema = StructType(fields)
      val parts = Option(partBy).toSeq.flatMap(_.split(','))
        .map(unquote).map(_.trim).filter(_.nonEmpty)
      require(orReplace == null || ifNotExists == null,
        "CREATE OR REPLACE TABLE cannot also be IF NOT EXISTS")
      Some(TxnLogCreateTableCommand(destPath, schema, parts,
        refreshNameOf(dest), ifNotExists = ifNotExists != null,
        checks = checks ++ nnChecks, orReplace = orReplace != null))
    // TRUNCATE TABLE is in Spark's grammar (catalog tables only):
    // claimed for txnlog targets as one transactional remove-all
    // commit with row-level delete CDF
    case TruncateStmt(target) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogTruncateCommand(p, refreshNameOf(target)))
    // CREATE OR REPLACE TABLE … AS SELECT: the definition swap and
    // the new data in ONE commit (claimed only for USING txnlog)
    case CreateOrReplaceAs(dest, partBy, loc, query) =>
      val d = dest.trim
      val destPath =
        if (d.startsWith("'") || d.startsWith("`"))
          d.substring(1, d.length - 1)
        else Option(loc).getOrElse(fail(
          s"CREATE OR REPLACE TABLE $d … AS SELECT USING txnlog: an " +
            "identifier destination needs LOCATION '<table dir>'"))
      val parts = Option(partBy).toSeq.flatMap(_.split(','))
        .map(unquote).map(_.trim).filter(_.nonEmpty)
      Some(TxnLogReplaceTableAsCommand(destPath, parts,
        delegate.parsePlan(query), refreshNameOf(dest)))
    // ALTER COLUMN default/nullability: metadata-only commits for
    // txnlog targets (Spark parses these for v2 tables; our claim
    // keeps them off the stock path exactly like the ALTER family)
    case AlterSetDefault(target, c, dflt) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogColumnMetaCommand(p, "default", unquote(c),
          Some(dflt.trim), refreshNameOf(target)))
    case AlterDropDefault(target, c) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogColumnMetaCommand(p, "default", unquote(c), None,
          refreshNameOf(target)))
    case AlterSetNotNull(target, c) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogColumnMetaCommand(p, "notnull", unquote(c), None,
          refreshNameOf(target)))
    case AlterDropNotNull(target, c) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogColumnMetaCommand(p, "nullable", unquote(c), None,
          refreshNameOf(target)))
    // INSERT INTO … REPLACE WHERE: a statement Spark's grammar lacks
    // (its INSERT takes no predicate) — claimed only for a txnlog
    // target, one transactional delete-matching + append commit
    case InsertReplaceWhere(target, pred, query) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogReplaceWhereCommand(p, pred.trim,
          delegate.parsePlan(query), refreshNameOf(target)))
    case FsckStmt(target, dry) =>
      Some(TxnLogFsckCommand(pathOf(spark, delegate, target),
        dryRun = dry != null))
    case GenerateStmt(target) =>
      Some(TxnLogGenerateManifestCommand(pathOf(spark, delegate, target)))
    case CopyIntoStmt(target, src, fmt, fopts, copts) =>
      def kvs(s: String): Map[String, String] =
        Option(s).toSeq.flatMap(PropPair.findAllMatchIn(_).map(m =>
          m.group(1) -> m.group(2))).toMap
      Some(TxnLogCopyIntoCommand(pathOf(spark, delegate, target),
        src, fmt, kvs(fopts),
        force = kvs(copts).get("force").contains("true")))
    // ALTER TABLE is in Spark's own grammar: claim it ONLY for a
    // txnlog target — the commit is a metadata-only schema change in
    // the table's own log (column mapping), not a catalog edit.
    // ADD COLUMNS takes a full multi-column list with optional
    // DEFAULT literals (existence defaults: old files read the
    // default, new nulls stay null).
    case AlterAdd(target, spec) =>
      maybePath(spark, delegate, target).map { p =>
        val cols = splitColSpecs(spec).map {
          case ColSpec(name, dt, dflt) =>
            (unquote(name), delegate.parseDataType(dt),
              Option(dflt).map(_.trim))
          case bad => fail(s"ADD COLUMNS: cannot parse column spec " +
            s"'$bad' (expected: name TYPE [DEFAULT <literal>])")
        }
        TxnLogAddColumnsCommand(p, cols, refreshNameOf(target))
      }
    case AlterRename(target, from, to) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogAlterColumnCommand(p, "rename", unquote(from), None,
          Some(unquote(to)), refreshNameOf(target)))
    // TYPE WIDENING: metadata-only when the change is provably
    // lossless (the parquet readers promote at decode) — txnlog
    // targets only, like the rest of the ALTER family
    case AlterType(target, col, dt) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogAlterColumnCommand(p, "widen", unquote(col),
          Some(delegate.parseDataType(dt)), None, refreshNameOf(target)))
    case AlterDrop(target, cols) =>
      maybePath(spark, delegate, target).map { p =>
        val names = cols.split(',').map(c => unquote(c.trim)).toSeq
        if (names.length == 1)
          TxnLogAlterColumnCommand(p, "drop", names.head, None, None,
            refreshNameOf(target))
        else TxnLogDropColumnsCommand(p, names, refreshNameOf(target))
      }
    case AddConstraint(target, name, expr) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogConstraintCommand(p, unquote(name), Some(expr.trim),
          refreshNameOf(target)))
    case DropConstraint(target, name) =>
      maybePath(spark, delegate, target).map(p =>
        TxnLogConstraintCommand(p, unquote(name), None,
          refreshNameOf(target)))
    case Detail(target) =>
      Some(TxnLogDetailCommand(pathOf(spark, delegate, target)))
    // SET/SHOW TBLPROPERTIES are in Spark's grammar too: txnlog
    // targets only, everything else reaches the stock parser
    case SetProps(target, pairs) =>
      maybePath(spark, delegate, target).map { p =>
        val kvs = PropPair.findAllMatchIn(pairs)
          .map(m => m.group(1) -> m.group(2)).toMap
        if (kvs.isEmpty) fail(
          "SET TBLPROPERTIES: expected ('key'='value', ...) pairs")
        TxnLogSetPropertiesCommand(p, kvs, refreshNameOf(target))
      }
    case ShowProps(target) =>
      maybePath(spark, delegate, target)
        .map(TxnLogShowPropertiesCommand(_))
    case ShowParts(target) =>
      maybePath(spark, delegate, target)
        .map(TxnLogShowPartitionsCommand(_))
    case Convert(target) =>
      val d = target.trim
      val path = if (d.startsWith("'") || d.startsWith("`"))
        d.substring(1, d.length - 1)
      else fail("CONVERT TO TXNLOG takes a quoted parquet directory " +
        "path (the directory is not yet a table the catalog can name)")
      Some(TxnLogConvertCommand(path))
    case CloneStmt(dest, src, v, loc) =>
      val srcPath = pathOf(spark, delegate, src)
      val d = dest.trim
      val destPath =
        if (d.startsWith("'") || d.startsWith("`"))
          d.substring(1, d.length - 1)
        else Option(loc).getOrElse(fail(
          s"CREATE TABLE $d SHALLOW CLONE …: an identifier destination " +
            "needs LOCATION '<table dir>' (or quote a path directly)"))
      val register = refreshNameOf(dest)
      Some(TxnLogCloneCommand(destPath, srcPath,
        Option(v).map(_.toLong), register))
    case _ => None
  }
}

/** `VACUUM t [RETAIN n HOURS]`: reclaim files unreferenced by the
  * retained snapshots (and prune the log/checkpoints below the
  * horizon) — returns the swept relative paths, Delta-style. */
case class TxnLogVacuumCommand(table: String, retainHours: Option[Long],
                               dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.vacuum(table,
      minAgeMs = retainHours.map(_ * 3600L * 1000L)
        .getOrElse(7L * 24 * 60 * 60 * 1000),
      dryRun = dryRun).map(Row(_))
}

/** `OPTIMIZE t [ZORDER BY (a, b, …)]`: one transactional compaction
  * commit — bin-packing without ZORDER; with it, multi-column Hilbert
  * clustering (2-D walk / N-D Skilling transpose) plus fresh stats and
  * blooms on the cluster columns so pruning is effective on every one
  * of them. Returns (version, n_files_after). */
case class TxnLogOptimizeCommand(table: String, zorderBy: Seq[String],
                                 partitions: Seq[(String, String)] = Nil,
                                 incremental: Boolean = false)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v =
      if (zorderBy.isEmpty)
        TxnLog.compact(session, table, partitions = partitions)
      else TxnLog.compact(session, table,
        // enough output files that per-file bounding boxes stay narrow
        // in every clustered column — the point of the zorder layout
        targetFiles = math.max(8, session.sparkContext
          .defaultParallelism / 2),
        clusterBy = zorderBy, hilbert = zorderBy.size >= 2,
        statsCols = zorderBy, bloomCols = zorderBy,
        partitions = partitions, incremental = incremental)
    Seq(Row(v, TxnLog.files(table).size.toLong))
  }
}

/** `FSCK REPAIR TABLE t [DRY RUN]`: drop log entries for data files
  * missing on storage ([[TxnLog.fsck]]) — returns the removed (or,
  * dry, the missing) paths. */
case class TxnLogFsckCommand(table: String, dryRun: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.fsck(table, dryRun).map(Row(_))
}

/** `GENERATE symlink_format_manifest FOR TABLE t`: write the live
  * file set as per-partition symlink manifests for external engines
  * ([[TxnLog.generateManifest]]). */
case class TxnLogGenerateManifestCommand(table: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("manifest", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.generateManifest(table).map(Row(_))
}

/** `COPY INTO t FROM '<dir|glob>' FILEFORMAT = …`: idempotent file
  * ingestion — loaded source files are remembered in the log's
  * `copied` manifest, so re-running the statement loads nothing
  * ([[TxnLog.copyInto]]). Returns Delta's metric row shape
  * (num_affected_rows, num_inserted_rows) plus the commit version. */
case class TxnLogCopyIntoCommand(table: String, source: String,
                                 format: String,
                                 options: Map[String, String],
                                 force: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("num_affected_rows", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, nf, nr) = TxnLog.copyInto(session, table, source, format,
      options, force)
    Seq(Row(nr, nr, nf, v))
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
    AttributeReference("n_cdc_files", LongType, nullable = false)(),
    AttributeReference("commit_ts", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.history(session, table).collect().toSeq
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` / `TO TIMESTAMP AS OF '…'`:
  * roll the table's LIVE state back to a retained snapshot as one new
  * commit ([[TxnLog.restore]] — history is preserved, nothing is
  * deleted; Delta's RESTORE). Returns (restored_to_version,
  * new_version). */
case class TxnLogRestoreCommand(table: String,
                                to: Either[Long, String],
                                refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val target = to match {
      case Left(v) => v
      case Right(ts) => TxnLog.versionAt(table,
        graft.sources.TxnLogSource.parseAsOfMillis(ts))
    }
    val v = TxnLog.restore(session, table, target)
    refreshName.foreach(session.catalog.refreshTable)
    Seq(Row(target, v))
  }
}

/** `ALTER TABLE t ADD|RENAME|DROP COLUMN …` for txnlog targets: each is
  * a METADATA-ONLY commit in the table's own log ([[TxnLog.addColumn]] /
  * [[TxnLog.renameColumn]] / [[TxnLog.dropColumn]] — column mapping
  * keeps old files readable and dropped names un-resurrectable); the
  * session catalog's stored schema copy is advisory and the cached
  * relation is refreshed. Returns the new log version. */
case class TxnLogAlterColumnCommand(table: String, action: String,
                                    col: String,
                                    dataType: Option[org.apache.spark.sql
                                      .types.DataType],
                                    newName: Option[String],
                                    refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = action match {
      case "add" => TxnLog.addColumn(session, table, col, dataType.get)
      case "rename" => TxnLog.renameColumn(session, table, col, newName.get)
      case "drop" => TxnLog.dropColumn(session, table, col)
      case "widen" => TxnLog.widenColumn(session, table, col, dataType.get)
      case other => sys.error(s"unknown ALTER COLUMN action: $other")
    }
    refreshName.foreach(session.catalog.refreshTable)
    Seq(Row(v))
  }
}

/** `ALTER TABLE t DROP COLUMNS (a, b, …)` for txnlog targets: every
  * named column leaves the declaration in ONE metadata commit
  * ([[TxnLog.dropColumns]]). Returns the new version. */
case class TxnLogDropColumnsCommand(table: String, cols: Seq[String],
                                    refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxnLog.dropColumns(session, table, cols)
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `CREATE TABLE <dest> SHALLOW CLONE <src> [VERSION AS OF n]
  * [LOCATION '<dir>']`: zero-copy table branch —
  * [[TxnLog.shallowClone]] commits a v1 log that REFERENCES the source
  * snapshot's files; an identifier destination is then registered as a
  * catalog table over the clone directory. Returns (version,
  * n_files_referenced). */
case class TxnLogCloneCommand(dest: String, source: String,
                              sourceVersion: Option[Long],
                              registerAs: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxnLog.shallowClone(session, source, dest, sourceVersion)
    registerAs.foreach { name =>
      // the identifier is regex-constrained ([\w.]+) by the statement
      // matcher, but re-assert it here (this command is constructible
      // programmatically) and single-quote-escape the interpolated
      // LOCATION so a quote in the destination path cannot break out
      // of the literal (statement injection)
      require(name.matches("""[\w]+(\.[\w]+)*"""),
        s"clone registration: invalid table identifier $name")
      val quoted = name.split('.').map(p => s"`$p`").mkString(".")
      val escDest = dest.replace("'", "''")
      session.sql(s"CREATE TABLE $quoted USING txnlog LOCATION '$escDest'")
    }
    Seq(Row(v, TxnLog.files(dest).size.toLong))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` /
  * `DROP CONSTRAINT name` for txnlog targets (Delta's constraint DDL):
  * ADD validates existing rows first and refuses on violations, DROP
  * stops enforcement — both metadata-only commits. Returns the new
  * log version. */
case class TxnLogConstraintCommand(table: String, name: String,
                                   checkExpr: Option[String],
                                   refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = checkExpr match {
      case Some(e) => TxnLog.addCheck(session, table, name, e)
      case None => TxnLog.dropCheck(session, table, name)
    }
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `DESCRIBE DETAIL t` (Delta's table-detail utility): one row of
  * head-snapshot facts served ENTIRELY from the log — version, live
  * file count, total bytes, row count (null when any file predates
  * rowcount recording), partition columns, properties, constraint
  * count. No data file is opened. */
case class TxnLogDetailCommand(table: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)(),
    AttributeReference("partition_columns", StringType,
      nullable = false)(),
    AttributeReference("properties", StringType, nullable = false)(),
    AttributeReference("n_constraints", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, nFiles, size, nRows, partCols, props, checks) =
      TxnLog.detail(table)
    Seq(Row("txnlog", table, v, nFiles, size,
      nRows.map(Long.box).orNull,
      partCols.mkString(","),
      props.toSeq.sorted.map { case (k, pv) => s"$k=$pv" }
        .mkString(","),
      checks.size.toLong))
  }
}

/** `ALTER TABLE t SET TBLPROPERTIES ('k'='v', …)` for txnlog targets:
  * one metadata commit of sticky key→value `prop` lines (last writer
  * wins per key — the channel columnMapping itself rides). Returns the
  * new log version. */
case class TxnLogSetPropertiesCommand(table: String,
                                      props: Map[String, String],
                                      refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxnLog.setProperties(session, table, props)
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `SHOW TBLPROPERTIES t` for txnlog targets: the head snapshot's
  * sticky properties as (key, value) rows — from the log, not the
  * session catalog's stored copy. */
case class TxnLogShowPropertiesCommand(table: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxnLog.properties(table).toSeq.sorted
      .map { case (k, v) => Row(k, v) }
}

/** `SELECT … FROM table_changes('t' | '/path', startV [, endV])` —
  * Delta's CDF table-valued function: resolves to the same
  * `readChangeFeed` relation the format string serves (row-level
  * insert/update_pre/update_post/delete records with
  * `_commit_version`), so the feed is queryable inline in any SQL
  * statement. Versions are inclusive; endV defaults to the head. */
object TableChangesFunction {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100",
      messageParameters = Map("message" -> msg))

  private def litOf(e: Expression, what: String): Any = e match {
    case Literal(v, _) if v != null => v
    case other => fail(
      s"table_changes: $what must be a non-null literal, got $other")
  }

  def plan(args: Seq[Expression]): LogicalPlan = {
    if (args.size < 2 || args.size > 3)
      fail("table_changes(table, start_version[, end_version]) takes " +
        s"2 or 3 arguments, got ${args.size}")
    val spark = SparkSession.active
    val target = String.valueOf(litOf(args(0), "table"))
    val from = litOf(args(1), "start_version")
      .asInstanceOf[Number].longValue
    val path =
      if (target.contains("/")) target
      else TxnLogSqlSurface
        .lookupPath(spark, target.split('.').toSeq)
        .getOrElse(fail(s"table_changes: $target is not a txnlog " +
          "view, table, or path"))
    val rd = spark.read.format("txnlog").option("path", path)
      .option("readChangeFeed", "true")
      .option("startingVersion", from.toString)
    val rd2 =
      if (args.size == 3)
        rd.option("endingVersion", litOf(args(2), "end_version")
          .asInstanceOf[Number].longValue.toString)
      else rd
    org.apache.spark.sql.GraftShim.logicalPlan(rd2.load())
  }
}

/** `CONVERT TO TXNLOG '/path/to/parquet'` — adopt an existing plain
  * parquet directory (flat or hive-partitioned) as a txnlog table in
  * place ([[TxnLog.convertFromParquet]]): one metadata commit logging
  * the files already there, zero bytes rewritten. Returns (version,
  * n_files). */
case class TxnLogConvertCommand(table: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxnLog.convertFromParquet(session, table)
    Seq(Row(v, TxnLog.files(table).size.toLong))
  }
}

/** `CREATE TABLE d (col type, …) USING txnlog [PARTITIONED BY (…)]
  * [LOCATION '…']` — DDL-first table creation: an EMPTY transactional
  * table born from its declared schema ([[TxnLog.createEmpty]] — one
  * v1 metadata commit, partitioning recorded as the sticky
  * `graft.partitionBy` property until the first file lands). An
  * identifier destination is registered as a catalog table over the
  * directory. Returns the created version. */
case class TxnLogCreateTableCommand(dest: String, tableSchema: StructType,
                                    partitionBy: Seq[String],
                                    registerAs: Option[String],
                                    ifNotExists: Boolean,
                                    checks: Seq[(String, String)] = Nil,
                                    orReplace: Boolean = false)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    if (TxnLog.exists(dest)) {
      if (orReplace)
        // one commit swaps definition + live set; history preserved
        TxnLog.replaceTable(session, dest, tableSchema, partitionBy,
          checks)
      else if (!ifNotExists) throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3100",
        messageParameters = Map("message" ->
          (s"CREATE TABLE: table already exists at $dest " +
            "(use IF NOT EXISTS for the idempotent form, " +
            "OR REPLACE for the transactional swap)")))
    } else TxnLog.createEmpty(session, dest, tableSchema, partitionBy,
      checks = checks)
    registerAs.foreach { name =>
      require(name.matches("""[\w]+(\.[\w]+)*"""),
        s"invalid table identifier: $name")
      val quoted = name.split('.').map(p => s"`$p`").mkString(".")
      val escDest = dest.replace("'", "''")
      if (!session.catalog.tableExists(name))
        session.sql(
          s"CREATE TABLE $quoted USING txnlog LOCATION '$escDest'")
      else if (orReplace)
        // the catalog entry's cached schema must follow the swap
        try session.catalog.refreshTable(name)
        catch { case scala.util.control.NonFatal(_) => () }
    }
    Seq(Row(TxnLog.versions(dest).last))
  }
}

/** `CREATE OR REPLACE TABLE d USING txnlog [PARTITIONED BY (…)]
  * [LOCATION …] AS SELECT …`: definition + data swap in ONE commit
  * ([[TxnLog.replaceTableAs]]); a fresh path is plain CTAS
  * ([[TxnLog.create]]). Returns the new version. */
case class TxnLogReplaceTableAsCommand(dest: String,
                                       partitionBy: Seq[String],
                                       query: LogicalPlan,
                                       registerAs: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans
    .QueryPlan[_]] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftShim.ofRows(session, query)
    if (TxnLog.exists(dest))
      TxnLog.replaceTableAs(session, dest, df, partitionBy)
    else TxnLog.create(session, dest, df, partitionBy = partitionBy)
    registerAs.foreach { name =>
      require(name.matches("""[\w]+(\.[\w]+)*"""),
        s"invalid table identifier: $name")
      val quoted = name.split('.').map(p => s"`$p`").mkString(".")
      val escDest = dest.replace("'", "''")
      if (!session.catalog.tableExists(name))
        session.sql(
          s"CREATE TABLE $quoted USING txnlog LOCATION '$escDest'")
      else
        try session.catalog.refreshTable(name)
        catch { case scala.util.control.NonFatal(_) => () }
    }
    Seq(Row(TxnLog.versions(dest).last))
  }
}

/** ALTER COLUMN metadata commits for txnlog targets: `kind` ∈
  * default (SET/DROP DEFAULT via `arg`), notnull (SET NOT NULL),
  * nullable (DROP NOT NULL). Returns the new version. */
case class TxnLogColumnMetaCommand(table: String, kind: String,
                                   colName: String, arg: Option[String],
                                   refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = kind match {
      case "default" =>
        TxnLog.setColumnDefault(session, table, colName, arg)
      case "notnull" =>
        TxnLog.setColumnNullability(session, table, colName,
          nullable = false)
      case "nullable" =>
        TxnLog.setColumnNullability(session, table, colName,
          nullable = true)
      case other => sys.error(s"unknown column-meta kind: $other")
    }
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `TRUNCATE TABLE t` for txnlog targets: one transactional commit
  * removing every live file ([[TxnLog.truncate]] — TRULY pure
  * metadata: zero data bytes touched, schema/constraints/partitioning
  * survive; no row-level CDF, so a change window crossing it refuses
  * like CREATE OR REPLACE). Returns the new version. */
case class TxnLogTruncateCommand(table: String,
                                 refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxnLog.truncate(session, table)
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `INSERT INTO t REPLACE WHERE <pred> SELECT …` for txnlog targets:
  * one transactional commit that deletes every row matching the
  * predicate and appends the query output ([[TxnLog.replaceWhere]] —
  * victim files stats-scoped, untouched files keep their identity,
  * batch must satisfy the predicate). Returns the new version. */
case class TxnLogReplaceWhereCommand(table: String, predSql: String,
                                     query: LogicalPlan,
                                     refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans
    .QueryPlan[_]] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftShim.ofRows(session, query)
    val v = TxnLog.replaceWhere(session, table, predSql, df)
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `ALTER TABLE t ADD COLUMNS (a INT DEFAULT 5, b STRING, …)` for
  * txnlog targets: one metadata commit adding every column
  * ([[TxnLog.addColumns]]); DEFAULT literals become existence
  * defaults — pre-evolution rows read the default, post-evolution
  * nulls stay null. Returns the new log version. */
case class TxnLogAddColumnsCommand(table: String,
                                   cols: Seq[(String,
                                     org.apache.spark.sql.types.DataType,
                                     Option[String])],
                                   refreshName: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = TxnLog.addColumns(session, table, cols)
    refreshName.foreach(n =>
      try session.catalog.refreshTable(n)
      catch { case scala.util.control.NonFatal(_) => () })
    Seq(Row(v))
  }
}

/** `SHOW PARTITIONS t` for txnlog targets: hive-style partition
  * strings with their LIVE row counts (rowcounts minus journaled DV
  * deletions) — answered entirely from the log, no data file opens.
  * `n_rows` is null when any live file predates rowcount recording. */
case class TxnLogShowPartitionsCommand(table: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    val counts = TxnLog.partitionRowCounts(table)
    val parts = TxnLog.partitionValues(table)
    if (parts.isEmpty) throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100",
      messageParameters = Map("message" ->
        s"SHOW PARTITIONS: $table is not partitioned"))
    parts.toSeq.map(p => p.map { case (k, v) => s"$k=$v" }.mkString("/"))
      .sorted.map { label =>
        val n = counts.flatMap(_.find { case (pv, _) =>
          pv.map { case (k, v) => s"$k=$v" }.mkString("/") == label
        }.map(_._2))
        Row(label, n.map(Long.box).orNull)
      }
  }
}
