package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  BoundReference, Cast, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[TxnLog]] tables as a registered Spark data source —
  * `spark.read.format("txnlog").load(path)` and pure SQL
  * (`SELECT … FROM txnlog.`/path/to/table``), with the log's
  * stats/bloom file skipping riding Spark's OWN filter pushdown
  * instead of the hand-called `snapshotWhere*` entry points.
  *
  * Architecture note: this is deliberately the v1 `RelationProvider` +
  * custom [[FileIndex]] shape (how Delta's TahoeFileIndex plugs in, not
  * a bespoke DSv2 reader), because a `HadoopFsRelation` is what
  * `FileSourceStrategy` plans into a `FileSourceScanExec`: the engine
  * then contributes EVERYTHING downstream of file selection for free —
  * vectorized parquet reading, whole-stage codegen, `PushedFilters`
  * into row groups, column pruning, partition-value reattachment. A
  * hand-rolled DSv2 `PartitionReader` would re-implement (and
  * de-vectorize) all of it. The log's job ends where it should: at
  * PLANNING time, [[TxnLogFileIndex.listFiles]] receives Catalyst's
  * split partition/data filters and answers with the pruned file list,
  * decided from committed metadata alone — zero data I/O, no directory
  * listing (the object-store killer at 100 TB).
  *
  * Reference anchor: the reference reads its Delta tables through
  * `spark.read.format("delta")` and temp views
  * (`src/etl/spark_deltalake_sync.py:139,208`); this is that surface
  * for the TxnLog format.
  *
  * Options: `path` (the table directory), `version` (optional time
  * travel, same contract as [[TxnLog.snapshot]]). */
final class TxnLogSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "txnlog"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String])
      : BaseRelation = {
    val table = parameters.getOrElse("path",
      sys.error("txnlog: a table path is required (option 'path')"))
    val asOf = parameters.get("version").map(_.trim.toLong)
    val spark = sqlContext.sparkSession
    val index = new TxnLogFileIndex(spark, table, asOf)
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = index.dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
  }
}

/** Log-planned [[FileIndex]]: the live file set of one TxnLog snapshot,
  * with `listFiles` applying (a) hive partition pruning from Catalyst's
  * partitionFilters and (b) per-file stats-interval + bloom skipping
  * from its dataFilters. SUPERSET contract throughout, exactly like
  * [[TxnLog.snapshotWhereAll]]: a file survives unless its committed
  * metadata PROVES no row can match; the scan re-applies every filter
  * to the rows it reads, so pruning is purely an I/O optimization. */
final class TxnLogFileIndex(spark: SparkSession, table: String,
                            asOf: Option[Long]) extends FileIndex {
  private val vs = TxnLog.versions(table)
  require(vs.nonEmpty, s"not a TxnLog table: $table")
  private val upTo = asOf.getOrElse(vs.last)
  require(vs.contains(upTo), s"version $upTo not in log (have $vs)")
  private val st = TxnLog.replayState(table, upTo)

  /** SQL reads need the log-declared schema: schema-on-read inference
    * would have to open footers (and would mis-order evolved columns). */
  val declared: StructType = st.schemaJson
    .map(DataType.fromJson(_).asInstanceOf[StructType])
    .getOrElse(sys.error(
      s"txnlog relation requires a declared schema in the log: $table"))

  // a HadoopFsRelation is a plain file scan — it cannot subtract
  // row-level deletion vectors; compact() materializes them away
  require(st.dvFiles.isEmpty,
    s"txnlog relation cannot serve a snapshot with live deletion " +
      s"vectors: $table — run TxnLog.compact to purge them first")

  private val partCols: Seq[String] =
    TxnLog.partitionColsOf(st.live).getOrElse(Nil)

  override val partitionSchema: StructType =
    StructType(partCols.map(declared(_)))
  val dataSchema: StructType =
    StructType(declared.filterNot(f => partCols.contains(f.name)))

  private val base = Paths.get(table).toAbsolutePath
  // file sizes come from the LOG (`fsize` actions — Delta's add.size):
  // planning never stats a data file; only files committed before size
  // recording fall back to one filesystem call each
  private val statuses: Map[String, FileStatus] = st.live.map { f =>
    val p = base.resolve(f)
    val len = st.sizes.getOrElse(f, Files.size(p))
    f -> new FileStatus(len, false, 1, 128L * 1024 * 1024,
      0L, new HPath(p.toUri))
  }.toMap

  override def rootPaths: Seq[HPath] = Seq(new HPath(base.toUri))
  override def inputFiles: Array[String] =
    st.live.map(f => base.resolve(f).toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum

  private def tz = spark.sessionState.conf.sessionLocalTimeZone

  /** Canonical-long rendering of a pushed comparison bound, mirroring
    * the stats writer ([[TxnLog]] statsLines): temporal → epoch days
    * (conservative day floor), integrals → the value. None = the type
    * is not stats-canonicalizable → unprunable. */
  private def canonLong(dt: DataType, value: Any): Option[Long] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(value.asInstanceOf[Number].longValue)
    case DateType => Some(value.asInstanceOf[Number].longValue) // days
    case TimestampType => Some(DateTimeUtils.microsToDays(
      value.asInstanceOf[Number].longValue,
      java.time.ZoneId.of(tz)).toLong)
    case _ => None
  }

  /** The bloom probe rendering: the SAME Catalyst cast-to-string the
    * build side hashes (see [[TxnLog]] canonicalProbe — this is its
    * internal-value twin for pushed literals). */
  private def probeString(dt: DataType, value: Any): String = dt match {
    case StringType => value.toString
    case _ => Cast(Literal(value, dt), StringType, Some(tz))
      .eval(null).toString
  }

  /** (column, lo, hi) intervals + (column, probe) equality probes
    * extracted from the pushed data filters. Conjuncts arrive already
    * split; anything unrecognized is simply not used for pruning. */
  private def pruningHints(dataFilters: Seq[Expression])
      : (Seq[(String, Long, Long)], Seq[(String, String)]) = {
    val iv = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val eq = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    dataFilters.foreach {
      case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
        canonLong(a.dataType, l.value).foreach(v => iv += ((a.name, v, v)))
        eq += ((a.name, probeString(l.dataType, l.value)))
      case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
        canonLong(a.dataType, l.value).foreach(v => iv += ((a.name, v, v)))
        eq += ((a.name, probeString(l.dataType, l.value)))
      case GreaterThan(a: AttributeReference, l: Literal)
          if l.value != null =>
        canonLong(a.dataType, l.value)
          .foreach(v => iv += ((a.name, v, Long.MaxValue)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if l.value != null =>
        canonLong(a.dataType, l.value)
          .foreach(v => iv += ((a.name, v, Long.MaxValue)))
      case LessThan(a: AttributeReference, l: Literal) if l.value != null =>
        canonLong(a.dataType, l.value)
          .foreach(v => iv += ((a.name, Long.MinValue, v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if l.value != null =>
        canonLong(a.dataType, l.value)
          .foreach(v => iv += ((a.name, Long.MinValue, v)))
      case GreaterThan(l: Literal, a: AttributeReference)
          if l.value != null => // lit > col ⇒ col < lit
        canonLong(a.dataType, l.value)
          .foreach(v => iv += ((a.name, Long.MinValue, v)))
      case LessThan(l: Literal, a: AttributeReference) if l.value != null =>
        canonLong(a.dataType, l.value)
          .foreach(v => iv += ((a.name, v, Long.MaxValue)))
      case _ => () // IsNotNull, OR-trees, UDF-ish — unprunable, fine
    }
    (iv.toSeq, eq.toSeq)
  }

  private def survives(f: String, iv: Seq[(String, Long, Long)],
                       eq: Seq[(String, String)]): Boolean = {
    val statsOk = iv.forall { case (c, lo, hi) =>
      st.stats.get((f, c)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    val bloomOk = eq.forall { case (c, probe) =>
      st.blooms.get((f, c)) match {
        case Some((m, k, bits)) => (1 to k).forall { i =>
          val p = TxnLog.bloomPos(i, probe, m)
          (bits(p >>> 6) & (1L << (p & 63))) != 0L
        }
        case None => true
      }
    }
    statsOk && bloomOk
  }

  /** Cast one hive path segment value to the partition column's type
    * through Catalyst's string cast (the same conversion Spark's own
    * partition discovery applies). */
  private def partCast(v: String, dt: DataType): Any = {
    val un = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(v)
    if (un == "__HIVE_DEFAULT_PARTITION__") null
    else Cast(Literal(UTF8String.fromString(un), StringType), dt, Some(tz))
      .eval(null)
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val (iv, eq) = pruningHints(dataFilters)
    val pruned = st.live.filter(survives(_, iv, eq))
    if (partCols.isEmpty) {
      Seq(PartitionDirectory(InternalRow.empty,
        pruned.map(statuses).toArray))
    } else {
      // the planner does NOT re-apply partition filters to rows — the
      // index must honor them (PartitioningAwareFileIndex's contract)
      val pred = if (partitionFilters.isEmpty) None
      else Some(Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }))
      pruned.groupBy(f => TxnLog.partValuesOf(f).map(_._2)).toSeq
        .flatMap { case (vals, fs) =>
          val row = InternalRow.fromSeq(
            vals.zip(partitionSchema.fields)
              .map { case (v, fld) => partCast(v, fld.dataType) })
          if (pred.forall(_.eval(row)))
            Some(PartitionDirectory(row, fs.map(statuses).toArray))
          else None
        }
    }
  }
}
