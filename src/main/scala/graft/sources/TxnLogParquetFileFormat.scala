package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference,
  UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.hadoop.conf.Configuration

/** The parquet [[org.apache.spark.sql.execution.datasources.FileFormat]]
  * behind every `txnlog` SQL read — Spark's own vectorized
  * `ParquetFileFormat` with two log-format concerns folded in at the
  * reader boundary, so column-mapped AND merge-on-read snapshots keep
  * the vectorized scan (`FileSourceScanExec` + PushedFilters + column
  * pruning) instead of falling back to an external-row
  * `PrunedFilteredScan` (how this surface shipped in round 12 — the
  * single biggest read-path cost at 100 TB, where one DV delete
  * de-vectorized every subsequent SQL read until compaction; Delta
  * solves it the same way, with a DeltaParquetFileFormat that remaps
  * names and applies DV row filters inside the scan).
  *
  * 1. COLUMN MAPPING (`physMap`, logical → physical): data files carry
  *    PHYSICAL column names; the relation's schema carries LOGICAL
  *    ones. Parquet resolves columns by name at reader-construction
  *    time only — output batches/rows are positional — so renaming the
  *    fields of `dataSchema`/`requiredSchema` (and the pushed filters'
  *    attribute references) before delegating to the stock reader is
  *    the COMPLETE remap: zero per-row cost, batch output intact.
  *
  * 2. DELETION VECTORS (`dvMode`): the reader appends Spark's
  *    row-index temporary column
  *    ([[ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME]] — the
  *    `_metadata.row_index` machinery, exact under row-group skipping
  *    and predicate pushdown), filters each file's rows against that
  *    file's SORTED deleted-row-index array, and projects the extra
  *    column away. The per-file arrays arrive through
  *    `PartitionedFile.otherConstantMetadataColumnValues` (planted by
  *    [[TxnLogFileIndex.listFiles]] under [[TxnLogParquetFileFormat.DvKey]]),
  *    so (a) the file list and the skip sets are decided by the SAME
  *    planning pass — one committed version, never a mix — and (b) a
  *    task serializes only ITS files' deletions, no global broadcast.
  *    DV mode turns `supportBatch` off (a row-level subtraction cannot
  *    ride a ColumnarBatch through the scan exec), but the VECTORIZED
  *    parquet decoder still runs underneath, handing out rows from its
  *    batches — decode stays columnar, pushdown and pruning stay live;
  *    only batch handoff above the scan is lost, and `compact()`
  *    (dvclear) restores it.
  */
final class TxnLogParquetFileFormat(physMap: Map[String, String],
                                    val dvMode: Boolean)
    extends ParquetFileFormat {

  import TxnLogParquetFileFormat.DvKey

  private def phys(n: String): String = physMap.getOrElse(n, n)
  private def physStruct(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = phys(f.name))))

  /** Rename the attribute references of a pushed filter to physical
    * names; None = a node this translator does not recognize, which is
    * simply dropped from parquet pushdown (Spark re-applies every
    * filter above the scan — pushdown is an I/O optimization). A
    * partially-translated AND keeps the translated side (superset-
    * safe); OR and NOT require full translation of their children. */
  private def physFilter(f: sources.Filter): Option[sources.Filter] =
    f match {
      case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
      case sources.EqualNullSafe(a, v) =>
        Some(sources.EqualNullSafe(phys(a), v))
      case sources.GreaterThan(a, v) =>
        Some(sources.GreaterThan(phys(a), v))
      case sources.GreaterThanOrEqual(a, v) =>
        Some(sources.GreaterThanOrEqual(phys(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
      case sources.LessThanOrEqual(a, v) =>
        Some(sources.LessThanOrEqual(phys(a), v))
      case sources.In(a, vs) => Some(sources.In(phys(a), vs))
      case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
      case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
      case sources.StringStartsWith(a, v) =>
        Some(sources.StringStartsWith(phys(a), v))
      case sources.StringEndsWith(a, v) =>
        Some(sources.StringEndsWith(phys(a), v))
      case sources.StringContains(a, v) =>
        Some(sources.StringContains(phys(a), v))
      case sources.And(l, r) => (physFilter(l), physFilter(r)) match {
        case (Some(a), Some(b)) => Some(sources.And(a, b))
        case (one, other) => one.orElse(other)
      }
      case sources.Or(l, r) =>
        for { a <- physFilter(l); b <- physFilter(r) }
          yield sources.Or(a, b)
      case sources.Not(c) => physFilter(c).map(sources.Not)
      case _ => None
    }

  override def supportBatch(sparkSession: SparkSession,
                            schema: StructType): Boolean =
    !dvMode && super.supportBatch(sparkSession, schema)

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[sources.Filter],
      options: Map[String, String],
      hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val rowIdx = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    val hasIdx = requiredSchema.fieldNames.contains(rowIdx)
    val appendIdx = dvMode && !hasIdx
    val reqPhys = StructType(requiredSchema.fields.map(f =>
      if (f.name == rowIdx) f else f.copy(name = phys(f.name))))
    val reqFull =
      if (appendIdx)
        // nullable, matching Spark's own ROW_INDEX_FIELD: the clipped
        // parquet schema marks a non-nullable field REQUIRED and the
        // reader then refuses the (intentionally) absent column instead
        // of treating it as the generated row-index vector
        reqPhys.add(StructField(rowIdx, LongType))
      else reqPhys
    val superReader = super.buildReaderWithPartitionValues(
      sparkSession, physStruct(dataSchema), partitionSchema, reqFull,
      filters.flatMap(physFilter), options, hadoopConf)
    if (!dvMode) return superReader

    // reader output layout: reqFull fields, then partition columns
    val idxPos =
      if (hasIdx) requiredSchema.fieldIndex(rowIdx)
      else requiredSchema.length
    val outTypes = (reqFull.fields.map(_.dataType) ++
      partitionSchema.fields.map(_.dataType)).toIndexedSeq
    // strip the appended temp column (keep a user-requested one)
    val keptOrdinals: IndexedSeq[Int] =
      if (appendIdx)
        (0 until outTypes.length).filterNot(_ == requiredSchema.length)
      else 0 until outTypes.length

    file: PartitionedFile => {
      val deleted = file.otherConstantMetadataColumnValues.get(DvKey)
        .map(_.asInstanceOf[Array[Long]])
        .getOrElse(Array.emptyLongArray)
      val rows0 = superReader(file)
      val rows =
        if (deleted.isEmpty) rows0
        else rows0.filter(r =>
          java.util.Arrays.binarySearch(deleted, r.getLong(idxPos)) < 0)
      if (!appendIdx) rows
      else {
        val proj = UnsafeProjection.create(keptOrdinals.map(i =>
          BoundReference(i, outTypes(i), nullable = true)))
        rows.map(proj)
      }
    }
  }

  override def toString: String =
    if (dvMode) "TxnLogParquet(DV)" else "TxnLogParquet"
  override def hashCode(): Int =
    (physMap, dvMode).hashCode()
  override def equals(other: Any): Boolean = other match {
    case f: TxnLogParquetFileFormat =>
      f.dvMode == dvMode && f.physMapEq == physMap
    case _ => false
  }
  private def physMapEq: Map[String, String] = physMap
}

object TxnLogParquetFileFormat {
  /** Key under which [[TxnLogFileIndex]] plants a file's sorted
    * deleted-row-index array in its `FileStatusWithMetadata` map. */
  val DvKey = "graft.dvRows"
}
