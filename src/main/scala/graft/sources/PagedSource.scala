package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSource V2 re-expression of the reference's paginated directory
  * scan (reference: src/utils/pse_edge.py:70-118 — POST per page, parse
  * table, loop pages 2..N, union).
  *
  * The reference fetches pages serially on the driver; the Spark-native
  * shape is one *input partition per page*, so page fetches run as
  * parallel tasks and the union is free (it's just the set of partitions).
  * The page payload here is a deterministic synthetic directory (this
  * container has no network, by design); a production source would issue
  * the HTTP POST inside `createReader` — one request per task, resumable
  * by Spark's task retry.
  *
  * Usage: `spark.read.format("graft.sources.PagedSource")
  *   .option("pages", 4).option("pageSize", 50).load()`
  *
  * Scale notes: pagination state (total page count) is resolved once at
  * planning; each partition is independent (no driver round-trip per
  * page); schema is fixed and columnar-pruned by Spark's DSv2 scan.
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(
      Option(properties.get("pages")).map(_.toInt).getOrElse(4),
      Option(properties.get("pagesize")).map(_.toInt).getOrElse(50))
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("company_name", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false)))

  /** Deterministic stand-in for one page of the remote directory. */
  def pageRows(page: Int, pageSize: Int): Seq[(String, String, Int)] =
    (0 until pageSize).map { i =>
      val id = page * pageSize + i
      (f"SYM$id%04d", s"Company $id Inc.", page)
    }
}

private class PagedTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged($pages x $pageSize)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var pruned: StructType = PagedSource.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        pruned = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = pruned
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            (1 to pages).map(p => PagePartition(p, pageSize): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory = {
            val fields = pruned.fieldNames
            (partition: InputPartition) => {
              val PagePartition(page, size) = partition.asInstanceOf[PagePartition]
              new PartitionReader[InternalRow] {
                // a real source would issue the page's HTTP POST here
                private val rows = PagedSource.pageRows(page, size).iterator
                private var current: (String, String, Int) = _
                override def next(): Boolean = {
                  if (!rows.hasNext) return false
                  current = rows.next(); true
                }
                override def get(): InternalRow =
                  InternalRow(fields.map {
                    case "symbol" => UTF8String.fromString(current._1)
                    case "company_name" => UTF8String.fromString(current._2)
                    case "page" => current._3
                  }: _*)
                override def close(): Unit = ()
              }
            }
          }
        }
      }
    }
}

private case class PagePartition(page: Int, pageSize: Int) extends InputPartition
