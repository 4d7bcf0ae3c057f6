package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal & El Abbadi,
  * ICDT'05): tracks at most `m` counters; a new item evicts the current
  * minimum counter and inherits its count as its error bound. Guarantees
  * `true_count <= cnt <= true_count + err` per surviving item, and every
  * item with frequency > N/m survives. Merge combines counters keyed by
  * item and trims back to the top `m` by count (the mergeable-summaries
  * treatment: Berinde et al., PODS'09 / Agarwal et al., PODS'12).
  *
  * Scale: state is O(m) entries per group no matter the input size — the
  * bounded-state alternative to an exact `groupBy(token).count()` whose
  * shuffle carries the full vocabulary. Partial aggregation applies:
  * map-side buffers send at most m (token, cnt, err) triples per task.
  *
  * Exactness property (the oracle hook, same pattern as [[KMinValues]]):
  * when every per-partition distinct count stays ≤ m, no counter is ever
  * evicted, merges never trim, and all errs are 0 — the sketch IS the
  * exact count. Queries that pick m above the vocabulary size are
  * therefore verifiable against a plain GROUP BY oracle; SpaceSavingSpec
  * covers the approximate (evicting) regime's error bound.
  */
case class SpaceSaving(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
  with UnaryLike[Expression] {
  require(m > 0, s"capacity must be positive, got $m")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  private def minEntry(buf: java.util.HashMap[String, Array[Long]]): String = {
    var minKey: String = null
    var minCnt = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      // tie-break on token so eviction order is deterministic
      if (c < minCnt || (c == minCnt && (minKey == null || e.getKey < minKey))) {
        minCnt = c; minKey = e.getKey
      }
    }
    minKey
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
                      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != null) cur(0) += 1L
      else if (buf.size < m) buf.put(key, Array(1L, 0L))
      else {
        val evict = minEntry(buf)
        val minCnt = buf.remove(evict)(0)
        buf.put(key, Array(minCnt + 1L, minCnt))
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Array[Long]],
                     other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else buf.put(e.getKey, e.getValue().clone())
    }
    if (buf.size > m) {
      val keep = sorted(buf).take(m).map(_._1).toSet
      val kit = buf.keySet().iterator()
      while (kit.hasNext) if (!keep.contains(kit.next())) kit.remove()
    }
    buf
  }

  private def sorted(buf: java.util.HashMap[String, Array[Long]]): Seq[(String, Array[Long])] = {
    import scala.jdk.CollectionConverters._
    buf.entrySet().asScala.toSeq.map(e => (e.getKey, e.getValue))
      .sortBy { case (k, v) => (-v(0), k) }
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val rows = sorted(buf).map { case (k, v) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), v(0), v(1)))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) {
      val k = in.readUTF()
      buf.put(k, Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSaving =
    copy(child = newChild)

  override def prettyName: String = "space_saving"
}

object SpaceSaving {
  def apply(item: Column, m: Int): Column =
    GraftShim.column(
      SpaceSaving(GraftShim.expression(item), m).toAggregateExpression())
}
