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
  * when every per-partition distinct count stays strictly BELOW m, no
  * partial ever fills, absentBound is 0 on every merge input, and all
  * errs are 0 — the sketch IS the exact count. (`= m` is not enough: a
  * full-but-never-evicted partial carries absentBound = its min counter,
  * so merging it charges that bound to the other side's singletons and
  * inflates cnt/err — bounds stay valid, exactness is lost.) Queries that
  * pick m strictly above the vocabulary size are therefore verifiable
  * against a plain GROUP BY oracle; SpaceSavingSpec covers the
  * approximate (evicting) regime's error bound.
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

  // Minimum counter VALUE of a sketch, as the bound on any absent item's
  // true count: a full sketch can only have evicted items whose count was
  // ≤ its current minimum, while a non-full sketch has seen every item it
  // was fed — absent there means exactly zero.
  private def absentBound(buf: java.util.HashMap[String, Array[Long]]): Long =
    if (buf.size < m) 0L
    else {
      var minCnt = Long.MaxValue
      val it = buf.values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c < minCnt) minCnt = c }
      minCnt
    }

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

  // Mergeable-summaries rule (Berinde et al. PODS'09, Agarwal et al.
  // PODS'12): an item absent from one FULL input may still have occurred
  // up to that input's minimum counter times (it could have been evicted
  // at exactly that count), so charge that minimum to both cnt and err of
  // every item the other side contributes alone. Keeps the per-item
  // invariant true_count <= cnt <= true_count + err across distributed
  // partial aggregation — the naive union (sum common, keep singletons)
  // violates the lower bound whenever an item was evicted from one
  // partial but survives in another. When neither side ever FILLED
  // (size < m ⇒ absentBound 0 — a full-but-never-evicted side still
  // charges its min counter) this degrades to the exact union,
  // preserving the m > vocabulary oracle-exactness property.
  override def merge(buf: java.util.HashMap[String, Array[Long]],
                     other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val bufBound = absentBound(buf)
    val otherBound = absentBound(other)
    // items only in buf first: charge `other`'s absent bound
    if (otherBound > 0L) {
      val bit = buf.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        if (!other.containsKey(e.getKey)) {
          e.getValue()(0) += otherBound
          e.getValue()(1) += otherBound
        }
      }
    }
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else {
        val v = e.getValue().clone()
        v(0) += bufBound; v(1) += bufBound
        buf.put(e.getKey, v)
      }
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
