package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k uniform row sample: keeps the k rows whose (hash, value)
  * pairs are smallest under the lexicographic (hash asc, value asc)
  * order. With `hash` a content hash of a row-unique key (sha-60 of the
  * event id), the kept set is a uniform-without-replacement sample of the
  * group's ROWS — the multiplicity-respecting sample that distinct-set
  * sketches ([[KMinValues]]) cannot provide, and the mergeable,
  * deterministic replacement for `df.sample(seed)`, whose output depends
  * on partition layout. The quantile/mean of the sample estimates the
  * group's value distribution within the usual k^-1/2 sampling error.
  *
  * Determinism: the result is value-defined — the k smallest pairs of a
  * fixed input multiset — so it is identical for ANY partitioning, merge
  * order, or retry, and an ANSI-SQL oracle replays it as
  * `row_number() OVER (ORDER BY h, v) <= k`. (Equal (h, v) pairs are
  * interchangeable: whichever copy survives, the output multiset is the
  * same.) State: ≤ k (long, double) pairs per group per task; map-side
  * combine sends at most k pairs; merge is a bounded set-union.
  */
case class BottomKSample(
    hash: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]]
  with BinaryLike[Expression] {
  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = hash
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint hash, double value), got " +
          s"(${h.catalogString}, ${v.catalogString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  private def add(buf: java.util.TreeSet[(Long, Double)], p: (Long, Double)): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (ord.lt(p, buf.last())) {
      if (buf.add(p)) { buf.remove(buf.last()); () }
      // an exact duplicate pair failing the add is fine: equal pairs are
      // interchangeable and one copy is already sampled
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Double)],
                      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Double)],
                     other: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      out(i) = InternalRow(h, v)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (h, v) = it.next(); bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(hash = newLeft, value = newRight)

  override def prettyName: String = "bottom_k_sample"
}

object BottomKSample {
  def apply(hash: Column, value: Column, k: Int): Column =
    GraftShim.column(BottomKSample(
      GraftShim.expression(hash), GraftShim.expression(value), k)
      .toAggregateExpression())
}
