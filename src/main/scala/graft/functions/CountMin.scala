package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min frequency sketch (Cormode & Muthukrishnan, J.Alg'05): a
  * `depth × width` grid of counters; each input hash increments one cell
  * per row (`cell_i = perm_i(h) mod width`), and a key's frequency
  * estimate is the MIN over its `depth` cells — always ≥ the true count
  * (collisions only inflate), and ≤ true + 2N/width with probability
  * 1 − 2^−depth. The point-query complement of [[SpaceSaving]] (which
  * keeps explicit heavy-hitter identities): Count-Min answers "how often
  * did THIS key occur" for any key in O(depth), with state independent of
  * the key cardinality.
  *
  * Returns the raw counter grid (row-major `depth*width` longs) rather
  * than Spark's built-in `count_min_sketch` binary, for the same reason
  * [[KMinValues]] exists next to HLL: the built-in's serialized layout is
  * engine-private, while a counter grid built from the cross-engine
  * sha-60 + `(2i+1, 7919(i+1)) mod 2^31−1` permutation family (the
  * MinHashSig family, operators/TextDedup.scala) is replayable cell by
  * cell by an ANSI-SQL oracle: cell (i,j) = COUNT(*) of inputs with
  * `perm_i(h) mod width = j`.
  *
  * Scale: state is `depth*width` longs per group (8 KiB at 4×256) no
  * matter how many rows or distinct keys flow in — the wire carries one
  * grid per group per task (map-side combine), and merge is element-wise
  * addition, so the result is exact-order-free: identical for ANY
  * partitioning, micro-batch split, or merge tree. Reference analog: the
  * symbol-frequency profiling of pse-stocks-etl's per-table row counts
  * (src/db/postgres_sync.py:159-175) generalized to unbounded key spaces.
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {
  require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width > 0, s"width must be positive, got $width")

  private val Mod = 2147483647L // 2^31 − 1, the MinHashSig modulus

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input (a hash), got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % Mod // sha-60 inputs are non-negative
      var i = 0
      while (i < depth) {
        val p = (h * (2 * i + 1) + 7919L * (i + 1)) % Mod
        buf(i * width + (p % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)

  override def prettyName: String = "count_min_grid"
}

object CountMin {
  def apply(hash: Column, depth: Int, width: Int): Column =
    GraftShim.column(
      CountMin(GraftShim.expression(hash), depth, width).toAggregateExpression())

  /** Point-query against an evaluated grid: min over the key's cells.
    * Column form so estimates stay inside codegen'd projections. */
  def estimate(grid: Column, hashCol: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val mod = lit(2147483647L)
    val h = hashCol % mod
    val cells = (0 until depth).map { i =>
      val p = (h * lit(2 * i + 1) + lit(7919L * (i + 1))) % mod
      element_at(grid, (lit(i * width) + (p % lit(width))).cast(IntegerType) + 1)
    }
    least(cells: _*)
  }
}
