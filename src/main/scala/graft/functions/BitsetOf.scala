package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense bitmask (`array<long>`, `nSlots` words) from a set of non-negative
  * int ids: bit `w` of the result is set iff `w` is in the input.
  *
  * The expression-tree form —
  * `transform(sequence(0, nSlots-1), j => aggregate(filter(wids, ...)))` —
  * re-walks the id list once per slot (O(nSlots·|wids|) lambda frames per
  * row) and costs a Janino compile proportional to the nesting. This is
  * one pass: O(nSlots + |wids|), a single codegen unit. Values identical
  * (asserted in tests). Used by the vocabulary-bitmap Jaccard plan, where
  * the per-pair work is `bit_count` over these masks ([[BitAndCount]]). */
case class BitsetOf(child: Expression, nSlots: Int) extends UnaryExpression {
  require(nSlots > 0, s"nSlots must be positive, got $nSlots")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BitsetOf.compute(input.asInstanceOf[ArrayData], nSlots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BitsetOf$$.MODULE$$.compute($c, $nSlots)")

  override protected def withNewChildInternal(newChild: Expression): BitsetOf =
    copy(child = newChild)

  override def prettyName: String = "bitset_of"
}

object BitsetOf {
  def apply(wids: Column, nSlots: Int): Column =
    GraftShim.column(BitsetOf(GraftShim.expression(wids), nSlots))

  def compute(wids: ArrayData, nSlots: Int): GenericArrayData = {
    val out = new Array[Long](nSlots)
    val n = wids.numElements()
    var i = 0
    while (i < n) {
      if (!wids.isNullAt(i)) {
        val w = wids.getInt(i)
        if (w >= 0 && (w >>> 6) < nSlots) out(w >>> 6) |= (1L << (w & 63))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
