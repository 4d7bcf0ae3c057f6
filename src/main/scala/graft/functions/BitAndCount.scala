package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native popcount-of-AND over two `array<long>` bitmasks:
  * `Σ_i bit_count(a[i] & b[i])` — the set-intersection cardinality when the
  * arrays are vocabulary bitmaps ([[graft.operators.TextDedup.jaccardNearDupsBitset]]).
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, bit_count(x & y)))`)
  * allocates a lambda frame per slot and falls out of whole-stage codegen's
  * fused loop; this expression compiles to one tight Java loop over the raw
  * long arrays. The bitset jaccard path evaluates it once per candidate
  * pair — millions of times per bucket at scale — so the per-call constant
  * is the whole cost model. Values are identical to the HOF form.
  *
  * Arrays are assumed element-non-null (they're built by `transform` over
  * `sequence`, which cannot produce null slots). Width mismatch keeps the
  * HOF semantics: zip_with walks max length treating missing as null; here
  * both inputs always share the planner-fixed nSlots width, so we walk the
  * min defensively.
  */
case class BitAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0; var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitAndCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bit_and_count"
}

object BitAndCount {
  /** Column wrapper: `BitAndCount($"m_a", $"m_b")`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      BitAndCount(GraftShim.expression(a), GraftShim.expression(b)))
}
