package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Set-intersection cardinality of two SORTED-ascending, distinct
  * `array<long>` inputs via a linear two-pointer merge — the exact-verify
  * kernel of the Jaccard near-dup paths
  * ([[graft.operators.TextDedup.jaccardNearDupsBitset]] /
  * [[graft.operators.TextDedup.jaccardNearDupsBlocked]]).
  *
  * Why not `size(array_intersect(a, b))`: the built-in materializes an
  * OpenHashSet and an output array PER INVOCATION, and over string token
  * sets it hashes and compares UTF8Strings. The verify step evaluates once
  * per candidate pair — millions of times per band at corpus scale — so
  * the per-call constant is the entire cost model. This expression is one
  * branch-per-element loop over primitive longs: no allocation, no
  * hashing, and it stays inside whole-stage codegen's fused loop.
  *
  * Inputs must be sorted ascending and duplicate-free (the callers build
  * them with `array_sort(array_distinct(...))` once per document, amortized
  * across all of that document's pairs). Elements are non-null by
  * construction (hash outputs). Unsorted input would under-count — the
  * callers' spec pins equivalence against the built-in form.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
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
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var acc = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { acc += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $acc = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $acc++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Column wrapper: `SortedIntersectCount($"hs_a", $"hs_b")`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      SortedIntersectCount(GraftShim.expression(a), GraftShim.expression(b)))
}
