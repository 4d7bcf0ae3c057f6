package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a text column: per token occurrence (multiset
  * voting), each bit position accumulates ±1 from the token's xxhash64;
  * the result packs the positive-vote bits.
  *
  * SimHash is a pure per-row function — the explode + 64-sum-aggregate
  * formulation ([[graft.operators.TextDedup.simhashDocsAgg]]) shuffles
  * per-document vote rows and compiles a 64-aggregate generated class
  * (~11 s of Janino for zero semantic gain). This expression is one loop,
  * zero shuffle, and bit-identical (same tokenization as TextOps.tokens,
  * same XxHash64 seed 42 as the built-in `xxhash64`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(text: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(text)))

  def compute(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val toks = text.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = XxHash64Function.hash(
          UTF8String.fromString(toks(t)), StringType, 42L)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L; var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
