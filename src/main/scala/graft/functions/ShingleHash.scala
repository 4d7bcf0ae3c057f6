package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct hashed n-gram shingles of a text column.
  *
  * Equivalent to the expression-tree pipeline
  * `array_distinct(transform(sequence(1, greatest(#tokens-n+1, 1)),
  * i => xxhash64(concat_ws(" ", slice(tokens, i, n)))))` — which nests
  * four higher-order functions and costs seconds of Janino compile per
  * plan that embeds it. One loop here; hashes are produced by the same
  * `XxHash64Function` (seed 42) Spark's `xxhash64` uses, so values are
  * identical to the built-in form (asserted in tests).
  */
case class ShingleHash(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash"
}

object ShingleHash {
  def apply(text: Column, n: Int): Column =
    GraftShim.column(ShingleHash(GraftShim.expression(text), n))

  /** Split on single spaces dropping empties (TextOps.tokens semantics),
    * hash each n-token window joined by " ", dedupe preserving first
    * occurrence (array_distinct semantics). */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1).filter(_.nonEmpty)
    val nWindows = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nWindows) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
