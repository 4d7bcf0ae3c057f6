package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over numeric arrays.
  *
  * The higher-order-function composition (`aggregate(zip_with(...))`,
  * [[VectorOps.cosine]]) allocates a lambda frame per element and cannot
  * participate in whole-stage codegen's tight loop; this expression
  * compiles to a single fused Java loop (dot + both norms in one pass,
  * no allocation), which is what a 100 TB ANN scan wants. Semantics are
  * identical to the HOF form: left-to-right summation, elements widened
  * to double before any arithmetic — results are bit-identical.
  *
  * Accepts `array<float>` / `array<double>` on either side independently
  * (stored embeddings are float32, query literals are double). Array
  * elements are assumed non-null (embedding columns; enforced upstream).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; i += 1
    }
    var na = 0.0; i = 0
    while (i < x.numElements()) {
      val v = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      na += v * v; i += 1
    }
    var nb = 0.0; i = 0
    while (i < y.numElements()) {
      val v = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      nb += v * v; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, isFloat: Boolean): String =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${get(a, i, lf)} * ${get(b, i, rf)};
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = ${get(a, i, lf)};
         |  $na += $v * $v;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $v = ${get(b, i, rf)};
         |  $nb += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Column wrapper: `CosineSim($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
}
