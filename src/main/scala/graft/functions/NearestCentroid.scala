package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Index of the nearest centroid (IVF cell assignment): for a row vector v
  * and a plan-time centroid matrix C (unit rows), returns
  * `argmax_j Σ_i v_i · C_j_i`.
  *
  * On unit-norm centroids, argmax dot = argmax cosine = argmin euclidean —
  * the row's own norm is a positive constant across cells, so it never
  * needs computing. One expression, one codegen unit: the alternative
  * (an `array(cosine_sim(v, lit(c_0)), …)` + `array_position(array_max)`
  * tree) costs a Janino compile proportional to the cell count and
  * re-reads the vector per cell; this is a single fused two-level loop.
  *
  * The centroid matrix is a constructor parameter, not a child expression:
  * it is always a plan-time constant (the trained codebook), carried into
  * generated code via `addReferenceObj`. Ties break to the lowest index
  * (strict `>`), matching `array_position(.., array_max(..))` semantics.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var best = 0; var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val n = math.min(v.numElements(), c.length)
      var dot = 0.0; var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * c(i); i += 1
      }
      if (dot > bestDot) { bestDot = dot; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val best = ctx.freshName("best"); val bestDot = ctx.freshName("bestDot")
      val c = ctx.freshName("c")
      s"""
         |int $best = 0;
         |double $bestDot = Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $cents.length; $j++) {
         |  double[] $c = $cents[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.$get($i)) * $c[$i];
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    GraftShim.column(NearestCentroid(GraftShim.expression(v), centroids))
}
