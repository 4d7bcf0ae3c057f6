package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature: `nPlanes` sign bits of
  * `v · plane_p` packed into a long.
  *
  * The pure-expression-tree form ([[VectorOps.randomHyperplaneSig]])
  * expands to nPlanes × dim `element_at` terms — a 512-node tree at
  * (8 planes, 64 dims) whose codegen compile time dwarfs its runtime on
  * anything but huge inputs. Here the plane matrix is a precomputed
  * double[][] reference object and the projection is two nested loops.
  * Same deterministic lattice, same bits.
  */
case class HyperplaneSig(child: Expression, dim: Int, nPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> argument, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Same lattice as VectorOps.randomHyperplaneSig — components in
    * [-1, 1], deterministic in (p, i). */
  @transient lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, i) =>
      (((p * 1009 + i * 9176 + 917) * 2654435761L) % 2001 - 1000) / 1000.0)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0; var i = 0
      val plane = planes(p)
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        proj += x * plane(i); i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
              else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val proj = ctx.freshName("proj"); val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |${ev.value} = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += ${get(a, i)} * $mat[$p][$i];
         |  }
         |  if ($proj >= 0) ${ev.value} |= (1L << $p);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {
  def apply(v: Column, dim: Int, nPlanes: Int): Column =
    GraftShim.column(HyperplaneSig(GraftShim.expression(v), dim, nPlanes))
}
