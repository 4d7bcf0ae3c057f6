package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Product-quantization encoder: split a d-dim vector into `nSub`
  * contiguous subvectors and replace each with the index of its nearest
  * codebook centroid — the vector becomes `nSub` small ints (here 8
  * bytes instead of 256), which is what an ANN index scans at corpus
  * scale (FAISS-style IVFADC; Jégou et al., TPAMI 2011).
  *
  * Nearest = argmin over centroids c of ‖v_s − C_c‖², computed through
  * the oracle-replayable score `K_c − 2·⟨v_s, C_c⟩` where
  * `K_c = ‖C_c‖²` is a plan-time constant: the row norm ‖v_s‖² is the
  * same for every candidate, so it never participates — and, unlike the
  * full distance, the score's float shape (one constant minus one
  * left-to-right dot fold, doubled) is reproducible verbatim in ANSI SQL
  * (`K - 2*list_inner_product(...)`), so code assignment hash-matches a
  * DuckDB oracle. Ties break to the lowest centroid index (strict `<`).
  *
  * Codebooks and the `K` row are constructor parameters, not child
  * expressions — plan-time constants carried into generated code via
  * `addReferenceObj` (same design as [[NearestCentroid]], which handles
  * the single-codebook case). One fused three-level loop, one codegen
  * unit; the expression tree alternative would Janino-compile
  * nSub × nCents dot products separately.
  */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]],
                    kTerm: Array[Array[Double]]) extends UnaryExpression {

  private val nSub = codebooks.length
  private val subDim = if (nSub == 0) 0 else codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // Returns null for vectors shorter than nSub*subDim EVEN when the child
  // is non-nullable — without this override codegen receives a literal
  // `false` for ev.isNull, emits `false = true;`, fails Janino, and every
  // projection over a non-nullable input silently drops to the
  // interpreter (exactly the per-row cost this native expression exists
  // to avoid). CODEGEN_ONLY test in SketchSpec pins it.
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < nSub * subDim) return null
    val isF = elemIsFloat
    val codes = new Array[Int](nSub)
    var s = 0
    while (s < nSub) {
      val off = s * subDim
      val cents = codebooks(s)
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (isF) v.getFloat(off + i).toDouble else v.getDouble(off + i)
          dot += x * cent(i)
          i += 1
        }
        val score = kTerm(s)(c) - 2.0 * dot
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val kt = ctx.addReferenceObj("kTerm", kTerm, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val dot = ctx.freshName("dot"); val score = ctx.freshName("score")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      val cents = ctx.freshName("cents"); val cent = ctx.freshName("cent")
      val codes = ctx.freshName("codes")
      s"""
         |if ($v.numElements() < ${nSub * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$nSub];
         |  for (int $s = 0; $s < $nSub; $s++) {
         |    int $off = $s * $subDim;
         |    double[][] $cents = $books[$s];
         |    int $best = 0;
         |    double $bestScore = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $cents.length; $c++) {
         |      double[] $cent = $cents[$c];
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        $dot += ((double) $v.$get($off + $i)) * $cent[$i];
         |      }
         |      double $score = $kt[$s][$c] - 2.0 * $dot;
         |      if ($score < $bestScore) { $bestScore = $score; $best = $c; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} = new $arrCls($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  def apply(v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val k = codebooks.map(_.map(c => c.map(x => x * x).sum))
    GraftShim.column(PqEncode(GraftShim.expression(v), codebooks, k))
  }
}
