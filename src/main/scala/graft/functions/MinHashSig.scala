package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native minhash signature: k minhashes of a hashed-shingle array in one
  * pass.
  *
  * The expression-tree form (k × `array_min(transform(...))`) re-walks
  * the shingle array k times and its codegen grows linearly in k — the
  * compile time shows up as multi-second first-query latency. Here one
  * loop over the shingles updates k accumulators; the permutation family
  * is the usual (a_j·h + b_j) mod p with p = 2^31−1 (products stay far
  * below 2^63 — ANSI-safe; see TextDedup.MersennePrime).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val as: Array[Long] = Array.tabulate(k)(j => 2L * j + 1)
  @transient private lazy val bs: Array[Long] = Array.tabulate(k)(j => 7919L * (j + 1))

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val hm = ((sh.getLong(i) % P) + P) % P // pmod
      var j = 0
      while (j < k) {
        val v = (hm * as(j) + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, sh => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $sh.numElements(); $i++) {
         |  long $hm = (($sh.getLong($i) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($hm * $aRef[$j] + $bRef[$j]) % ${P}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def apply(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingles), k))
}
