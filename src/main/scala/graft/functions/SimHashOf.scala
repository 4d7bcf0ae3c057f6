package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash fingerprint over a column of precomputed token hashes
  * (`array<long>`, multiset — one element per token occurrence): bit i of
  * the result is set iff more token hashes have bit i set than clear.
  *
  * [[SimHash64]] fuses tokenization + xxhash64 + voting into one loop and
  * is the production form. This variant takes the hashes as input so the
  * hash function is the caller's choice — specifically a sha2-derived
  * 60-bit hash that ANSI-SQL engines reproduce bit-for-bit, which is what
  * makes the fingerprint (and the near-dup pairs built from it)
  * oracle-checkable end-to-end instead of rows-only. Same single fused
  * voting loop, zero shuffle; `nBits` caps the vote width (60 for the
  * sha-derived hashes, which only carry 60 bits of entropy).
  */
case class SimHashOf(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits > 0 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashOf.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashOf$$.MODULE$$.compute($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashOf =
    copy(child = newChild)

  override def prettyName: String = "simhash_of"
}

object SimHashOf {
  def apply(hashes: Column, nBits: Int): Column =
    GraftShim.column(SimHashOf(GraftShim.expression(hashes), nBits))

  def compute(hashes: ArrayData, nBits: Int): Long = {
    val votes = new Array[Int](nBits)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var i = 0
        while (i < nBits) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L; var i = 0
    while (i < nBits) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
