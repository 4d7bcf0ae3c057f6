package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** N-dimensional Hilbert-curve index: maps a d-dimensional cell (each
  * coordinate masked to `bits` bits) to its position along the
  * order-`bits` Hilbert curve — the multi-column generalization of the
  * 2-D [[HilbertIndex]] (Delta's `ZORDER BY a, b, c` / Iceberg's
  * hilbert sort take any column count; the 2-D rotate-accumulate walk
  * doesn't generalize, so this uses Skilling's transpose construction:
  * inverse-undo + Gray-encode the coordinates, then bit-interleave —
  * "Programming the Hilbert curve", J. Skilling, AIP Conf. Proc. 707
  * (2004), the standard public formulation).
  *
  * d·bits ≤ 62 keeps the index in a positive long. Locality contract
  * (spec-pinned by enumeration): the index is a bijection onto
  * [0, 2^(d·bits)) and consecutive indexes are grid-ADJACENT cells, so
  * a contiguous index range maps to a compact d-dimensional region —
  * per-file min/max stays narrow in EVERY clustered column, which is
  * the entire point of multi-column clustering at 100 TB.
  *
  * Fully codegen'd: the per-level loop is emitted with the dimension
  * loop unrolled (d is a plan-time constant), so compaction's layout
  * pass stays inside whole-stage codegen.
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression {

  private def d: Int = children.size
  require(d >= 2, s"hilbert_index_n needs >= 2 coordinates, got $d")
  require(bits >= 1 && d * bits <= 62,
    s"need dims*bits <= 62 to fit a positive long, got $d*$bits")

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  private val mask: Long = (1L << bits) - 1

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      x(i) = v.asInstanceOf[Long] & mask
      i += 1
    }
    HilbertIndexN.transposeToIndex(x, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val xs = (0 until d).map(i => ctx.freshName(s"hx$i"))
    val q = ctx.freshName("q"); val p = ctx.freshName("p")
    val t = ctx.freshName("t"); val k = ctx.freshName("k")
    val out = ctx.freshName("hd")
    val loadCoords = evals.zip(xs).map { case (e, x) =>
      s"""${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |long $x = ${e.value} & ${mask}L;""".stripMargin
    }.mkString("\n")
    // inverse undo + Gray encode (dimension loop unrolled; the
    // exchange/invert on x0 vs xi mirrors transposeToIndex exactly)
    val undoBody = (0 until d).map { i =>
      s"""if ((${xs(i)} & $q) != 0L) ${xs(0)} ^= $p;
         |else { long $t$i = (${xs(0)} ^ ${xs(i)}) & $p;
         |  ${xs(0)} ^= $t$i; ${xs(i)} ^= $t$i; }""".stripMargin
    }.mkString("\n")
    val gray = (1 until d)
      .map(i => s"${xs(i)} ^= ${xs(i - 1)};").mkString("\n")
    val applyT = xs.map(x => s"$x ^= $t;").mkString("\n")
    val interleave = (0 until d).map(j =>
      s"$out = ($out << 1) | ((${xs(j)} >>> (${bits - 1} - $k)) & 1L);")
      .mkString("\n")
    val code =
      s"""boolean ${ev.isNull} = false;
         |long ${ev.value} = -1L;
         |$loadCoords
         |if (!${ev.isNull}) {
         |  for (long $q = ${1L << (bits - 1)}L; $q > 1L; $q >>= 1) {
         |    long $p = $q - 1L;
         |    $undoBody
         |  }
         |  $gray
         |  long $t = 0L;
         |  for (long $q = ${1L << (bits - 1)}L; $q > 1L; $q >>= 1)
         |    if ((${xs(d - 1)} & $q) != 0L) $t ^= $q - 1L;
         |  $applyT
         |  long $out = 0L;
         |  for (int $k = 0; $k < $bits; $k++) {
         |    $interleave
         |  }
         |  ${ev.value} = $out;
         |}""".stripMargin
    if (nullable)
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen
        .CodeBlock(Seq(code), Nil))
    else
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen
        .CodeBlock(Seq(code), Nil), isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)

  override def prettyName: String = "hilbert_index_n"
}

object HilbertIndexN {
  def apply(bits: Int, cols: Column*): Column =
    GraftShim.column(
      HilbertIndexN(cols.map(GraftShim.expression), bits))

  /** Spec hook: the interpreted walk on a fresh copy. */
  private[graft] def testIndex(x: Array[Long], bits: Int): Long =
    transposeToIndex(x.clone(), bits)

  /** Skilling's AxesToTranspose followed by bit interleaving. Mutates
    * and consumes `x` (each entry already masked to `bits` bits). */
  private[functions] def transposeToIndex(x: Array[Long],
                                          bits: Int): Long = {
    val n = x.length
    val m = 1L << (bits - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave: level k takes one bit from each transposed axis,
    // x(0)'s bit most significant within the level
    var d = 0L
    var k = 0
    while (k < bits) {
      var j = 0
      while (j < n) {
        d = (d << 1) | ((x(j) >>> (bits - 1 - k)) & 1L)
        j += 1
      }
      k += 1
    }
    d
  }
}
