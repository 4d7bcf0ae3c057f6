package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Hilbert-curve index: maps a (x, y) cell on the 2^bits × 2^bits grid
  * to its position along the order-`bits` Hilbert space-filling curve
  * (the standard xy2d rotate-and-accumulate walk).
  *
  * The layout companion to [[ZValue]]: both linearize two dimensions
  * for min/max-stats clustering, but Hilbert preserves locality
  * strictly better — every curve step is an ADJACENT grid cell, so a
  * contiguous index range maps to a compact region with no Z-shaped
  * jumps, which tightens per-file bounding boxes and skips more row
  * groups at equal file counts (the reason Delta/Iceberg offer Hilbert
  * next to Z-order). Per-row cost is a `bits`-iteration shift/branch
  * loop fused into whole-stage codegen, same budget as [[ZValue]].
  *
  * Inputs are masked to `bits` bits; 2·bits ≤ 62 keeps the index in a
  * positive long.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  private val mask: Long = (1L << bits) - 1

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {
  def apply(a: Column, b: Column, bits: Int): Column =
    GraftShim.column(
      HilbertIndex(GraftShim.expression(a), GraftShim.expression(b), bits))

  /** ANSI-SQL twin as chained CTE steps (for DuckDB oracles): the
    * rotate-and-accumulate walk unrolled, one CTE per order level.
    * `from` must expose columns `$xCol`, `$yCol` (masked by the caller
    * or in-range); emits CTEs `h0..h$bits` where `h$bits` carries the
    * final index in column `hd`. All integer CASE/bit arithmetic —
    * bit-identical to the expression.
    */
  def oracleCtes(from: String, xCol: String, yCol: String,
                 bits: Int): String = {
    val steps = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val rx = s"(CASE WHEN (hx$i & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy$i & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h${i + 1} AS (SELECT * EXCLUDE (hx$i, hy$i, hd$i),
         |    CASE WHEN $ry = 1 THEN hx$i
         |         WHEN $rx = 1 THEN $s - 1 - hy$i ELSE hy$i END AS hx${i + 1},
         |    CASE WHEN $ry = 1 THEN hy$i
         |         WHEN $rx = 1 THEN $s - 1 - hx$i ELSE hx$i END AS hy${i + 1},
         |    hd$i + $s * $s * xor(3 * $rx, $ry) AS hd${i + 1}
         |  FROM h$i)""".stripMargin
    }
    (s"""h0 AS (SELECT *, CAST($xCol AS BIGINT) & ${(1L << bits) - 1} AS hx0,
        |    CAST($yCol AS BIGINT) & ${(1L << bits) - 1} AS hy0,
        |    CAST(0 AS BIGINT) AS hd0 FROM $from)""".stripMargin +: steps)
      .mkString(",\n") + s",\nhf AS (SELECT *, hd$bits AS hd FROM h$bits)"
  }
}
