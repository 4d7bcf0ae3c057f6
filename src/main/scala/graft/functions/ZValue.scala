package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton / Z-order key: interleave the low `bits` bits of two
  * non-negative longs (`x` even positions, `y` odd), producing a single
  * sort key whose lexicographic order follows the Z space-filling curve.
  *
  * Sorting a table by `z_value(a, b)` clusters BOTH dimensions at once:
  * every output file/row-group then covers a narrow range of `a` AND a
  * narrow range of `b`, so min/max-stats pruning (parquet row groups,
  * file skipping) works for predicates on either column — the
  * multi-dimensional generalization of the reference's single-column
  * `CLUSTER BY symbol` layout (src/db/bigquery/daily_stock_price.sql:17).
  * A plain sort by `a` gives file-level locality only for `a`; `b`
  * spans its full range in every file and nothing can be skipped.
  *
  * Inputs are masked to `bits` bits (callers pre-quantize coordinates;
  * 2·bits ≤ 62 keeps the key in a positive long). The per-row work is a
  * tight shift/or loop — native codegen keeps the 100 TB ingest path
  * inside the scan's whole-stage-codegen fused loop rather than paying
  * a lambda frame per bit (the `transform`+`aggregate` HOF encoding).
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
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
    val x = a.asInstanceOf[Long] & mask
    val y = b.asInstanceOf[Long] & mask
    var z = 0L; var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val z = ctx.freshName("z"); val i = ctx.freshName("i")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_value"
}

object ZValue {
  /** Column wrapper: `ZValue($"day_idx", $"user_id", 11)`. */
  def apply(a: Column, b: Column, bits: Int): Column =
    GraftShim.column(
      ZValue(GraftShim.expression(a), GraftShim.expression(b), bits))

  /** The unrolled ANSI-SQL twin (for DuckDB oracles): a sum of masked
    * shifted bit extractions, bit-identical to the expression. */
  def oracleSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
}
