package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom native UDTF — the Catalyst `Generator` extension point, the one
  * table-function surface the library didn't already exercise (q73/q97 use
  * the BUILT-IN generators `posexplode`/`explode`; this is the API for
  * semantics they can't express). Emits one row per DISTINCT token of a
  * document: `(token, first_pos, n)` — first occurrence position and
  * occurrence count — computed with per-row local state (an insertion-order
  * hash fold) inside the scan. The explode-based equivalent would shuffle
  * every token occurrence to a (doc, token) aggregate; here the per-doc
  * profile costs ZERO shuffle at any corpus size, the degenerate-free form
  * of "flatMap with state" that UDTFs exist for. Registered in SQL as
  * `token_stats` ([[graft.GraftExtensions]]), used as
  * `SELECT token_stats(text) AS (token, first_pos, n)`.
  *
  * Generators run in `GenerateExec` outside whole-stage codegen
  * ([[CodegenFallback]]) — same execution shape as a built-in explode over
  * a computed array, minus that form's intermediate array allocation.
  */
case class TokenStats(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("first_pos", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split(" ", -1).filter(_.nonEmpty)
      // insertion-ordered so emission follows first_pos (output contract
      // still comes from the caller's ORDER BY, not emission order)
      val acc = new java.util.LinkedHashMap[String, Array[Long]]()
      var i = 0
      while (i < toks.length) {
        val e = acc.get(toks(i))
        if (e == null) acc.put(toks(i), Array(i.toLong, 1L)) else e(1) += 1L
        i += 1
      }
      val out = new Array[InternalRow](acc.size())
      val it = acc.entrySet().iterator()
      var k = 0
      while (it.hasNext) {
        val e = it.next()
        out(k) = new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.getKey), e.getValue()(0), e.getValue()(1)))
        k += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}
