package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The cross-engine 60-bit hash used by every oracle-verifiable operator:
  * the first 15 hex chars of sha256, parsed base-16 — i.e. the value of
  * `conv(substring(sha2(s, 256), 1, 15), 16, 10)` and of DuckDB's
  * `('0x' || substr(sha256(s), 1, 15))::BIGINT`. Computed here straight
  * from the digest bytes (bytes 0..6 and the high nibble of byte 7), with
  * a thread-local MessageDigest — no hex-string round trip. */
object Sha60 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  def hash(s: String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
    (v << 4) | ((d(7) & 0xFFL) >>> 4)
  }
}

/** Native sha-60 twin of [[ShingleHash]]: distinct hashed n-word shingles,
  * one fused loop instead of the 4-deep higher-order-function tree
  * (`array_distinct(transform(sequence(...), i => conv(substring(sha2(
  * concat_ws(" ", slice(toks, i, n)), 256), 1, 15), 16, 10)))`) whose
  * Janino compile dominates small-corpus wall clock. Values are identical
  * to that tree (asserted in tests) — which is what keeps the MinHash
  * pipeline oracle-verifiable while running at native speed. */
case class ShingleHashSha(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSha.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashSha$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSha =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_sha"
}

object ShingleHashSha {
  def apply(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashSha(GraftShim.expression(text), n))

  /** Same window/dedup semantics as [[ShingleHash.compute]] (including the
    * degenerate one-window case for texts shorter than n tokens). */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1).filter(_.nonEmpty)
    val nWindows = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nWindows) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      seen.add(Sha60.hash(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native sha-60 twin of [[SimHash64]]: tokenization + sha-60 + 60-bit
  * voting fused into one loop. Bit-identical to
  * `SimHashOf(transform(tokens, conv(substring(sha2(t, 256), 1, 15), 16,
  * 10)), 60)` (asserted in tests); exists for the same reason — the HOF
  * form pays a multi-second Janino compile and per-token hex-string
  * allocations. */
case class SimHashSha(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashSha.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSha$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSha =
    copy(child = newChild)

  override def prettyName: String = "simhash_sha"
}

object SimHashSha {
  def compute(text: UTF8String): Long = {
    val votes = new Array[Int](60)
    val toks = text.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = Sha60.hash(toks(t))
        var i = 0
        while (i < 60) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L; var i = 0
    while (i < 60) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def apply(text: Column): Column =
    GraftShim.column(SimHashSha(GraftShim.expression(text)))
}
