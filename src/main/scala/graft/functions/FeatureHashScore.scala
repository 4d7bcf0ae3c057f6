package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick linear scorer — the fastText-style quality-classifier
  * gate (Weinberger et al. ICML'09 feature hashing; Joulin et al. 2016
  * linear text classifiers): each token hashes into one of `Slots`
  * weight slots (sha-60 mod Slots — no vocabulary, no OOV), the document
  * score is the left-to-right Σ w[slot(token)] over the token stream.
  * Weights here stand in for a trained model as exact rationals
  * c/1000.0 from a fixed integer LCG (the q31 hyperplane trick), so the
  * whole score replays bit-for-bit on any ANSI engine; swapping in real
  * trained weights changes ONE array. One fused loop per row inside
  * whole-stage codegen, zero shuffle, no vocabulary broadcast — the
  * quality-gate scan shape a 100 TB curation pass wants (quality gating
  * itself: q106/q116; this is the model-scored variant).
  */
case class FeatureHashScore(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    FeatureHashScore.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FeatureHashScore$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashScore =
    copy(child = newChild)

  override def prettyName: String = "feature_hash_score"
}

object FeatureHashScore {
  val Slots = 64

  /** Exact-rational weight table: weightInt(i)/1000.0 — the same
    * embed-small-integers trick as HyperplaneSig, so the oracle writes
    * the identical doubles as literals. */
  def weightInt(i: Int): Long =
    ((i * 9176L + 917L) * 2654435761L) % 2001L - 1000L

  private val weights: Array[Double] =
    Array.tabulate(Slots)(i => weightInt(i) / 1000.0)

  def compute(text: UTF8String): Double = {
    val toks = text.toString.split(" ", -1)
    var score = 0.0
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val slot = (Sha60.hash(toks(t)) % Slots).toInt
        score += weights(slot)
      }
      t += 1
    }
    score
  }

  def apply(text: Column): Column =
    GraftShim.column(FeatureHashScore(GraftShim.expression(text)))
}
