package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite comparisons against a nanos→micros-converted
  * timestamp column into comparisons on the raw nanos long, so they reach
  * the parquet scan as pushed filters.
  *
  * The events fixture stores TIMESTAMP(NANOS), which Spark reads as a
  * nanos LONG; `Tables.load` surfaces `timestamp_micros(ts div 1000)`.
  * That conversion hides `ts` from predicate pushdown: a filter like
  * `converted >= TIMESTAMP '2024-01-10'` evaluates post-scan
  * (`PushedFilters: []` — full scan at 100 TB). Both steps of the
  * conversion are monotone, and for non-negative nanos
  * `ts div 1000 ⋈ m  ⟺  ts ⋈ f(m)` rewrites exactly:
  *
  *   - `ts div 1000 >= m` ⟺ `ts >= m*1000`           (floor-div lower bound)
  *   - `ts div 1000 <  m` ⟺ `ts <  m*1000`
  *   - `ts div 1000 <= m` ⟺ `ts <  (m+1)*1000`
  *   - `ts div 1000 >  m` ⟺ `ts >= (m+1)*1000`
  *
  * The rule fires only on the exact shape Tables.load builds
  * (`TimestampMicros(IntegralDivide(col, 1000))` compared to a foldable
  * timestamp) with a non-negative literal — conservative by construction.
  * Inject with `spark.sql.extensions=graft.GraftExtensions`.
  */
object NanosPredicatePushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(col div 1000) and yields the raw column. */
  private object ConvertedTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(ts, Literal(1000L, LongType), _))
          if ts.dataType == LongType => Some(ts)
      case _ => None
    }
  }

  /** Micros-since-epoch of a foldable timestamp literal. Bounds: m ≥ 1
    * makes every rewrite below exact for ALL longs including negative
    * nanos (truncating vs floor division only diverges below zero, where
    * both sides are then false/true together); the upper bound keeps
    * (m+1)*1000 from overflowing. */
  private object TsLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case lit: Literal if lit.dataType == TimestampType =>
        Option(lit.value).collect {
          case m: Long if m >= 1 && m < Long.MaxValue / 1000 - 1 => m
        }
      case _ => None
    }
  }

  private def nanos(micros: Long): Literal = Literal(micros * 1000L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(ConvertedTs(ts), TsLiteral(m)) => GreaterThanOrEqual(ts, nanos(m))
    case LessThan(ConvertedTs(ts), TsLiteral(m))           => LessThan(ts, nanos(m))
    case LessThanOrEqual(ConvertedTs(ts), TsLiteral(m))    => LessThan(ts, nanos(m + 1))
    case GreaterThan(ConvertedTs(ts), TsLiteral(m))        => GreaterThanOrEqual(ts, nanos(m + 1))
    // mirrored literal-first forms
    case GreaterThanOrEqual(TsLiteral(m), ConvertedTs(ts)) => LessThan(ts, nanos(m + 1))
    case LessThan(TsLiteral(m), ConvertedTs(ts))           => GreaterThanOrEqual(ts, nanos(m + 1))
    case LessThanOrEqual(TsLiteral(m), ConvertedTs(ts))    => GreaterThanOrEqual(ts, nanos(m))
    case GreaterThan(TsLiteral(m), ConvertedTs(ts))        => LessThan(ts, nanos(m))
  }
}
