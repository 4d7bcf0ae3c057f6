package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: eager (pre-join) aggregation — Yan & Larson,
  * "Eager Aggregation and Lazy Aggregation" (VLDB'95) — restricted to
  * the case where it is UNCONDITIONALLY sound: MIN/MAX.
  *
  * `Aggregate(g, …, Join(L, R))` normally aggregates after the join, so
  * the shuffle feeding the join carries every fact row. When
  *
  *   - the join is INNER with a purely equi conjunction L.k = R.k,
  *   - the grouping keys are exactly the left-side join keys, and
  *   - every aggregate call is a plain MIN/MAX over left-side columns,
  *
  * the aggregation can run below the join, collapsing L to one row per
  * key first — the join input (and its shuffle) shrinks from \|L\| to
  * \|keys(L)\| rows. Soundness needs no multiplicity reasoning precisely
  * because MIN/MAX are duplication-insensitive: an R side matching a key
  * 0 times still eliminates it (the join runs either way), matching n
  * times duplicates a single pre-aggregated row whose re-MIN/MAX is
  * itself. SUM/COUNT are NOT rewritten — they scale with the join
  * multiplicity, and compensating would need R-side cardinality columns
  * (the general Yan–Larson machinery) for no demo benefit.
  *
  * Conservative by construction: any non-equi conjunct, DISTINCT or
  * FILTER clause, non-attribute grouping, or aggregate touching the
  * right side leaves the plan untouched. The guard on `left` not already
  * being an Aggregate makes the rule idempotent under the optimizer's
  * fixed-point batches.
  */
object EagerMinMaxAggregation extends Rule[LogicalPlan] {

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** By the time user rules run, column pruning has usually inserted a
    * pure-attribute Project between the Aggregate and the Join — see
    * through it (dropping it in the rewrite is safe: the outer Aggregate
    * references a subset of the join's output either way). */
  private object PrunedJoin {
    def unapply(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case Project(projList, j: Join)
          if projList.forall(_.isInstanceOf[Attribute]) => Some(j)
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupExprs, aggExprs,
        PrunedJoin(join @ Join(left, right, Inner, Some(cond), hint)), aggHint)
        if !left.isInstanceOf[Aggregate] =>
      val pairs = splitConj(cond).map {
        case EqualTo(a: Attribute, b: Attribute)
            if left.outputSet.contains(a) && right.outputSet.contains(b) =>
          Some(a)
        case EqualTo(b: Attribute, a: Attribute)
            if left.outputSet.contains(a) && right.outputSet.contains(b) =>
          Some(a)
        case _ => None
      }
      lazy val leftKeys = pairs.flatten
      lazy val groupOk = groupExprs.nonEmpty &&
        groupExprs.forall(_.isInstanceOf[Attribute]) &&
        groupExprs.map(_.asInstanceOf[Attribute]).toSet == leftKeys.toSet
      lazy val aggCalls = aggExprs.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
      lazy val callsOk = aggCalls.nonEmpty && aggCalls.forall { ae =>
        !ae.isDistinct && ae.filter.isEmpty &&
          (ae.aggregateFunction match {
            case Min(c) => c.references.subsetOf(left.outputSet)
            case Max(c) => c.references.subsetOf(left.outputSet)
            case _ => false
          })
      }
      if (pairs.exists(_.isEmpty) || !groupOk || !callsOk) agg
      else {
        // one pre-aggregated column per semantically distinct call
        val aliases = scala.collection.mutable.LinkedHashMap[Expression, Alias]()
        aggCalls.foreach { ae =>
          if (!aliases.contains(ae.canonicalized))
            aliases(ae.canonicalized) = Alias(ae, s"_eager_${aliases.size}")()
        }
        // left join keys keep their exprIds through the partial grouping,
        // so the join condition and outer grouping rebind unchanged
        val partial = Aggregate(leftKeys,
          leftKeys ++ aliases.values.toSeq, left, None)
        val newAggExprs = aggExprs.map(_.transform {
          case ae: AggregateExpression if aliases.contains(ae.canonicalized) =>
            val attr = aliases(ae.canonicalized).toAttribute
            ae.aggregateFunction match {
              case _: Min => ae.copy(aggregateFunction = Min(attr))
              case _: Max => ae.copy(aggregateFunction = Max(attr))
            }
        }.asInstanceOf[NamedExpression])
        Aggregate(groupExprs, newAggExprs,
          Join(partial, right, Inner, Some(cond), hint), aggHint)
      }
  }
}
