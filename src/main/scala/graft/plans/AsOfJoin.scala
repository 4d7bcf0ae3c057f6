package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, InterpretedOrdering,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join — the whole-operator extension point exercised end to
  * end: a custom `LogicalPlan` node, a `SparkStrategy` planning it, and a
  * sort-merge `SparkPlan`, surfaced through the public Dataset API via
  * [[graft.operators.AsOf]].
  *
  * Semantics (backward as-of, the market-data/attribution staple): for
  * every left row, attach the single right row with the same key and the
  * greatest `rightTs <= leftTs` (within `toleranceUs`, if set); left rows
  * without a match keep null right columns — a left outer join whose
  * "equality" is temporal precedence. The reference's recency-guarded
  * merge compares *one* extracted timestamp per key (SURVEY §2.7 O11);
  * this operator is the general n-rows-per-key form, which Spark has no
  * built-in for.
  *
  * Spark *can* express it relationally — q36 does, as
  * `union → max-over-preceding-window → filter` — but that plan
  * materializes both streams through one window sort and carries every
  * right column through the union as nullable padding. This exec instead
  * declares `ClusteredDistribution` on the keys and (key, ts) child
  * orderings, so EnsureRequirements co-partitions and sorts both sides
  * (exactly a sort-merge join's requirements: one shuffle each side, no
  * union), and then a single forward merge pass per partition matches
  * every left row in O(|L| + |R|): the right pointer only ever advances
  * within a key group because left timestamps are nondecreasing. State is
  * one buffered right row — at 100 TB the operator is shuffle-bound like
  * any co-partitioned join, with no per-key buffering cliff for hot keys
  * (contrast the window form, which sorts the union of both inputs).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        toleranceUs: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] — injected via `GraftExtensions` (config path)
  * or `spark.experimental.extraStrategies` (live-session path). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        toleranceUs: Option[Long]) extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(Seq(leftTs, rightTs).forall(
    e => e.dataType == TimestampType || e.dataType == LongType),
    "as-of ordering column must be TIMESTAMP or BIGINT")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same contract as a sort-merge equi join: co-partition on the keys...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ...then sort each side by (keys, ts) so one merge pass suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // rows pass through keyed and left-ordered; downstream ops may reuse both
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tol = toleranceUs
    val rightWidth = right.output.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd = InterpretedOrdering.forSchema(keyTypes)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // bind against `output` (right side nullable), not the children's
      // outputs — binding to a non-nullable child attribute would let the
      // generated projection skip null checks on unmatched rows
      val out = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // one buffered right row: the latest with rTs <= current lTs in the
        // current key group (timestamps are micros longs in either type)
        private var matchedRight: InternalRow = _
        private var matchedTs = 0L
        private var nextRight: InternalRow = _ // lookahead (copied)
        private var nextRightKey: InternalRow = _
        // NULL keys and NULL timestamps never satisfy `rKey = lKey AND
        // rTs <= lTs` under SQL comparison semantics, so such right rows
        // are dropped on read (mirrors equi-join build-side behavior)
        private def advanceRight(): Unit = {
          nextRight = null; nextRightKey = null
          while (nextRight == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            if (!k.anyNull && !rTsProj(r).isNullAt(0)) {
              nextRight = r.copy()
              nextRightKey = k.copy()
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // a NULL left key or timestamp can't match any right row, but the
          // row itself is still emitted (left outer contract) with null
          // right columns, without disturbing the merge state
          if (lKey.anyNull || lTsProj(l).isNullAt(0))
            return out(joined(l, nullRight))
          val lTsV = lTsProj(l).getLong(0)
          // drop buffered/lookahead rows from key groups before the left key
          if (matchedRight != null && keyOrd.compare(rKeyProj(matchedRight), lKey) != 0)
            matchedRight = null
          while (nextRight != null && keyOrd.compare(nextRightKey, lKey) < 0)
            advanceRight()
          // consume the current key group up to lTs; last one wins (ties on
          // rTs resolve to the final row in right sort order)
          while (nextRight != null && keyOrd.compare(nextRightKey, lKey) == 0 &&
              rTsProj(nextRight).getLong(0) <= lTsV) {
            matchedRight = nextRight
            matchedTs = rTsProj(nextRight).getLong(0)
            advanceRight()
          }
          val ok = matchedRight != null &&
            keyOrd.compare(rKeyProj(matchedRight), lKey) == 0 &&
            tol.forall(t => lTsV - matchedTs <= t)
          out(joined(l, if (ok) matchedRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
