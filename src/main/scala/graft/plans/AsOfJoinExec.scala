package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single streaming merge over children that
  * are hash-clustered on the join keys and sorted by (keys, time) —
  * the same distribution/ordering contract as a sort-merge join, so
  * the ONLY data movement is one hash exchange per side (none if the
  * input is already clustered, e.g. bucketed tables). Per partition,
  * both iterators advance monotonically: O(|L| + |R|) time, O(1)
  * state (one candidate build row) — no per-key buffering, no window
  * buffer, no broadcast of an unbounded build side. That is the
  * 100-TB contract: the reference's floor search
  * (/root/reference/src/algo/search.rs:51-80) re-expressed as a merge
  * on co-sorted runs instead of binary search on a materialized slice.
  *
  * Determinism: with build rows unique per (key, time) — the
  * documented contract of graft.operators.AsOfJoin — the emitted
  * match is unique; at equal build times the last row in sort order
  * wins, matching the window (`last` over ts-ordered frame) spelling.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  /** Probe-side order is preserved by the merge. */
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lTimeType = leftTime.dataType
    val rightWidth = right.output.size
    val outputAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOutput = left.output
    val rOutput = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOutput)
      val keyOrd = PlanUtil.naturalOrdering(keyTypes)
      val timeOrd = PlanUtil.naturalOrdering(Seq(lTimeType))
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val rBuf = rIter.buffered

      var cand: InternalRow = null // latest build row usable so far
      var candKey: InternalRow = null // its key (copied)

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        // Consume build rows whose key precedes the probe key, or that
        // share it with time <= probe time; the last kept is the match.
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rKey = rKeyProj(rBuf.head)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) {
            rBuf.next() // stale key group — discard
          } else if (c == 0 &&
              timeOrd.compare(rTimeProj(rBuf.head), lTimeProj(lRow)) <= 0) {
            cand = rBuf.next().copy()
            candKey = lKey.copy()
          } else {
            advancing = false
          }
        }
        // A candidate kept from an earlier, smaller key is not a match.
        val m =
          if (cand != null && keyOrd.compare(candKey, lKey) == 0) cand
          else nullRight
        resultProj(joined(lRow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
