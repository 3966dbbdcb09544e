package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.BroadcastMode

/** HashedRelation-style broadcast mode for the as-of build side: the
  * rows are grouped-by-key and time-sorted ONCE ON THE DRIVER, inside
  * `BroadcastExchangeExec`'s relation build, and ship in that prebuilt
  * order — executors never re-sort (round 2 re-grouped + re-sorted the
  * raw broadcast array once per executor).
  *
  * `sortKeys` are the (key..., time) expressions BOUND to the build
  * plan's output (the same pre-bound-expressions contract as Spark's
  * `HashedRelationBroadcastMode`). The relation value is a plain
  * `Array[InternalRow]` in (key, time) order: `BroadcastExchangeExec`
  * accepts exactly `HashedRelation` (a sealed private trait) or
  * `Array[InternalRow]` from a mode's `transform`, and the sorted
  * array is the one prebuilt shape expressible in the public type —
  * [[BroadcastAsOfJoinExec]] then derives its key→run index with a
  * single linear pass instead of a sort.
  */
case class AsOfSortedBroadcastMode(sortKeys: Seq[Expression])
    extends BroadcastMode {

  override def transform(rows: Array[InternalRow]): Array[InternalRow] =
    doTransform(rows.iterator)

  override def transform(rows: Iterator[InternalRow],
      sizeHint: Option[Long]): Array[InternalRow] =
    doTransform(rows)

  private def doTransform(rows: Iterator[InternalRow]): Array[InternalRow] = {
    val proj = UnsafeProjection.create(sortKeys)
    val ord = PlanUtil.naturalOrdering(sortKeys.map(_.dataType))
    // pair each row with its projected (key, time) tuple so the sort
    // projects once per row, not once per comparison
    val keyed = rows.map { r =>
      (proj(r).copy(), r)
    }.toArray
    java.util.Arrays.sort(keyed,
      (a: (UnsafeRow, InternalRow), b: (UnsafeRow, InternalRow)) =>
        ord.compare(a._1, b._1))
    keyed.map(_._2)
  }

  override lazy val canonicalized: BroadcastMode =
    copy(sortKeys = sortKeys.map(_.canonicalized))
}
