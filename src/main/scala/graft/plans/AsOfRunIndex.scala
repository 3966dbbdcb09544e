package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BaseOrdering, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.DataType

/** Executor-side index over the presorted as-of broadcast array
  * ([[AsOfSortedBroadcastMode]] ships rows in (key, time) order):
  * key → [start, end) run offsets plus each row's projected time.
  * Built with ONE linear pass — the sort happened on the driver.
  *
  * [[find]] is the probe kernel shared by the interpreted
  * (`doExecute`) and whole-stage-codegen paths of
  * [[BroadcastAsOfJoinExec]]: floor binary search for the greatest
  * build time ≤ the probe time inside the key's run — the reference's
  * `greatest_not_exceeding` (search.rs:51-80), `null` when the probe
  * precedes the run (search.rs:66-68).
  */
final class AsOfRunIndex(
    runs: java.util.HashMap[UnsafeRow, Array[Int]],
    times: Array[UnsafeRow],
    rows: Array[InternalRow],
    ord: BaseOrdering) {

  /** Latest build row with time ≤ probeTs for the probe key, or null. */
  def find(key: UnsafeRow, probeTs: InternalRow): InternalRow = {
    val run = runs.get(key)
    if (run == null) return null
    var lo = run(0)
    var hi = run(1) - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(times(mid), probeTs) <= 0) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans >= 0) rows(ans) else null
  }
}

/** Serializable factory shipped into tasks (and referenced from
  * generated code): memoizes one [[AsOfRunIndex]] per executor per
  * (broadcast, plan) through [[BroadcastAsOfJoinExec.buildCache]].
  * Key/time expressions arrive BOUND to the build row layout. */
final case class AsOfIndexFactory(
    boundKeys: Seq[Expression],
    boundTime: Expression,
    timeType: DataType,
    planId: Int) extends Serializable {

  def get(bc: Broadcast[Array[InternalRow]]): AsOfRunIndex =
    BroadcastAsOfJoinExec.buildCache.get[AsOfRunIndex]((bc.id, planId), { () =>
      val rows = bc.value
      val keyProj = UnsafeProjection.create(boundKeys)
      val timeProj = UnsafeProjection.create(Seq(boundTime))
      val index = new java.util.HashMap[UnsafeRow, Array[Int]]()
      val ts = new Array[UnsafeRow](rows.length)
      var runStart = 0
      var prevKey: UnsafeRow = null
      var i = 0
      while (i < rows.length) {
        val k = keyProj(rows(i))
        if (prevKey == null) { prevKey = k.copy() }
        else if (k != prevKey) {
          index.put(prevKey, Array(runStart, i))
          prevKey = k.copy(); runStart = i
        }
        ts(i) = timeProj(rows(i)).copy()
        i += 1
      }
      if (prevKey != null) index.put(prevKey, Array(runStart, rows.length))
      new AsOfRunIndex(index, ts, rows, PlanUtil.naturalOrdering(Seq(timeType)))
    })
}
