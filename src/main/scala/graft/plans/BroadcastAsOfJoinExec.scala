package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

import scala.collection.mutable

/** Broadcast as-of join: the build side ships through
  * [[AsOfSortedBroadcastMode]] — grouped by key and time-sorted ONCE on
  * the driver, HashedRelation-style — and every probe row answers its
  * "greatest build time ≤ probe time" with a floor binary search over
  * its key's sorted run — the reference's `greatest_not_exceeding`
  * (/root/reference/src/algo/search.rs:51-80) run verbatim-in-spirit
  * against broadcast state, including `None`-before-first ⇒ null
  * payload (search.rs:66-68). (The search is an independent iterative
  * formulation: the reference's recursive version underflows when the
  * needle precedes the slice — SURVEY §2.1 P3 note — which an
  * inclusive-bounds `lo <= hi` loop with an `ans` cursor cannot do.)
  *
  * Executors derive the key→run-offsets index from the presorted array
  * with ONE linear pass (memoized per executor) — no re-sort, no
  * per-row hash inserts of unsorted data; the O(n log n) work happens
  * exactly once, in the exchange's relation build.
  *
  * Scale contract: NEITHER side shuffles — the probe streams through
  * unmoved (its partitioning/ordering are preserved), and the build
  * moves once via broadcast. This is the right plan when the build is
  * a bounded dimension (rates, settings, slowly-changing attributes):
  * the merge-based [[AsOfJoinExec]] would pay a full hash exchange of
  * a 100-TB probe to co-locate it with kilobytes of build data. The
  * build must fit in executor memory — the usual broadcast contract.
  */
case class BroadcastAsOfJoinExec(
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
  override def outputOrdering = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(
      AsOfSortedBroadcastMode((rightKeys :+ rightTime)
        .map(BindReferences.bindReference(_, right.output)))) :: Nil

  /** Executor-local index over the presorted broadcast array: key →
    * [start, end) run offsets, plus the projected time of every row. */
  private type RunIndex =
    (mutable.HashMap[UnsafeRow, (Int, Int)], Array[UnsafeRow])

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val outputAttrs = output
    val (lKeyExprs, rKeyExprs) = (leftKeys, rightKeys)
    val (lTimeExpr, rTimeExpr) = (leftTime, rightTime)
    val (lOutput, rOutput) = (left.output, right.output)

    val broadcastId = broadcastRight.id
    val planId = id // local copy — `id` via `this` would capture the plan
    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOutput)
      val timeOrd = PlanUtil.naturalOrdering(Seq(timeType))

      val rows = broadcastRight.value
      // ONE linear pass over the presorted rows builds the key→run
      // index (memoized per executor; no sort — the driver did it).
      val (runs, times) = BroadcastAsOfJoinExec.buildCache.get[RunIndex](
        (broadcastId, planId), { () =>
          val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
          val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOutput)
          val index = mutable.HashMap.empty[UnsafeRow, (Int, Int)]
          val ts = new Array[UnsafeRow](rows.length)
          var runStart = 0
          var prevKey: UnsafeRow = null
          var i = 0
          while (i < rows.length) {
            val k = rKeyProj(rows(i))
            if (prevKey == null) { prevKey = k.copy() }
            else if (k != prevKey) {
              index.put(prevKey, (runStart, i))
              prevKey = k.copy(); runStart = i
            }
            ts(i) = rTimeProj(rows(i)).copy()
            i += 1
          }
          if (prevKey != null) index.put(prevKey, (runStart, rows.length))
          (index, ts)
        })

      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)

      lIter.map { lRow =>
        var m: InternalRow = nullRight
        runs.get(lKeyProj(lRow)) match {
          case Some((start, end)) =>
            val probeTs = lTimeProj(lRow)
            // floor search: greatest i in [start, end) with ts(i) <= probe
            var lo = start
            var hi = end - 1
            var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(times(mid), probeTs) <= 0) {
                ans = mid; lo = mid + 1
              } else hi = mid - 1
            }
            if (ans >= 0) m = rows(ans)
          case None =>
        }
        resultProj(joined(lRow, m))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  /** Executor-local memo of run indexes over presorted broadcasts,
    * keyed by (broadcast id, plan id): tasks share one index per
    * executor. Soft values let the JVM reclaim finished queries'. */
  private[plans] object buildCache {
    private val cache: com.google.common.cache.Cache[String, AnyRef] =
      com.google.common.cache.CacheBuilder.newBuilder()
        .softValues().maximumSize(64).build[String, AnyRef]()
    def get[T <: AnyRef](key: (Long, Int), loader: () => T): T =
      cache.get(s"${key._1}_${key._2}",
        new java.util.concurrent.Callable[AnyRef] {
          override def call(): AnyRef = loader()
        }).asInstanceOf[T]
  }
}
