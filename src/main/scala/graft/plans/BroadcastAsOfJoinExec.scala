package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

import scala.collection.mutable

/** Broadcast as-of join: the build side is broadcast once, grouped by
  * key and time-sorted per executor; every probe row then answers its
  * "greatest build time ≤ probe time" with a floor binary search over
  * the key's sorted run — the reference's `greatest_not_exceeding`
  * (/root/reference/src/algo/search.rs:51-80) run verbatim-in-spirit
  * against executor-local state, including `None`-before-first ⇒
  * null payload (search.rs:66-68). (The search is an independent
  * iterative formulation: the reference's recursive version underflows
  * when the needle precedes the slice — SURVEY §2.1 P3 note — which an
  * inclusive-bounds `lo <= hi` loop with an `ans` cursor cannot do.)
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
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val outputAttrs = output
    val (lKeyExprs, rKeyExprs) = (leftKeys, rightKeys)
    val (lTimeExpr, rTimeExpr) = (leftTime, rightTime)
    val (lOutput, rOutput) = (left.output, right.output)

    val _ = keyTypes // key comparison is byte-wise UnsafeRow equality
    val broadcastId = broadcastRight.id
    val planId = id // local copy — `id` via `this` would capture the plan
    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOutput)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))

      // Group + time-sort the broadcast rows ONCE PER EXECUTOR (the
      // same reason Spark's broadcast joins ship a prebuilt
      // HashedRelation): every task on this executor reuses the map.
      val sorted = BroadcastAsOfJoinExec.buildCache.get(
        (broadcastId, planId), { () =>
          val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
          val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOutput)
          val byKey = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]
          broadcastRight.value.foreach { r =>
            val k = rKeyProj(r).copy()
            byKey.getOrElseUpdate(k, mutable.ArrayBuffer.empty) +=
              ((rTimeProj(r).copy(), r))
          }
          byKey.map { case (k, buf) =>
            k -> buf.sortWith((a, b) => timeOrd.compare(a._1, b._1) < 0).toArray
          }
        })

      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)

      lIter.map { lRow =>
        val run = sorted.getOrElse(lKeyProj(lRow), null)
        var m: InternalRow = nullRight
        if (run != null) {
          val probeTs = lTimeProj(lRow)
          // floor search: greatest index with run(i).ts <= probeTs
          var lo = 0
          var hi = run.length - 1
          var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (timeOrd.compare(run(mid)._1, probeTs) <= 0) {
              ans = mid; lo = mid + 1
            } else hi = mid - 1
          }
          if (ans >= 0) m = run(ans)._2
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
  /** Executor-local memo of grouped+sorted broadcast builds, keyed by
    * (broadcast id, plan id): tasks share one build per executor.
    * Soft values let the JVM reclaim finished queries' builds. */
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
