package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSessionExtensions

/** Planner strategy for the engine's custom logical operators
  * ([[AsOfJoinPlan]] → broadcast or merge exec).
  *
  * Exec choice mirrors Spark's `JoinSelection`: an explicit
  * [[AsOfBuildSide]] hint forces its exec; [[AsOfBuildSide.Auto]]
  * plans [[BroadcastAsOfJoinExec]] (zero shuffle — probe streams
  * unmoved, build floor-indexed on each executor) when the build
  * side's stats-estimated size fits under
  * `spark.sql.autoBroadcastJoinThreshold`, and the clustered
  * streaming-merge [[AsOfJoinExec]] otherwise — so SQL/TVF callers
  * get the right physical plan without hand-picking a spelling. */
object GraftStrategies extends SparkStrategy {
  import org.apache.spark.sql.internal.SQLConf

  private def canBroadcastBySize(plan: LogicalPlan): Boolean = {
    val size = plan.stats.sizeInBytes
    size >= 0 && size <= SQLConf.get.autoBroadcastJoinThreshold
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      val broadcast = p.buildSide match {
        case AsOfBuildSide.Broadcast => true
        case AsOfBuildSide.Merge => false
        case AsOfBuildSide.Auto => canBroadcastBySize(p.right)
      }
      if (broadcast)
        BroadcastAsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKeys, p.rightKeys, p.leftTime, p.rightTime) :: Nil
      else
        AsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKeys, p.rightKeys, p.leftTime, p.rightTime) :: Nil
    case _ => Nil
  }
}

/** Catalyst doesn't know [[AsOfJoinPlan]] preserves probe rows 1:1, so
  * by default a probe-side filter above it stays above it — and the
  * parquet scan below reads everything. This rule restores predicate
  * pushdown through the custom node: conjuncts referencing only left
  * (probe) attributes move below, where the stock rules then carry
  * them down to the scan. Build-side conjuncts must NOT move — build
  * columns are null-extended, so filtering the build side pre-join
  * would turn "no match" rows into dropped rows (same reason filters
  * don't push into the nullable side of an outer join). */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjuncts(cond)
        .partition(c => c.deterministic &&
          c.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left =
          Filter(pushable.reduce(And), aj.left))
        if (kept.isEmpty) pushed else Filter(kept.reduce(And), pushed)
      }
  }
}

/** Stock ColumnPruning can't see through an unknown binary node
  * either: a narrow Project above [[AsOfJoinPlan]] would still read
  * every child column at the scans. This rule inserts child Projects
  * for exactly the attributes the parent projection + join expressions
  * need, after which the stock rules carry the pruning down to the
  * parquet scans (`ReadSchema` shrinks — the 100-TB IO lever). Only
  * fires when it strictly narrows a child, so it converges. */
object PruneColumnsThroughAsOfJoin extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, aj: AsOfJoinPlan) =>
      val required = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(aj.leftKeys.flatMap(_.references)) ++
        AttributeSet(aj.rightKeys.flatMap(_.references)) ++
        aj.leftTime.references ++ aj.rightTime.references
      val keepL = aj.left.output.filter(required.contains)
      val keepR = aj.right.output.filter(required.contains)
      if (keepL.length == aj.left.output.length &&
          keepR.length == aj.right.output.length) p
      else p.copy(child = aj.copy(
        left = if (keepL.length == aj.left.output.length) aj.left
               else Project(keepL, aj.left),
        right = if (keepR.length == aj.right.output.length) aj.right
                else Project(keepR, aj.right)))
  }
}

/** Builder-time registration (`.withExtensions(new GraftExtensions)`)
  * — the library's SparkSessionExtensions entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => GraftStrategies)
    e.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    e.injectOptimizerRule(_ => PruneColumnsThroughAsOfJoin)
  }
}

object GraftExtensions {
  /** Runtime registration for sessions the library didn't build (the
    * driver owns the SparkSession) — the public experimental hooks
    * accept strategies/rules on a live session. Idempotent. */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    Seq(PushFilterThroughAsOfJoin, PruneColumnsThroughAsOfJoin).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
  }
}
