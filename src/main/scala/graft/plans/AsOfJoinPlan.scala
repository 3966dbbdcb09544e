package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Physical realization choice for the as-of build side.
  * [[AsOfBuildSide.Auto]] mirrors Spark's `JoinSelection`: the planner
  * broadcasts the build when its stats-estimated size fits under
  * `spark.sql.autoBroadcastJoinThreshold`, else plans the clustered
  * merge. The explicit hints force one exec, like SQL join hints. */
sealed abstract class AsOfBuildSide
object AsOfBuildSide {
  /** Stats decide (the default — SQL/TVF users get the zero-shuffle
    * broadcast plan automatically when the dimension is small). */
  case object Auto extends AsOfBuildSide
  /** Force [[BroadcastAsOfJoinExec]] (driver-sorted broadcast build). */
  case object Broadcast extends AsOfBuildSide
  /** Force the [[AsOfJoinExec]] streaming merge (one exchange per side). */
  case object Merge extends AsOfBuildSide
}

/** Logical as-of join: for every left (probe) row, attach the single
  * right (build) row with the greatest `rightTime <= leftTime` among
  * rows with equal keys — the whole-operator form of the reference's
  * floor search (`greatest_not_exceeding`,
  * /root/reference/src/algo/search.rs:51-80). A probe that precedes
  * every build row gets an all-null build payload, mirroring the
  * reference's `None`-before-first contract (search.rs:66-68).
  *
  * This is the SURVEY §2 J9 "custom LogicalPlan + Strategy + SparkPlan"
  * realization: declared logically here, planned by
  * [[GraftStrategies]] into [[AsOfJoinExec]], and optimized by
  * [[PushFilterThroughAsOfJoin]] (probe-side predicates keep reaching
  * the parquet scan below the custom node).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    buildSide: AsOfBuildSide = AsOfBuildSide.Auto)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length,
    "as-of join needs the same number of keys on both sides")
  // Key/time types must agree pairwise: the merge exec compares rows
  // with orderings built from the LEFT types, and the broadcast exec
  // compares keys by raw byte equality — a silent type mismatch would
  // mean garbage comparisons / never-matching keys, so fail loudly at
  // construction.
  // (plain equality — conservative for nested nullability diffs,
  // which the byte-wise key comparison couldn't tolerate anyway)
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of join key type mismatch: ${l.dataType.catalogString} vs " +
        s"${r.dataType.catalogString}")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time type mismatch: ${leftTime.dataType.catalogString} " +
      s"vs ${rightTime.dataType.catalogString}")

  /** Left-outer shape: every probe row survives; build columns are
    * nullable. */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}
