package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed per-group running sum that backs every greedy
  * prefix operator in this library ([[SourceCap.capTokens]],
  * [[BudgetSelect.selectFractionPerStratum]]): ONE implementation so
  * a semantics fix lands everywhere at once.
  *
  * A plain `SUM(value) OVER (PARTITION BY group ORDER BY order)`
  * sorts each group in a single task — the hot group (spam domain,
  * boundary stratum) is exactly the motivating case, so that shape is
  * the 100 TB anti-pattern. This helper computes the identical column
  * with the two-phase offset pattern instead:
  *
  *  1. range-partition by (group, order) and FREEZE the partition
  *     assignment with `localCheckpoint` (the offset pass and the
  *     cumsum pass must read identical partition ids; a production
  *     run swaps the checkpoint for its usual corpus snapshot write);
  *  2. per-(group, partition) totals — one row per (group, pid), a
  *     relation bounded by groups × partitions, never the corpus —
  *     turned into exclusive per-partition offsets with a window over
  *     that tiny relation;
  *  3. per-partition `ROWS UNBOUNDED PRECEDING` cumsum plus the
  *     joined-back offset.
  *
  * Every window frame here is a ROWS frame: with the default RANGE
  * frame, rows tied on `order` would all see the full peer-group sum
  * (each tied row reads the running sum INCLUDING its peers), which
  * breaks strict-prefix "first overflowing row stops the scan"
  * semantics and diverges from the `ROWS UNBOUNDED PRECEDING` SQL
  * spelling the oracles replay.
  *
  * Caller contract: `order` must be UNIQUE within each group (doc
  * ids, chunk ids). The running sum itself is well-defined either
  * way, but which tied row precedes which is partition-order
  * nondeterminism — a greedy cutoff over non-unique order would admit
  * a retry-dependent survivor set.
  */
object PrefixSum {

  /** `df` plus `cumCol` = the running sum of `value` over the
    * `order`-ascending scan of each group (ROWS frame, current row
    * inclusive). All other columns pass through unchanged; with
    * `groups` empty the scan is global.
    */
  /** Phase-1 of every two-phase prefix operator (shared with
    * [[Skyline]]): range-partition on `cols` and FREEZE the partition
    * assignment with an eager `localCheckpoint` — the offset pass and
    * the scan pass must read IDENTICAL partition ids (a production
    * run swaps the checkpoint for its usual corpus snapshot write). */
  private[operators] def frozenRangePartition(df: DataFrame,
      pidCol: String, cols: Seq[Column]): DataFrame =
    df.repartitionByRange(cols: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint()

  def withRunningSum(df: DataFrame, groups: Seq[Column], order: Column,
      value: Column, cumCol: String): DataFrame = {
    val parted = frozenRangePartition(df, "__psPid", groups :+ order)
    val gAlias = groups.zipWithIndex.map { case (g, i) => g.as(s"__psG$i") }
    val gRef = groups.indices.map(i => col(s"__psG$i"))
    val offWin = (if (gRef.isEmpty) Window.partitionBy()
                  else Window.partitionBy(gRef: _*))
      .orderBy(col("__psOpid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per (group, partition): the offset relation stays tiny
    val offs = parted
      .groupBy((gAlias :+ col("__psPid").as("__psOpid")): _*)
      .agg(sum(value).as("__psPt"))
      .withColumn("__psOff", coalesce(sum(col("__psPt")).over(offWin), lit(0L)))
      .drop("__psPt")
    // null-safe equality: groupBy above treats NULL as a real group,
    // so the join-back must too — `===` would silently drop every
    // NULL-group row from the output
    val joinCond = (groups.zip(gRef).map { case (g, r) => g <=> r } :+
      (col("__psPid") === col("__psOpid"))).reduce(_ && _)
    val cumWin = Window.partitionBy((groups :+ col("__psPid")): _*)
      .orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(offs, joinCond)
      .withColumn(cumCol, sum(value).over(cumWin) + col("__psOff"))
      .drop((Seq("__psPid", "__psOpid", "__psOff") ++
        gRef.indices.map(i => s"__psG$i")): _*)
  }
}
