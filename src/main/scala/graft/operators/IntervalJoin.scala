package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join via bin replication — the scale-safe spelling
  * of `l.start <= r.end AND r.start <= l.end`. Written naively that
  * predicate has no equi-key, so Spark can only plan a nested-loop /
  * cartesian join: O(|L|·|R|) comparisons on one task, the classic
  * scale killer. The standard fix (used by every distributed temporal
  * engine) is to discretize the time axis: each interval replicates to
  * the `span/width + 1` bins it covers, candidates meet on the bin key
  * (a plain shuffled equi-join — AQE-skew-splittable, unlike an NLJ),
  * and the exact predicate filters residually. An [X] extension op —
  * the reference's ordered-retrieval envelope (floor/successor,
  * `search.rs`) is the point-lookup cousin of this range primitive.
  *
  * Dedup without a distinct: a pair sharing k bins would emit k times,
  * and a `distinct` downstream would be a second full shuffle of the
  * candidate set. Instead a pair is emitted ONLY in the first bin both
  * intervals cover (`bin == max(l.start, r.start) div width`) — an
  * O(1) residual predicate that makes the join output exact with zero
  * extra shuffles.
  *
  * Scale contract (100 TB): candidate volume is Σ_bin |L_bin|·|R_bin|
  * — `width` is the knob that trades replication factor (span/width
  * rows per interval) against bin fan-in; pick width ≈ the typical
  * interval span so replication stays O(1) while bins stay selective.
  * A pathologically hot bin (everything overlaps one epoch) is a
  * plain equi-join hot key: AQE skew-join splits it, and the residual
  * first-bin predicate keeps the output exact under any split.
  */
object IntervalJoin {

  /** Join rows of `left` and `right` whose CLOSED integer intervals
    * [lStart,lEnd] and [rStart,rEnd] overlap. Output columns are
    * left.* ++ right.* (names must be disjoint). Interval bounds must
    * be non-negative integers (epoch days/seconds/micros — enforced
    * where cheap: negative bins would break the `div` truncation
    * identity); rows with end < start are dropped (empty intervals).
    *
    * @param width bin width in the same unit as the bounds
    * @param maxBinsPerRow loud per-row replication cap: a row spanning
    *              more than this many bins FAILS THE TASK (runtime
    *              `assert_true`, not a silent filter) instead of
    *              exploding an unbounded array — one malformed or
    *              extreme-span row (e.g. end = Long.MaxValue from a
    *              sentinel) would otherwise OOM a task or trip
    *              sequence()'s element limit and sink the whole job.
    *              A row legitimately hitting the default 4096 means
    *              `width` is mis-chosen for the data — widen it.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      width: Long, maxBinsPerRow: Long = 4096L): DataFrame = {
    require(width >= 1L, s"bin width must be >= 1, got $width")
    require(maxBinsPerRow >= 1L,
      s"maxBinsPerRow must be >= 1, got $maxBinsPerRow")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names must be disjoint, both have: " +
        clash.mkString(", "))

    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) >= 0 && col(e) >= col(s))
        // assert_true returns NULL when the bound holds (coalesce →
        // keep the row) and fails the task with the offending bounds
        // in the message when it doesn't — survives column pruning
        // because it rides a filter, not a projected-away column
        .where(coalesce(assert_true(
          expr(s"$e DIV ${width}L - $s DIV ${width}L") < lit(maxBinsPerRow),
          concat(lit(s"interval spans more than $maxBinsPerRow bins " +
            s"(width=$width): $s="), col(s), lit(s", $e="), col(e))),
          lit(true)))
        .withColumn("__bin",
          explode(expr(s"sequence($s DIV ${width}L, $e DIV ${width}L)")))

    val lb = binned(left, lStart, lEnd)
    val rb = binned(right, rStart, rEnd)
    lb.join(rb,
        lb("__bin") === rb("__bin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          // first-shared-bin emission: exactly-once without a distinct
          lb("__bin") === expr(s"greatest($lStart, $rStart) DIV ${width}L"))
      .drop("__bin")
  }

  /** The overlap predicate as oracle SQL (closed intervals, the same
    * empty/negative-interval hygiene as [[overlapJoin]]). */
  def overlapSql(lStart: String, lEnd: String,
      rStart: String, rEnd: String): String =
    s"($lStart <= $rEnd AND $rStart <= $lEnd AND $lStart >= 0 " +
      s"AND $rStart >= 0 AND $lEnd >= $lStart AND $rEnd >= $rStart)"

  /** Convenience: overlap pairs aggregated per left row — for each
    * left interval, the number of right intervals it overlaps. */
  def overlapCounts(left: DataFrame, leftKey: Seq[String],
      lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      width: Long, countCol: String = "n_overlaps"): DataFrame =
    overlapJoin(left, lStart, lEnd, right, rStart, rEnd, width)
      .groupBy(leftKey.map(col): _*)
      .agg(count(lit(1)).as(countCol))
}
