package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy budgeted selection — "fill the token budget with the best
  * documents": exactly the rows a sequential scan ordered by
  * (score DESC, id ASC) would admit while the running sum of `value`
  * stays within `budget` (strict prefix: the first overflowing row
  * stops the scan). The canonical curation step between quality
  * scoring and training ("take the highest-quality ~40% of tokens").
  *
  * The naive spelling is ONE global ordered window (`SUM(value) OVER
  * (ORDER BY score DESC, id)`) — a single-task sort of the whole
  * corpus, the textbook 100 TB anti-pattern. This operator gets the
  * identical row set from two bounded pieces:
  *
  *  1. **Threshold decomposition.** Scores in a curation pipeline are
  *     quantized by construction (this repo's quality scores are
  *     eighth-grid / q6-rounded), so `groupBy(score).sum(value)` is
  *     bounded by the score grid, not the corpus. The driver walks
  *     that tiny relation once, descending: strata that fit whole are
  *     taken by a plain `score > θ` filter (embarrassingly parallel);
  *     the FIRST stratum that doesn't fit is the boundary; everything
  *     below is dropped.
  *  2. **Distributed prefix-sum on the boundary stratum only.** The
  *     boundary's id-ordered running sum uses the two-phase offset
  *     pattern (the same shape as [[Packing.packChunks]]): range-
  *     partition by id, per-partition window cumsum, plus a broadcast
  *     per-partition offset computed from one tiny `groupBy` — never
  *     a one-task global sort. The partition assignment is frozen
  *     with `localCheckpoint` so the offset pass and the cumsum pass
  *     see identical partitions; the SELECTED SET is independent of
  *     where range boundaries land (offsets re-add whatever a
  *     partition split moved).
  *
  * Caller contract: `value` is non-negative (a running budget over
  * negative values has no greedy meaning) and NULL scores are never
  * selected. Rows with `value` 0 — including NULL values, which are
  * read as cost 0 — cost nothing and are admitted whenever the scan
  * reaches them, exactly as the sequential scan would (SQL `SUM`
  * skips NULLs, so every engine replaying the spelling agrees).
  *
  * The quantized-score contract is ENFORCED, not assumed: the
  * per-stratum collect is capped at [[BudgetSelect.MaxStrata]]
  * distinct scores via `limit(cap+1)` — a caller passing a
  * continuous score column gets an immediate `require` failure
  * naming the contract, never an O(corpus) driver collect.
  */
object BudgetSelect extends Logging {

  /** Hard cap on distinct score values. The threshold-decomposition
    * design is only valid when the score grid is small relative to the
    * corpus; 100k strata ≈ a few MB on the driver, far beyond any
    * sane quantization (this repo's quality scores are eighth-grid,
    * i.e. < 100 strata) yet cheap enough to collect safely. */
  val MaxStrata: Int = 100000

  /** Rows of `df` the greedy (score DESC, id ASC) scan admits within
    * `budget`. Columns and types pass through unchanged.
    *
    * @param idCol    unique tie-break id (ascending scan order)
    * @param scoreCol numeric quality score; quantized domain REQUIRED
    *                 (at most [[MaxStrata]] distinct values — enforced
    *                 with a fail-fast `require`, never a driver OOM)
    * @param valueCol non-negative LONG cost per row (e.g. tokens);
    *                 NULL reads as cost 0
    */
  def select(df: DataFrame, idCol: String, scoreCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    run(df, idCol, scoreCol, valueCol, _ => budget)
  }

  /** [[select]] with the budget expressed as an exact integer fraction
    * `num/den` of the (non-null-scored) total — "the best 40% of
    * tokens" — derived from the per-stratum relation the operator
    * aggregates anyway, so it costs NO extra pass over the corpus and
    * the integer arithmetic is replayable by any other engine. */
  def selectFraction(df: DataFrame, idCol: String, scoreCol: String,
      valueCol: String, num: Long, den: Long): DataFrame = {
    require(num >= 0L && den > 0L, s"bad budget fraction $num/$den")
    // BigInt: total * num can exceed Long for large numerators, and a
    // wrapped product that lands non-negative would silently pass the
    // budget guard — the "exact integer fraction" contract must hold
    // for any num/den
    run(df, idCol, scoreCol, valueCol,
      total => (BigInt(total) * num / den).toLong)
  }

  /** Stratified [[selectFraction]]: the greedy (score DESC, id ASC)
    * scan admits rows INDEPENDENTLY per stratum, each stratum's
    * budget an exact `num/den` fraction of ITS OWN non-null-scored
    * total — "the best 40% of tokens of each language", the
    * mixture-aware curation step (a global budget would let one
    * high-scoring stratum starve the rest). Same machinery, per
    * group: the driver walks the (stratum × score grid) relation —
    * still bounded by [[MaxStrata]], enforced — and emits per-stratum
    * thresholds + boundary remainders; whole strata above each
    * threshold are a broadcast-join filter, and ALL boundary groups
    * run ONE shared two-phase offset prefix-sum partitioned by
    * (stratum, partition) — no per-stratum job, no single-task sort,
    * no driver row data. NULL scores and NULL strata are never
    * selected. */
  def selectFractionPerStratum(df: DataFrame, stratumCol: String,
      idCol: String, scoreCol: String, valueCol: String,
      num: Long, den: Long): DataFrame = {
    require(num >= 0L && den > 0L, s"bad budget fraction $num/$den")
    val s = df.sparkSession
    import s.implicits._
    val strat = col(stratumCol)
    val id = col(idCol)
    val v = coalesce(col(valueCol), lit(0L))
    val score = col(scoreCol).cast("double")

    val cells = df.where(score.isNotNull)
      .groupBy(strat.as("__g"), score.as("__s")).agg(sum(v).as("__t"))
      .limit(MaxStrata + 1)
      .collect().map(r => (r.get(0), r.getDouble(1), r.getLong(2)))
    require(cells.length <= MaxStrata,
      s"BudgetSelect: over $MaxStrata distinct (stratum, score) cells — " +
        "the threshold-decomposition design requires a quantized score " +
        "domain (round/bucket scores before selecting)")
    // per stratum: descending-score walk → threshold + remainder
    val walks = cells.groupBy(_._1).map { case (g, rows) =>
      val total = rows.map(_._3).sum
      val budget = (BigInt(total) * num / den).toLong
      var acc = 0L
      var boundary = Option.empty[(Double, Long)]
      rows.sortBy(-_._2).foreach { case (_, q, t) =>
        if (boundary.isEmpty) {
          if (acc + t <= budget) acc += t
          else boundary = Some((q, budget - acc))
        }
      }
      (g, boundary)
    }
    // strata where everything fits: keep whole (theta = -inf sentinel;
    // scores are real values, never -inf)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val thetaRows = walks.toSeq.map { case (g, b) =>
      Row(g, b.map(_._1).getOrElse(Double.NegativeInfinity),
        b.map(_._2).getOrElse(0L))
    }
    val thetaDf = broadcast(s.createDataFrame(
      thetaRows.asJava,
      StructType(Seq(
        StructField("__g", df.select(strat).schema.head.dataType),
        StructField("__theta", DoubleType),
        StructField("__rem", LongType)))))
    val withTheta = df.where(score.isNotNull)
      .join(thetaDf, strat === col("__g"))
    val full = withTheta.where(score > col("__theta"))
      .drop("__g", "__theta", "__rem")

    // every boundary group in ONE two-phase pass, keyed by (stratum,
    // partition) — the shared [[PrefixSum.withRunningSum]] machine
    // with per-group remainders riding the broadcast threshold
    // relation
    val boundaryKept = PrefixSum.withRunningSum(
        withTheta.where(score === col("__theta")), Seq(strat), id, v, "__cum")
      .where(col("__cum") <= col("__rem"))
      .drop("__g", "__theta", "__rem", "__cum")

    full.unionByName(boundaryKept)
  }

  private def run(df: DataFrame, idCol: String, scoreCol: String,
      valueCol: String, budgetOf: Long => Long): DataFrame = {
    val s = df.sparkSession
    val id = col(idCol)
    // NULL cost reads as 0 (admitted for free, like value 0) so an
    // all-NULL stratum sums to 0 instead of NULL — same totals as SQL
    // SUM (which skips NULLs), no driver NPE.
    val v = coalesce(col(valueCol), lit(0L))
    val score = col(scoreCol).cast("double")

    // bounded by the score grid, not the corpus — and the collect is
    // HARD-bounded by MaxStrata+1 rows, so a contract-violating
    // continuous score fails the require below instead of OOMing the
    // driver.
    val strata = df.where(score.isNotNull)
      .groupBy(score.as("__s")).agg(sum(v).as("__t"))
      .limit(MaxStrata + 1)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    require(strata.length <= MaxStrata,
      s"BudgetSelect: over $MaxStrata distinct values in score column " +
        s"'$scoreCol' — the threshold-decomposition design requires a " +
        "quantized score domain (round/bucket scores before selecting)")
    val budget = budgetOf(strata.map(_._2).sum)
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    var acc = 0L
    var boundary = Option.empty[Double]
    var rem = 0L
    strata.foreach { case (q, t) =>
      if (boundary.isEmpty) {
        if (acc + t <= budget) acc += t
        else { boundary = Some(q); rem = budget - acc }
      }
    }
    if (boundary.isEmpty) return df.where(score.isNotNull)
    val theta = boundary.get
    logInfo(s"budget select: threshold $theta, boundary remainder $rem of $budget")

    val full = df.where(score.isNotNull && score > theta)

    // boundary stratum: two-phase offset prefix-sum, id order global.
    // localCheckpoint freezes the range-partition assignment so the
    // offset aggregation and the cumsum window read identical pids.
    // The checkpoint backs the returned frame, so it cannot be freed
    // here; it is bounded by ONE score stratum (not the corpus) and
    // the ContextCleaner drops its blocks once the result frame is
    // unreferenced.
    val b0 = df.where(score.isNotNull && score === theta)
      .repartitionByRange(id)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val psums = b0.groupBy(col("__pid")).agg(sum(v).as("__pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val offsets = psums.map { case (pid, t) => val o = off; off += t; (pid, o) }
    import s.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    // ROWS frame: with the default RANGE frame, id-ties would each
    // read the running sum including their peers (id is unique by
    // contract, but the frame should not depend on it)
    val w = Window.partitionBy(col("__pid")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = b0.join(offDf, "__pid")
      .withColumn("__cum", sum(v).over(w) + col("__off"))
      .where(col("__cum") <= rem)
      .drop("__pid", "__off", "__cum")

    full.unionByName(boundaryKept)
  }
}
