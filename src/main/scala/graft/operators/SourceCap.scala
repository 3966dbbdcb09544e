package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source quota capping — the anti-spam stage of corpus curation:
  * no single source (domain, crawl feed, sub-corpus) may exceed its
  * share of the training set, whatever its raw volume. Two caps:
  *
  *  - [[capDocs]]: at most `maxDocs` rows per source — the common
  *    "keep N pages per domain" rule.
  *  - [[capTokens]]: the strict prefix of each source's scan that
  *    stays within a token budget — the budget-accurate variant
  *    (same greedy-prefix semantics as [[BudgetSelect]], but per
  *    group with a fixed budget, so no driver-side threshold walk is
  *    needed at all).
  *
  * Caller contract (both): `order` must be UNIQUE within each source
  * (doc ids). Only then is the scan order total and the survivor set
  * retry/repartition-invariant — with ties, which tied row "comes
  * first" is partition-order nondeterminism (same contract as
  * [[BudgetSelect]]'s `idCol`, documented there).
  *
  * Scale shape: capDocs plans as a rank window that Spark rewrites to
  * `WindowGroupLimit` — partial limits run map-side BEFORE the
  * shuffle, so a 100-TB spam domain ships at most `maxDocs` rows per
  * input partition rather than its whole volume (spec-pinned).
  * capTokens needs each source's global prefix sum; a plain
  * per-source window would sort every source in ONE task (the hot
  * domain IS the motivating case), so it rides the shared two-phase
  * offset machine, [[PrefixSum.withRunningSum]] — fully distributed,
  * no driver collect, no SinglePartition stage, ROWS-frame exact.
  */
object SourceCap {

  /** At most `maxDocs` rows per source, the first by `order`
    * ascending (`order` unique per source — see the contract above).
    * Columns pass through unchanged. */
  def capDocs(df: DataFrame, sourceCol: String, orderCol: String,
      maxDocs: Int): DataFrame = {
    require(maxDocs >= 0, s"maxDocs must be >= 0, got $maxDocs")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxDocs)
      .drop("__rn")
  }

  /** The strict prefix of each source's `order`-ascending scan whose
    * running sum of `value` stays within `budget` (first overflowing
    * row stops that source's scan; NULL values read as cost 0).
    * Columns pass through unchanged. */
  def capTokens(df: DataFrame, sourceCol: String, orderCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    PrefixSum.withRunningSum(df, Seq(col(sourceCol)), col(orderCol),
        coalesce(col(valueCol), lit(0L)), "__cum")
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }
}
