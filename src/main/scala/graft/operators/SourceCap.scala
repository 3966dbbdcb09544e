package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source quota capping — the anti-spam stage of corpus curation:
  * no single source (domain, crawl feed, sub-corpus) may exceed its
  * share of the training set, whatever its raw volume. Two caps, both
  * deterministic (scan order = `order` ascending, so retries and
  * repartitions cannot change the survivor set):
  *
  *  - [[capDocs]]: at most `maxDocs` rows per source — the common
  *    "keep N pages per domain" rule.
  *  - [[capTokens]]: the strict prefix of each source's scan that
  *    stays within a token budget — the budget-accurate variant
  *    (same greedy-prefix semantics as [[BudgetSelect]], but per
  *    group with a fixed budget, so no driver-side threshold walk is
  *    needed at all).
  *
  * Scale shape: capDocs plans as a rank window that Spark rewrites to
  * `WindowGroupLimit` — partial limits run map-side BEFORE the
  * shuffle, so a 100-TB spam domain ships at most `maxDocs` rows per
  * input partition rather than its whole volume (spec-pinned).
  * capTokens needs each source's global prefix sum; a plain
  * per-source window would sort every source in ONE task (the hot
  * domain IS the motivating case), so it uses the two-phase offset
  * pattern instead: range-partition by (source, order), per-partition
  * window cumsum, plus per-(source, partition) offsets computed with
  * a window over that TINY relation and joined back — fully
  * distributed, no driver collect, no SinglePartition stage. The
  * range partitioning is frozen with `localCheckpoint` so the offset
  * pass and the cumsum pass see identical partitions (the
  * [[BudgetSelect]] / [[Packing]] precedent; a production run swaps
  * the checkpoint for its usual corpus snapshot write).
  */
object SourceCap {

  /** At most `maxDocs` rows per source, the first by `order`
    * ascending. Columns pass through unchanged. */
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
    val src = col(sourceCol)
    val ord = col(orderCol)
    val v = coalesce(col(valueCol), lit(0L))
    val parted = df.repartitionByRange(src, ord)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // one row per (source, partition) — offsets stay distributed
    val offs = parted.groupBy(src.as("__s"), col("__pid"))
      .agg(sum(v).as("__pt"))
      .withColumn("__off", coalesce(
        sum(col("__pt")).over(Window.partitionBy(col("__s"))
          .orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__s"), col("__pid").as("__opid"), col("__off"))
    val w = Window.partitionBy(src, col("__pid")).orderBy(ord)
    parted
      .join(offs, src === col("__s") && col("__pid") === col("__opid"))
      .withColumn("__cum", sum(v).over(w) + col("__off"))
      .filter(col("__cum") <= budget)
      .drop("__s", "__pid", "__opid", "__off", "__cum")
  }
}
