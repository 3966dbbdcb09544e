package graft.operators

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof candidate-pair generation from LSH band buckets — the
  * shared back end of the MinHash and sign-LSH near-dedup operators.
  *
  * Input: one row per (bucket, member); output: every unordered member
  * pair that shares at least one bucket, exactly once, ordered
  * `outA < outB`. Same contract as the one-pass
  * `collect_list → explode²` spelling it hardens, with one difference
  * that only shows at scale: NO single task ever owns a whole hot
  * bucket.
  *
  * Why: a hot template cluster (thousands of near-identical-but-not-
  * identical docs — routine in web crawl even after exact dedup)
  * lands one band bucket with m members, and pair generation is
  * O(m²). Grouped into one array that is one reducer's task — the one
  * plan shape that would not survive a 100-TB corpus. The fix keeps
  * the quadratic OUTPUT (the pairs exist) but distributes the work:
  *
  *  - buckets with m ≤ `bucketCap` members take the proven one-pass
  *    path (collect_list is bounded by the cap, the pair explode is
  *    O(cap²) worst-case per task);
  *  - larger buckets are split into `ceil(m/cap)` hash-chunks; each
  *    member is re-keyed into the chunk-pair CELLS it participates in
  *    (member of chunk c joins cell (c, c') for every c' ≥ c as the
  *    left role, and cell (c', c) for every c' ≤ c as the right role),
  *    and cells shuffle independently — per-task work is ≤ cap² pair
  *    checks regardless of bucket size, and the replication factor is
  *    nchunks + 1 ≈ m/cap per member, i.e. proportional to that
  *    bucket's own pair count / cap, never to corpus size.
  *
  * Every pair is produced exactly once pre-dedup: a cross cell
  * (c < c') holds chunk-c members only on the left and chunk-c'
  * members only on the right, so each cross-chunk pair meets in
  * exactly one cell with one orientation; diagonal cells (c, c) see
  * both orientations and keep `a < b`. A final distinct collapses the
  * per-band multiplicity (a pair sharing k bands appears k times),
  * exactly as the original spelling did.
  *
  * Both branches read the same windowed child, and the chunked branch
  * self-joins it — Spark's exchange reuse dedups the shuffle, so the
  * expensive upstream (shingle hashing, signatures) still runs once.
  */
object CandidatePairs {

  /** All unordered same-bucket member pairs of `bucketed`.
    *
    * @param bucketed  one row per bucket membership
    * @param bucketCols columns identifying a bucket (e.g. band_no, band_hash)
    * @param idCol     member id column (orderable; pairs come out a < b)
    * @param outA      output name of the smaller pair member
    * @param outB      output name of the larger pair member
    * @param bucketCap largest bucket handled as a single array/task;
    *                  also the hash-chunk width above it (≈ cap² pair
    *                  checks per task ceiling)
    */
  def fromBuckets(bucketed: DataFrame, bucketCols: Seq[String], idCol: String,
      outA: String, outB: String, bucketCap: Int = 1024): DataFrame = {
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    val bCols: Seq[Column] = bucketCols.map(col)
    val id = col(idCol)

    // One windowed pass tags every membership row with its bucket size
    // (sort-based window spills, never materializes a hot bucket in
    // memory); singleton buckets produce no pairs and drop here.
    val sized = bucketed
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(bCols: _*)))
      .filter(col("__m") > 1)

    // Common path: bounded buckets, one-pass grouped pair generation.
    // Bucket members are sorted so pair emission is deterministic.
    val small = sized.filter(col("__m") <= bucketCap)
      .groupBy(bCols: _*)
      .agg(sort_array(collect_list(id)).as("__ids"))
      .select(explode(col("__ids")).as(outA), col("__ids"))
      .select(col(outA), explode(col("__ids")).as(outB))
      .filter(col(outA) < col(outB))
      .select(outA, outB)

    // Hot path: hash-chunked cells. Chunk membership is the member's
    // own deterministic fingerprint mod nchunks — no per-bucket rank
    // (and so no second sort) needed.
    val chunked = sized.filter(col("__m") > bucketCap)
      .withColumn("__nc", ceil(col("__m") / lit(bucketCap.toLong)).cast("int"))
      .withColumn("__c", pmod(F.fnv1a(id), col("__nc")).cast("int"))
    val lefts = chunked.select(
      bCols ++ Seq(id.as("__ida"), col("__c").as("__cl"),
        explode(sequence(col("__c"), col("__nc") - 1)).as("__cr")): _*)
    val rights = chunked.select(
      bCols ++ Seq(id.as("__idb"), col("__c").as("__cr"),
        explode(sequence(lit(0), col("__c"))).as("__cl")): _*)
    val large = lefts
      .join(rights, bucketCols ++ Seq("__cl", "__cr"))
      // diagonal cells see both orientations (and self-rows): keep one;
      // cross cells hold each pair once, in arbitrary id order.
      .filter(col("__cl") =!= col("__cr") || col("__ida") < col("__idb"))
      .select(least(col("__ida"), col("__idb")).as(outA),
        greatest(col("__ida"), col("__idb")).as(outB))

    small.unionAll(large).distinct()
  }
}
