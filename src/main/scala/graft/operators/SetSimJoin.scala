package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryUtil.q6

/** EXACT set-similarity self-join via prefix filtering — the
  * deterministic complement to MinHash/LSH near-dedup (L2): every pair
  * with Jaccard ≥ τ is returned, with its exact similarity, and no
  * false positives survive. MinHash banding is probabilistic (a pair
  * above τ can miss every band); when the contract is "find ALL
  * near-duplicates" — legal-hold dedup, eval decontamination where a
  * miss is a leaked benchmark — the exact join is the operator.
  *
  * The algorithm is the SSJoin/PPJoin prefix-filter family
  * (Chaudhuri–Ganti–Kaushik ICDE'06, Xiao et al. WWW'08): order every
  * set's elements by GLOBAL rarity (frequency asc, element asc — one
  * shared total order), and index each set only by its first
  * p = n − ⌈τ·n⌉ + 1 elements. Any two sets with Jaccard ≥ τ overlap
  * in at least ⌈τ·max(na,nb)⌉ ≥ ⌈τ·n⌉ elements, so skipping the last
  * ⌈τ·n⌉ − 1 of each still leaves a shared indexed element — the
  * candidate set provably contains every qualifying pair; an exact
  * intersect verifies each candidate. τ is a rational p/q and the
  * accept test is integer arithmetic ((q+p)·|∩| ≥ p·(na+nb)), so the
  * cut is engine-exact.
  *
  * Scale shape (100 TB contract):
  *  - the global frequency relation is vocabulary-sized and joins the
  *    element rows on the element key — an equi-join, map-side
  *    combinable count underneath;
  *  - prefix selection is a per-set window (partition = the set id;
  *    partitions are set-sized, never corpus-sized);
  *  - candidate buckets are keyed by PREFIX elements — by construction
  *    the RAREST elements of each set, so buckets are small where the
  *    corpus is large; a pathological shared-rare-element cluster is
  *    still bounded because pairs route through
  *    [[CandidatePairs.fromBuckets]] (per-task work ≤ cap² whatever
  *    the bucket size);
  *  - verification joins candidates back to the set arrays by id —
  *    two equi-joins — and compares integer sizes.
  */
object SetSimJoin {

  /** All unordered pairs of `sets` rows with exact Jaccard ≥ num/den.
    *
    * @param sets   one row per set: (`idCol` BIGINT, `setCol` array,
    *               elements already distinct)
    * @param idCol  set identifier column (BIGINT)
    * @param setCol array column of distinct elements
    * @param num    τ numerator (0 < num ≤ den)
    * @param den    τ denominator
    * @param bucketCap largest candidate bucket handled as one task
    * @return (a, b, n_a, n_b, n_inter, jaccard) with a < b, jaccard
    *         q6-quantized; sorted output is the caller's concern
    */
  def selfJoin(sets: DataFrame, idCol: String, setCol: String,
      num: Int, den: Int, bucketCap: Int = 1024): DataFrame = {
    require(num > 0 && num <= den, s"tau must be in (0,1]: $num/$den")
    val id = col(idCol)

    // Materialize the (id, set) relation ONCE: four plan arms read it
    // (element frequencies, prefix selection, and both verify sides),
    // and without the checkpoint each arm re-runs the caller's set
    // construction — for the shingle-hash callers that is the whole
    // tokenize+shingle+hash pass, measured ~4x the one-pass cost at
    // sf0.1 (the Graph.pairCounts / eval_overlap_rate pattern).
    val sets0 = sets.select(id, col(setCol)).localCheckpoint()

    val elems = sets0.select(id, size(col(setCol)).cast("long").as("__n"),
      explode(col(setCol)).as("__e"))
    val freq = elems.groupBy(col("__e")).agg(count(lit(1)).as("__cnt"))

    // prefix length p = n − ⌈τn⌉ + 1, all-integer: ⌈n·num/den⌉ =
    // (n·num + den − 1) div den
    val ceilTauN: Column =
      (col("__n") * lit(num.toLong) + lit(den.toLong - 1L)) / lit(den.toLong)
    val w = Window.partitionBy(id).orderBy(col("__cnt"), col("__e"))
    val prefix = elems.join(freq, "__e")
      .withColumn("__rn", row_number().over(w).cast("long"))
      .filter(col("__rn") <= col("__n") - ceilTauN.cast("long") + lit(1L))
      .select(id, col("__e"))

    val pairs = CandidatePairs.fromBuckets(
      prefix, Seq("__e"), idCol, "a", "b", bucketCap)

    val left = sets0.select(id.as("a"), col(setCol).as("__sa"))
    val right = sets0.select(id.as("b"), col(setCol).as("__sb"))
    pairs
      .join(left, "a").join(right, "b")
      .select(col("a"), col("b"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long")
          .as("n_inter"))
      .filter(col("n_inter") * lit(den.toLong + num.toLong) >=
        (col("n_a") + col("n_b")) * lit(num.toLong))
      .withColumn("jaccard", q6(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double")))
  }
}
