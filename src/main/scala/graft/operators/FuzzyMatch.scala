package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 entity matching via deletion-variant blocking (the
  * SymSpell construction) — fuzzy key dedup without the all-pairs
  * cartesian: typo'd names, OCR'd ids, near-identical titles.
  *
  * Recall is EXACT by construction, not probabilistic: two strings at
  * Levenshtein distance ≤ 1 (one substitution, insertion, or
  * deletion) always share a member of each other's deletion
  * neighborhood {s} ∪ {s minus char i}. So candidates = an equi-join
  * on exploded variants — a plain shuffle join on a string key —
  * and the exact `levenshtein ≤ 1` verify only ever REMOVES false
  * candidates. The result equals the brute-force all-pairs scan (the
  * oracle runs exactly that), at |s|+1 rows per input row instead of
  * n² pairs.
  *
  * Scale shape: variant buckets are bounded by how many strings share
  * a deletion image (alphabet-sized in practice, never corpus-sized);
  * pair generation routes through [[CandidatePairs]] so even a
  * degenerate bucket (mass-produced near-identical keys, short
  * strings collapsing onto one image) is hash-chunked instead of
  * handed to one task; the per-pair verify is one levenshtein on
  * short strings.
  *
  * Distance 2 ([[pairsWithin]] k=2) explodes the TWO-deletion
  * neighborhood: ~L²/2 variants per L-char string (≈ 170 for an
  * 18-char key) — the standard SymSpell space/recall trade. Deeper
  * fuzz belongs to the MinHash family.
  */
object FuzzyMatch {

  /** The deletion neighborhood of `s`: s itself plus every
    * one-character deletion, as an array column (distinct — repeated
    * characters give duplicate variants, which would double-count
    * candidate pairs). */
  def deletionVariants(s: Column): Column =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), length(s) - i)))))

  /** The ≤2-deletion neighborhood: [[deletionVariants]] of every
    * 1-deletion variant, flattened — contains every string reachable
    * by deleting 0, 1, or 2 characters. */
  def deletionVariants2(s: Column): Column =
    array_distinct(flatten(
      transform(deletionVariants(s), v => deletionVariants(v))))

  /** [[deletionVariants2]] WITHOUT the distinct — every ≤2-deletion
    * string built directly by index enumeration (delete positions
    * i < j), 1 + L + C(L,2) strings per key instead of the nested
    * (L+1)² construction plus two array_distinct passes. Repeated
    * characters yield duplicate variants, so this is the same SET
    * with multiplicity — [[pairsWithin]]'s candidate generation is
    * multiplicity-insensitive (CandidatePairs counts rows for the
    * small/hot branch consistently and distincts the emitted pairs),
    * which is why the blocking path can afford to skip the per-row
    * dedup the public neighborhood API performs. Measured ~1.5x
    * cheaper per key at L=20 (the d≤2 explode is the dominant stage
    * of fuzzy_match2). */
  private[graft] def deletionVariants2Raw(s: Column): Column = {
    val L = length(s)
    concat(
      array(s),
      // one deletion at i
      when(L >= 1, transform(sequence(lit(1), L), i =>
        concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), L - i))))
        .otherwise(array()),
      // two deletions at i < j
      when(L >= 2, flatten(transform(sequence(lit(1), L - 1), i =>
        transform(sequence(i + lit(1), L), j =>
          concat(s.substr(lit(1), i - lit(1)),
            s.substr(i + lit(1), j - i - lit(1)),
            s.substr(j + lit(1), L - j))))))
        .otherwise(array()))
  }

  /** All pairs of `df` rows whose `nameCol` strings are within
    * Levenshtein distance `k` (k = 1 or 2, not the same row), as
    * `(key_a, key_b, name_a, name_b, dist)` with `key_a < key_b`.
    * `keyCol` must be a unique BIGINT row id.
    *
    * SymSpell recall: lev(a, b) ≤ k ⇒ the k-deletion neighborhoods
    * intersect, so the variant equi-join (skew-proofed through
    * CandidatePairs) has perfect recall and the levenshtein verify
    * only removes false candidates — the result equals the brute
    * all-pairs scan the oracle runs. */
  def pairsWithin(df: DataFrame, keyCol: String, nameCol: String,
      k: Int): DataFrame = {
    require(k == 1 || k == 2, s"pairsWithin supports k in {1, 2}, got $k")
    val neighborhood =
      if (k == 1) deletionVariants(col(nameCol))
      else deletionVariants2Raw(col(nameCol))
    // bucket on the variant's 64-bit fingerprint, not the string: the
    // candidate shuffle moves 8-byte keys instead of (L·variants)
    // bytes of text; a hash collision only ADDS a false candidate,
    // which the exact levenshtein verify removes
    val vars = df.select(col(keyCol).as("__k"),
      explode(neighborhood).as("__v"))
      .select(col("__k"), graft.functions.GraftFunctions.fnv1a(col("__v"))
        .as("__vh"))
    val pairs = CandidatePairs.fromBuckets(
      vars, Seq("__vh"), "__k", "key_a", "key_b")
    val names = df.select(col(keyCol), col(nameCol))
    pairs
      .join(names.select(col(keyCol).as("key_a"),
        col(nameCol).as("name_a")), Seq("key_a"))
      .join(names.select(col(keyCol).as("key_b"),
        col(nameCol).as("name_b")), Seq("key_b"))
      // thresholded levenshtein: the DP row-min early-exit returns -1
      // past k instead of finishing the full O(|a|·|b|) table — the
      // per-candidate verify cost is O(k·|a|) at scale
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), k))
      .filter(col("dist") >= 0)
      .select("key_a", "key_b", "name_a", "name_b", "dist")
  }

  /** [[pairsWithin]] at distance 1 (the key-dedup default). */
  def pairsWithin1(df: DataFrame, keyCol: String,
      nameCol: String): DataFrame = pairsWithin(df, keyCol, nameCol, 1)
}
