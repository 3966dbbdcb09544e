package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style table content fingerprints — the replication /
  * migration integrity tool: two replicas of a table agree iff their
  * per-bucket fingerprints agree, and a divergence names the bucket(s)
  * to re-sync without comparing rows (SURVEY.md §2 M14).
  *
  * Per bucket (a deterministic key residue): row count, key range, and
  * the XOR of per-row content hashes. XOR is the right fold: it is
  * order-free and partition-free (any execution order yields the same
  * fingerprint), and flipping ANY single row flips its bucket's
  * fingerprint with probability 1 − 2⁻⁶⁰. The per-row hash is the
  * first 15 hex chars of md5 over a '|'-joined canonical string of the
  * fingerprinted columns — md5 and the hex fold are engine-portable,
  * so an independent engine (the DuckDB oracle, a different replica
  * stack) reproduces the fingerprints bit-for-bit. Doubles are
  * excluded from canonicalization by contract: double→string rendering
  * is NOT engine-portable; a caller fingerprints them via an explicit
  * integer quantization column instead.
  *
  * Canonicalization must be INJECTIVE on the row's value tuple, or
  * genuinely divergent replicas fingerprint equal — the exact miss the
  * audit exists to prevent. Two traps a bare `concat_ws` has: NULLs
  * are skipped (('a', NULL, 'b') ≡ ('a', 'b', NULL) ≡ ('a', 'b')),
  * and a value containing the separator forges a field boundary
  * (('a|b') ≡ ('a', 'b')). Each value therefore canonicalizes as
  * `N` when NULL and `<charlen>:<value>` otherwise: the explicit
  * sentinel distinguishes NULL from absence AND from the literal
  * string "N" (which renders as `1:N`), and the length prefix pins
  * exactly how many characters belong to the value, so an embedded
  * '|' (or an embedded `<digits>:`) cannot shift the parse — the
  * joined string decodes back to the unique tuple left-to-right. */
object Fingerprints {

  /** `N` for NULL; `<charlen>:<value>` otherwise — see class doc. */
  private def canonTerm(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull, lit("N"))
      .otherwise(concat(length(s).cast("string"), lit(":"), s))
  }

  /** Per-bucket (bucket, n_rows, xor_fp, min_key, max_key) of `df`:
    * bucket = pmod(key, nBuckets); xor_fp folds md5-derived 60-bit
    * row hashes of `cols` (already-canonical string/integer columns). */
  def bucketFingerprints(df: DataFrame, keyCol: String,
      cols: Seq[Column], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1)
    val canon = concat_ws("|", cols.map(canonTerm): _*)
    df
      .withColumn("__h",
        conv(substring(md5(canon), 1, 15), 16, 10).cast("long"))
      .groupBy(pmod(col(keyCol), lit(nBuckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_fp"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
  }
}
