package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splits — the
  * reproducible way to sample at 100 TB.
  *
  * `rand()`-based sampling is non-deterministic across retries,
  * re-runs, and partitioning changes (a re-executed task draws new
  * numbers — rows flicker in and out of the sample). Keyed hash
  * sampling instead derives a uniform value from a STABLE row key:
  * the same row lands on the same side of every threshold in every
  * run, on any cluster layout, with no RNG state and no shuffle — it
  * is a narrow per-row filter/projection, and the same rule written in
  * any other engine selects the identical rows (which is what lets
  * the DuckDB oracle check it exactly).
  *
  * The uniform value is the first 8 hex chars of `md5(salt ∥ key)`
  * read as a 32-bit integer — md5 is available in every engine
  * (unlike the reference fnv1a identity) and its avalanche makes the
  * top 32 bits uniform regardless of key distribution. The salt
  * decorrelates independent samples/splits drawn from the same keys.
  *
  * Null-key policy: a NULL key hashes as the sentinel string `"\\u0000"`
  * (a NUL byte — no numeric/date cast produces it, and text keys
  * containing NUL are already pathological), so null-keyed rows are
  * KEPT and all
  * land together — on one deterministic side of every threshold, in
  * one split — exactly like any other single key value. Without the
  * sentinel, `md5(concat(salt, NULL))` is NULL and `NULL < t` drops
  * the row from every sample (even `fraction = 1.0`) while
  * `splitLabel`'s `otherwise` branch funnels it to "test" — two
  * silently different policies. Keys with nulls still deserve a
  * second look (all their rows move as one block); prefer a non-null
  * key when per-row independence matters.
  */
object Sampling {

  private val Bits32 = 4294967296L // 2^32

  /** Uniform value in [0, 2^32) derived from `salt ∥ key`; NULL keys
    * hash via the `"\\u0000"` sentinel (see the null-key policy above). */
  def keyHash32(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt),
      coalesce(key.cast("string"), lit("\u0000")))), 1, 8), 16, 10)
      .cast("long")

  /** Keep rows whose keyed hash falls under `fraction` — a
    * deterministic Bernoulli sample that is retry-stable and
    * partitioning-invariant. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = "sample:"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    df.filter(keyHash32(key, salt) < math.floor(fraction * Bits32).toLong)
  }

  /** Deterministic train/valid/test label for a row key: thresholds at
    * `trainFrac` and `trainFrac + validFrac` of the 2^32 hash space.
    * Exact integer thresholds, so an oracle can replicate the split
    * byte-for-byte. */
  def splitLabel(key: Column, trainFrac: Double, validFrac: Double,
      salt: String = "split:v1:"): Column = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1.0)
    val h = keyHash32(key, salt)
    val t1 = math.floor(trainFrac * Bits32).toLong
    val t2 = math.floor((trainFrac + validFrac) * Bits32).toLong
    when(h < t1, "train").when(h < t2, "valid").otherwise("test")
  }
}
