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

  /** Whole-copy count of a sampling rate: a rate of 2.3 repeats every
    * row twice unconditionally. Public so an oracle interpolates the
    * SAME integer. */
  def baseCopies(rate: Double): Long = math.floor(rate).toLong

  /** 32-bit hash threshold for the fractional remainder of a rate: a
    * rate of 2.3 gives each row a hash-deterministic 0.3 chance of one
    * extra copy. Integer, computed ONCE here, so engine and oracle can
    * never disagree on a float rounding. */
  def fracThreshold32(rate: Double): Long =
    math.floor((rate - math.floor(rate)) * Bits32).toLong

  /** Deterministic per-stratum mixture resampling — the data-mixing
    * knob of a training pipeline ("2× the Spanish corpus, half the
    * English crawl"). Rates may exceed 1: a rate r repeats each row
    * `floor(r)` times plus one hash-deterministic extra copy with
    * probability `r - floor(r)` (so upsampling REPEATS documents, it
    * never invents them, and the expected output size is exactly
    * `Σ count_s · r_s`). Strata missing from `rates` (and NULL strata)
    * use `defaultRate`; a rate of 0 drops the stratum.
    *
    * Scale shape: a narrow per-row projection + Generate — no shuffle,
    * no stratum-size collection, nothing driver-side. Retry-stable and
    * partitioning-invariant because the extra-copy decision hashes the
    * row KEY ([[keyHash32]]), never `rand()`. Per-stratum arithmetic
    * is pre-folded into integer literals ([[baseCopies]] /
    * [[fracThreshold32]]) so any other engine replays the identical
    * selection.
    *
    * @return input rows with an added BIGINT `copyNoCol` in
    *         [0, copies); rows whose stratum resolves to 0 copies
    *         disappear
    */
  def resampleMixture(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix:v1:", copyNoCol: String = "copy_no"): DataFrame = {
    require(rates.values.forall(_ >= 0) && defaultRate >= 0,
      "sampling rates must be >= 0")
    // deterministic CASE order; both CASEs fold to integer literals
    val sorted = rates.toSeq.sortBy(_._1)
    def caseOf(f: Double => Long): Column =
      sorted.foldLeft(when(lit(false), lit(0L))) { case (acc, (k, r)) =>
        acc.when(stratum === lit(k), lit(f(r)))
      }.otherwise(lit(f(defaultRate)))
    val copies = caseOf(baseCopies) +
      when(keyHash32(key, salt) < caseOf(fracThreshold32), 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(copyNoCol, explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** Temperature-flattened mixture rates from stratum counts — the
    * standard multilingual-training reweighting: sample stratum s with
    * probability ∝ p_s^alpha (p_s its corpus share), scaled so the
    * EXPECTED resampled corpus size equals the input size. alpha = 1
    * reproduces the corpus (all rates 1); alpha = 0 is a uniform
    * mixture (rare strata upsampled, dominant ones cut); 0 < alpha < 1
    * interpolates. Driver-side k-entry map arithmetic — the corpus
    * itself never moves; feed the result to [[resampleMixture]]. */
  def temperatureRates(counts: Map[String, Long],
      alpha: Double): Map[String, Double] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "every stratum needs a positive count")
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val total = counts.values.map(_.toDouble).sum
    val pows = counts.map { case (k, c) => k -> math.pow(c / total, alpha) }
    val z = pows.values.sum
    pows.map { case (k, w) => k -> (w / z) * total / counts(k) }
  }
}
