package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private release mechanisms — the library face of the
  * M15 `dp_counts` row, so any relation can publish a noisy group
  * count through one call or its SQL TVF (`graft_dp_counts`).
  *
  * The noise draw is DETERMINISTIC by design, not just for testing:
  * the inverse Laplace CDF is applied to a keyed md5 uniform
  * ([[Sampling.keyHash32]] — never rand()), which gives release-once
  * semantics — re-running the release republishes the SAME noisy
  * value, where a fresh draw per run would let an analyst average the
  * noise away (the classic repeated-query attack). A NEW release
  * rotates `salt`, spending fresh ε. Counting queries over a
  * partition key have sensitivity 1 and compose in parallel across
  * disjoint groups, so the whole release is ε-DP.
  */
object Privacy {

  /** ε-DP released counts per `keyCol` group of `df`:
    * `(keyCol, n_true, noise_micro, released)`. `epsilon` is the
    * privacy budget (scale 1/ε); `salt` names the release. The
    * released integer derives from the micro-quantized noise by pure
    * integer arithmetic (positive-shifted division, so truncation ==
    * floor in any engine replaying it). NOTE: `n_true` is returned
    * for pipeline-internal auditing — a public release projects it
    * away, which is the caller's responsibility. */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      salt: String = "dp:v1:"): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val u32 = Sampling.keyHash32(col(keyCol), salt)
    val u = (u32.cast("double") + lit(0.5)) / lit(4294967296.0)
    val t = u - lit(0.5)
    // inverse Laplace CDF at scale 1/ε: −(1/ε)·sgn(t)·ln(1 − 2|t|)
    val noise = lit(-1.0 / epsilon) * signum(t) *
      log(lit(1.0) - lit(2.0) * abs(t))
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_true"))
      .withColumn("noise_micro",
        floor(noise * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("released",
        col("n_true") +
          expr("(noise_micro + 500000 + 1000000000) DIV 1000000") -
          lit(1000L))
  }
}
