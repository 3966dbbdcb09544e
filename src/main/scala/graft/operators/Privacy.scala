package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private release mechanisms — the library face of the
  * M15 `dp_counts` row and its family (histogram / known-domain /
  * clipped sum / clipped mean), so any relation can publish a noisy
  * aggregate through one call or the SQL TVF (`graft_dp_counts`).
  *
  * The noise draw is DETERMINISTIC: the inverse Laplace CDF is applied
  * to a keyed md5 uniform ([[Sampling.keyHash32]] — never rand()),
  * which gives release-once semantics — re-running the release
  * republishes the SAME noisy value, where a fresh draw per run would
  * let an analyst average the noise away (the classic repeated-query
  * attack). The privacy caveats that come with a PRF draw:
  *
  *  - `seed` MUST be a secret, high-entropy, per-release value,
  *    generated and persisted at release time by the caller. There is
  *    deliberately NO default: with a public seed anyone can recompute
  *    the noise per key and subtract it from `released`, recovering
  *    the true aggregate exactly — zero privacy.
  *  - even with a secret seed the guarantee is COMPUTATIONAL DP (the
  *    adversary cannot distinguish the md5-PRF draw from true Laplace
  *    noise), not information-theoretic ε-DP; and it holds only while
  *    the seed stays secret. Publishing, reusing, or deriving the seed
  *    from public data forfeits it.
  *  - a NEW release must rotate the seed, spending fresh ε — the same
  *    seed across dataset versions repeats the noise and exposes exact
  *    deltas between releases.
  *
  * Sensitivity accounting: counting queries over a partition key have
  * sensitivity 1 and compose in parallel across disjoint groups; sums
  * are clipped per contribution so one row moves the sum by at most
  * the clip bound; means split the budget across their count and sum
  * halves (documented on [[dpMean]]).
  */
object Privacy {

  /** Micro-quantized Laplace(scale) noise for a key column: the
    * inverse CDF −scale·sgn(t)·ln(1 − 2|t|) at the keyed md5 uniform,
    * floored to integer micro-units so every engine replaying the
    * release computes the identical long. */
  private def noiseMicro(key: Column, scale: Double,
      seed: String): Column = {
    val u32 = Sampling.keyHash32(key, seed)
    val u = (u32.cast("double") + lit(0.5)) / lit(4294967296.0)
    val t = u - lit(0.5)
    val noise = lit(-scale) * signum(t) *
      log(lit(1.0) - lit(2.0) * abs(t))
    floor(noise * lit(1000000.0) + lit(0.5)).cast("long")
  }

  /** Integer release from micro-noise: explicit floor of the
    * half-up-shifted micro units. floor (not DIV) — Spark's DIV
    * truncates toward zero while DuckDB's `//` floors, so the two
    * diverge the moment the shifted sum goes negative (small ε makes
    * the noise arbitrarily large); an explicit floor agrees at every
    * magnitude and sign. */
  private def releaseRound(noiseMicro: Column): Column =
    floor((noiseMicro.cast("double") + lit(500000.0)) /
      lit(1000000.0)).cast("long")

  /** ε-DP released counts per `keyCol` group of `df`:
    * `(keyCol, n_true, noise_micro, released)`. `epsilon` is the
    * privacy budget (Laplace scale 1/ε, sensitivity 1); `seed` names
    * the release and MUST be secret and high-entropy (see the object
    * doc — a public seed yields zero privacy). NOTE: `n_true` is
    * returned for pipeline-internal auditing — a public release
    * projects it away, which is the caller's responsibility. */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_true"))
      .withColumn("noise_micro",
        noiseMicro(col(keyCol), 1.0 / epsilon, seed))
      .withColumn("released", col("n_true") +
        releaseRound(col("noise_micro")))
  }

  /** Known-domain variant: release a count for EVERY key in `domain`
    * (a one-column public relation), so groups absent from `df`
    * release pure noise instead of being silently missing — presence
    * or absence of a key in the output no longer leaks whether anyone
    * in that group exists. The domain must be public (derived without
    * looking at `df`); keys of `df` outside the domain are dropped —
    * releasing them would reintroduce the presence leak. */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      seed: String, domain: DataFrame): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    require(domain.columns.length == 1,
      s"domain must be a one-column relation of $keyCol values, " +
        s"got columns ${domain.columns.mkString(", ")}")
    val dom = domain.select(col(domain.columns.head).as(keyCol))
      .distinct()
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_present"))
    dom.join(counts, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("n_present"), lit(0L)).as("n_true"))
      .withColumn("noise_micro",
        noiseMicro(col(keyCol), 1.0 / epsilon, seed))
      .withColumn("released", col("n_true") +
        releaseRound(col("noise_micro")))
  }

  /** ε-DP released two-way CONTINGENCY TABLE over a public cell
    * domain — the co-occurrence release a training-data audit asks
    * for ("documents per (source, length-bucket)") with the M17
    * presence-leak rule applied to cells: every cell of the public
    * `domain` (a TWO-column relation of (keyA, keyB) values, derived
    * without looking at `df` — for literal domains build the cross
    * product driver-side, never as an in-plan cartesian) releases
    * `count + Laplace(1/ε)`; a row lands in exactly ONE cell (both
    * keys are functions of the row), so the sensitivity is 1 and one
    * ε covers the whole table. Cells of `df` outside the domain are
    * dropped (releasing them would reintroduce the presence leak).
    * The per-cell draw keys on `keyA || '|' || keyB` — key values
    * must not contain the `'|'` delimiter (a collision would give two
    * cells the SAME noise, a correlation the mechanism does not
    * promise). The contract is ENFORCED in-plan, not just documented:
    * a released cell whose key value contains `'|'` raises a loud
    * error (riding the noise-key expression itself, so no pruning
    * removes the guard) instead of silently correlating two cells'
    * draws. Output `(keyA, keyB, n_true, noise_micro, released)`;
    * `n_true` is audit-only, as everywhere in the family. */
  def dpCrosstab(df: DataFrame, keyA: String, keyB: String,
      epsilon: Double, seed: String, domain: DataFrame): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    require(domain.columns.length == 2,
      s"domain must be a two-column relation of ($keyA, $keyB) " +
        s"values, got columns ${domain.columns.mkString(", ")}")
    val dom = domain.select(
      col(domain.columns(0)).as(keyA),
      col(domain.columns(1)).as(keyB)).distinct()
    val counts = df.groupBy(col(keyA), col(keyB))
      .agg(count(lit(1)).as("n_present"))
    // the no-'|'-in-keys contract, enforced where it matters: the
    // guard rides the noise-key expression (an input of the output
    // columns noise_micro/released, so column pruning keeps it); a
    // violating key is a privacy-correctness failure and must be
    // LOUD, never two cells silently drawing identical noise
    def noPipe(c: org.apache.spark.sql.Column) = when(
      c.cast("string").contains("|"),
      raise_error(concat(lit("dpCrosstab: key value '"),
        c.cast("string"),
        lit("' contains the '|' cell delimiter — two distinct " +
          "cells could draw IDENTICAL noise; re-encode the key " +
          "(the domain is caller-built, so this is a caller bug)"))))
      .otherwise(c.cast("string"))
    dom.join(counts, Seq(keyA, keyB), "left")
      .select(col(keyA), col(keyB),
        coalesce(col("n_present"), lit(0L)).as("n_true"))
      .withColumn("noise_micro",
        noiseMicro(concat(noPipe(col(keyA)), lit("|"),
          noPipe(col(keyB))), 1.0 / epsilon, seed))
      .withColumn("released", col("n_true") +
        releaseRound(col("noise_micro")))
  }

  /** ε-DP top-k heavy hitters over a PUBLIC key domain — pure
    * POST-PROCESSING of the known-domain count release: every domain
    * key's count is released once under ε (the domain variant of
    * [[dpCounts]]), then the k largest RELEASED counts are selected,
    * ties broken by key order — a deterministic public rule. Selecting
    * on the released values costs no extra budget (the post-processing
    * theorem), so the whole top-k is ε-DP; ranking the TRUE counts and
    * noising only the winners would NOT be — the selection itself
    * would leak membership. Output `(keyCol, released_count, rank)`,
    * rank 1-based. 100 TB shape: the domain is public and bounded by
    * definition (a vocabulary of interest, not the data's key set), so
    * the global top-k plans as TakeOrderedAndProject over |domain|
    * released rows — no single-partition window touches the data; the
    * only window ranks the k winners. */
  def dpTopK(df: DataFrame, keyCol: String, epsilon: Double,
      seed: String, domain: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val released = dpCounts(df, keyCol, epsilon, seed, domain)
      .select(col(keyCol), col("released").as("released_count"))
    released
      .orderBy(col("released_count").desc, col(keyCol)).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("released_count").desc, col(keyCol)))
        .cast("long"))
  }

  /** ε-DP released sums per `keyCol` group: each contribution of
    * `valueCol` (integral) is clipped into [−clip, clip] BEFORE the
    * sum, so adding or removing one row moves the group sum by at
    * most `clip` — the sensitivity; the Laplace scale is clip/ε.
    * Output: `(keyCol, sum_clipped, noise_micro, released)`; as with
    * [[dpCounts]], `sum_clipped` is audit-only. Exact-long clipping
    * and summation — the only floating arithmetic is the noise draw
    * itself, so an oracle replays the release bit-for-bit. */
  def dpSum(df: DataFrame, keyCol: String, valueCol: String,
      epsilon: Double, clip: Long, seed: String): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    require(clip > 0L, s"clip bound must be positive, got $clip")
    val clipped = greatest(least(col(valueCol).cast("long"),
      lit(clip)), lit(-clip))
    df.groupBy(col(keyCol)).agg(sum(clipped).as("sum_clipped"))
      .withColumn("noise_micro",
        noiseMicro(col(keyCol), clip / epsilon, seed))
      .withColumn("released", col("sum_clipped") +
        releaseRound(col("noise_micro")))
  }

  /** DP released MEDIANS per `keyCol` group via the EXPONENTIAL
    * mechanism (McSherry–Talwar 2007) — the non-additive release
    * shape: a median's sensitivity is huge (one row can move it
    * arbitrarily), so Laplace noise on the value is useless; instead
    * the mechanism samples an output v from the PUBLIC grid
    * [0, gridMax] with probability ∝ exp(ε·u(v)/2) for the rank
    * utility u(v) = −| #{x < v} − #{x > v} | (sensitivity 1: one row
    * moves the balance by at most 1).
    *
    * Exactness over both engines is the design constraint. THIS
    * overload fixes the budget at ε = 2·ln 2: the weight becomes
    * exp(−k̂·ln 2) = 2^(−k̂) — an exact power of two, scaled to the
    * long 2^(20−k̂) and truncated at k̂ > 20 (the truncated
    * exponential mechanism; the tail's total mass is < 2^−20 of the
    * peak's). k̂ is the rank distance SHIFTED by its per-group
    * minimum — probabilities are invariant to the translation, and
    * the shift guarantees the group's peak always carries the full
    * 2^20 weight, so no key can silently vanish from the release
    * (output support must not depend on the private data). The
    * general-ε overload below trades the power-of-two trick for a
    * driver-quantized weight table ([[medianWeightTable]]).
    * No transcendental is ever evaluated, so the oracle replays the
    * release bit-for-bit — the M15 rule extended to a mechanism that
    * normally NEEDS exp(). The draw is the same keyed-md5 uniform:
    * target = u32·totalW DIV 2^32 (positive longs — DIV == // both
    * engines; gridMax < 1024 keeps u32·totalW under 2^63), released =
    * the first grid value whose cumulative weight exceeds the target.
    * Values clip into the grid (sensitivity would otherwise leak
    * through the clamp); the SAME seed rules as [[dpCounts]] apply.
    * Output: `(keyCol, n_true, released_median)` — n_true audit-only.
    *
    * Shape: one map-combinable (key, value) count, then everything on
    * the bounded key × grid relation (≤ 1024·keys rows; the window
    * partitions by key). */
  def dpMedian(df: DataFrame, keyCol: String, valueCol: String,
      gridMax: Long, seed: String): DataFrame =
    dpMedianImpl(df, keyCol, valueCol, gridMax, seed,
      // 2^(20−k) is exact in double for k ≤ 20 (the only power
      // evaluated), zero past the truncation
      k => when(k <= lit(20L),
        expr("CAST(power(2.0, 20 - k) AS BIGINT)")).otherwise(lit(0L)))

  /** Quantized integer weight table for the GENERAL-ε exponential
    * mechanism: `w(k) = floor(2^20 · exp(−ε·k/2) + 0.5)` as exact
    * longs, truncated at the first zero. Computed ONCE driver-side —
    * neither engine ever evaluates `exp()`, so a replaying oracle
    * embeds the IDENTICAL literal table and the release stays
    * bit-for-bit (the M20 determinism trick generalized past
    * ε = 2·ln 2: instead of demanding the weights BE powers of two,
    * quantize them once and make the quantized table the mechanism).
    * The quantization is itself ε-respecting in the usual truncated
    * sense: relative weight error ≤ 2^−20 at the peak, and the
    * truncated tail carries < 2^−20 of the peak's mass per point. */
  def medianWeightTable(epsilon: Double): Array[Long] = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var k = 0
    var w = 1L
    while (w > 0L) {
      w = math.floor(1048576.0 * math.exp(-epsilon * k / 2.0) + 0.5)
        .toLong
      if (w > 0L) buf += w
      k += 1
      require(k <= 2048,
        s"epsilon = $epsilon is too small: the quantized weight " +
          "table would exceed 2048 entries (k outgrows every " +
          "realistic rank distance) — release under a larger ε")
    }
    buf.toArray
  }

  /** General-ε DP released MEDIANS — [[dpMedian]] with the budget as
    * a free parameter: weights come from [[medianWeightTable]]
    * (driver-quantized exact longs, no engine-side transcendental)
    * instead of the fixed-ε powers of two. Same grid, draw, shift,
    * and seed rules. */
  def dpMedian(df: DataFrame, keyCol: String, valueCol: String,
      gridMax: Long, epsilon: Double, seed: String): DataFrame = {
    val table = medianWeightTable(epsilon)
    val tableLit = typedlit(table.toSeq)
    dpMedianImpl(df, keyCol, valueCol, gridMax, seed,
      k => when(k < lit(table.length.toLong),
        element_at(tableLit, (k + lit(1L)).cast("int")))
        .otherwise(lit(0L)))
  }

  /** General-ε DP released QUANTILES — the exponential mechanism at
    * an arbitrary rational quantile `qNum/qDen` (Smith 2011's
    * utility): U(v) = |(qDen−qNum)·#{x<v} − qNum·#{x>v}|, which one
    * row moves by at most Δ = max(qNum, qDen−qNum) — so the weight
    * is exp(−ε·Û/(2Δ)) for the shifted Û, i.e. exactly
    * [[medianWeightTable]] evaluated at ε/Δ (the median IS the
    * qNum/qDen = 1/2, Δ = 1 case: U = |#{x<v} − #{x>v}|). Same
    * grid, draw, shift, truncation, and seed rules as [[dpMedian]];
    * the table is driver-quantized exact longs, so both engines
    * replay bit-for-bit. Output: `(keyCol, n_true,
    * released_quantile)`. */
  def dpQuantile(df: DataFrame, keyCol: String, valueCol: String,
      gridMax: Long, qNum: Int, qDen: Int, epsilon: Double,
      seed: String): DataFrame = {
    require(qNum > 0 && qNum < qDen && qDen <= 100,
      s"quantile must be a proper fraction with denominator ≤ 100, " +
        s"got $qNum/$qDen")
    val delta = math.max(qNum, qDen - qNum)
    val table = medianWeightTable(epsilon / delta)
    val tableLit = typedlit(table.toSeq)
    dpMedianImpl(df, keyCol, valueCol, gridMax, seed,
      k => when(k < lit(table.length.toLong),
        element_at(tableLit, (k + lit(1L)).cast("int")))
        .otherwise(lit(0L)),
      qNum = qNum, qDen = qDen)
      .withColumnRenamed("released_median", "released_quantile")
  }

  /** The shared exponential-mechanism pipeline; `weightOf` maps the
    * SHIFTED rank distance k̂ = k − min_group(k) to its integer
    * weight; `qNum/qDen` selects the target quantile (1/2 = median:
    * U = |(qDen−qNum)·lt − qNum·gt| degenerates to |lt − gt|). The
    * shift is the r14-advice fix: probabilities are invariant to a
    * per-group utility translation (the constant factors out of the
    * normalization), but the TRUNCATION is not — un-shifted, a group
    * whose best grid point still has k past the cut (e.g. ≥ 21 rows
    * at each of two adjacent values) had total weight 0 and silently
    * vanished from the release, making output support depend on the
    * private data. Shifted, the group's peak always carries the full
    * 2^20 weight, so every key releases. */
  private def dpMedianImpl(df: DataFrame, keyCol: String,
      valueCol: String, gridMax: Long, seed: String,
      weightOf: Column => Column, qNum: Int = 1, qDen: Int = 2)
      : DataFrame = {
    require(gridMax > 0L && gridMax < 1024L,
      s"gridMax must be in (0, 1024) — u32·totalW must stay a long " +
        s"(got $gridMax)")
    import org.apache.spark.sql.expressions.Window
    val clipped = least(greatest(col(valueCol).cast("long"), lit(0L)),
      lit(gridMax))
    val byVal = df.select(col(keyCol), clipped.as("v"))
      .groupBy(col(keyCol), col("v")).agg(count(lit(1)).as("c"))
    val grid = byVal.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(0L), lit(gridMax))).as("v"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("v"))
    val wAll = Window.partitionBy(col(keyCol))
    grid.join(byVal, Seq(keyCol, "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("le", sum(col("c")).over(wOrd))
      .withColumn("n_true", sum(col("c")).over(wAll))
      // raw k = |(qDen−qNum)·lt − qNum·gt| with lt = le − c,
      // gt = n − le — for 1/2 this is |lt − gt| = |2·le − c − n|,
      // zero exactly at the target quantile
      .withColumn("k_raw",
        abs(lit((qDen - qNum).toLong) * (col("le") - col("c")) -
          lit(qNum.toLong) * (col("n_true") - col("le"))))
      // k = the group-shifted rank distance (see the scaladoc above)
      .withColumn("k",
        col("k_raw") - min(col("k_raw")).over(wAll))
      .withColumn("w", weightOf(col("k")))
      .withColumn("cumw", sum(col("w")).over(wOrd))
      .withColumn("totw", sum(col("w")).over(wAll))
      .withColumn("u32", Sampling.keyHash32(col(keyCol), seed))
      .withColumn("target", expr("u32 * totw DIV 4294967296"))
      // the drawn value: first v with cumW > target (w = 0 rows can
      // never straddle the target; totw ≥ 2^20 > 0 by the shift, so
      // exactly one row per key passes)
      .filter(col("cumw") > col("target") &&
        col("cumw") - col("w") <= col("target"))
      .select(col(keyCol), col("n_true"),
        col("v").as("released_median"))
  }

  /** Schema of the DP release ledger ([[recordRelease]]): one row per
    * release, the persisted evidence that makes the ε-composition
    * rule ENFORCEABLE instead of advisory. `seed_fp` is the truncated
    * SHA-256 FINGERPRINT of the release seed ([[seedFingerprint]]) —
    * the seed itself is never stored (a stored seed would let any
    * ledger reader recompute and subtract the noise; ledger
    * readability must still be restricted alongside the seed, since
    * a fingerprint only slows, never stops, brute-forcing a
    * low-entropy seed); `released_at` is a caller-declared label
    * (the release process stamps it — the ledger itself never reads a
    * clock, so replays are deterministic); `bucket` partitions the
    * ledger for the TxBatch protocol (pmod(release_id, 32)). */
  val LedgerSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("release_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dataset",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("mechanism",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("key_col",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("epsilon_micro",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_keys",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seed_fp",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("released_at",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Truncated SHA-256 hex fingerprint of a release seed — what the
    * ledger stores in place of the seed (same release ⇒ same
    * fingerprint, but the fingerprint reveals nothing the PRF draw
    * depends on). SHA-256 rather than a fast legacy hash to slow an
    * offline brute-force of a LOW-entropy seed from a leaked ledger;
    * the real defenses remain the high-entropy-seed contract AND
    * restricting ledger readability to the release operators (anyone
    * who can read the ledger and guess the seed can subtract the
    * noise — no fingerprint choice repairs a guessable seed).
    *
    * The value is ALGORITHM-TAGGED (`sha256:<32 hex>`): ledgers are
    * append-only, so rows from different eras of this function
    * coexist forever, and the same-seed correlation audit (did two
    * releases reuse one seed?) must know WHICH algorithm produced
    * each row's fingerprint to compare like with like. Untagged rows
    * predate the tagging: bare 32-hex values written before 2026-08-17
    * are truncated SHA-256, 32-hex before that era MD5 — compare
    * untagged rows only within one era. Any future algorithm change
    * changes the tag, never the meaning of an existing one. */
  def seedFingerprint(seed: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    "sha256:" + md.digest(seed.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(32)
  }

  /** Record one DP release in the ledger at `ledgerPath`,
    * idempotently by `releaseId` (the [[TxBatch]] manifest protocol —
    * the `_batch-<releaseId>` directory is both the row and the
    * no-op marker, so a retried release pipeline never double-counts
    * its ε). `epsilonMicro` is the spent budget in micro-ε (exact
    * long — the audit sums it with no floating error); `nKeys` the
    * released key-domain size; `releasedAt` a caller-declared stamp.
    * Returns whether THIS call recorded the release. */
  def recordRelease(s: org.apache.spark.sql.SparkSession,
      ledgerPath: String, releaseId: Long, dataset: String,
      mechanism: String, keyCol: String, epsilonMicro: Long,
      nKeys: Long, seed: String, releasedAt: String): Boolean = {
    require(epsilonMicro > 0L,
      s"epsilon_micro must be positive, got $epsilonMicro")
    val row = org.apache.spark.sql.Row(releaseId, dataset, mechanism,
      keyCol, epsilonMicro, nKeys, seedFingerprint(seed), releasedAt,
      ((releaseId % 32L) + 32L) % 32L)
    val df = s.createDataFrame(
      java.util.Collections.singletonList(row), LedgerSchema)
    TxBatch.publish(s, ledgerPath, releaseId, df, None,
      crashBeforePublish = false, partitionCol = "bucket")
  }

  /** Every recorded release — the compacted base generation (if the
    * ledger has been compacted) plus the live committed batches; the
    * ledger is BASELESS at gen 0 (every row arrives through
    * [[recordRelease]]), so reads take the explicit schema. */
  def readLedger(s: org.apache.spark.sql.SparkSession,
      ledgerPath: String): DataFrame = {
    val dirs = TxBatch.compactedBaseDir(s, ledgerPath).toSeq ++
      TxBatch.liveBatchDirs(s, ledgerPath)
    if (dirs.isEmpty)
      s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], LedgerSchema)
    else dirs.map(s.read.schema(LedgerSchema).parquet(_))
      .reduce(_ unionByName _)
  }

  /** Name of the ledger's writer-lease file (hidden, lives at the
    * ledger root alongside the `_batch-*` release rows). */
  private[graft] val LeaseFile = "_lease"

  /** Run `body` under the ledger's writer lease — the rename-based
    * mutual exclusion that makes [[recordReleaseWithinBudget]]'s
    * check-then-record pair atomic across CONCURRENT release
    * pipelines (two near-cap writers both passing the spent check
    * would overshoot the cap; the TxBatch rename protects each
    * record's idempotence, not the pair). The machinery — the
    * directory-rename acquisition dance, marker-mtime staleness
    * measured from acquisition, the monotone fencing generation — is
    * [[TxBatch.tryWithLease]], shared with layout maintenance (the
    * ledger's lease is `_lease`, maintenance's is
    * `_maintenance-lease`, so a ledger record and a ledger fold
    * never deadlock). `body` receives the fencing handle and MUST
    * call `checkFenced` immediately before its critical mutation: a
    * holder paused past `staleMs` whose lease was broken then
    * refuses instead of landing its record after a thief's — the
    * cap-overshoot the lease exists to exclude. A contender that
    * cannot acquire within the retry budget refuses loudly rather
    * than proceeding unguarded — the ledger's contract (maintenance
    * no-ops instead; see [[TxBatch.compact]]). */
  private[graft] def withLedgerLease[T](
      s: org.apache.spark.sql.SparkSession, ledgerPath: String,
      staleMs: Long = 60000L)(body: TxBatch.LeaseHandle => T): T =
    TxBatch.tryWithLease(s, ledgerPath, LeaseFile, staleMs)(body)
      .getOrElse(throw new IllegalStateException(
        s"could not acquire the DP ledger writer lease at " +
          s"$ledgerPath/$LeaseFile — another release pipeline holds " +
          "it; retry once it completes, or delete a stale " +
          s"$LeaseFile left by a dead holder"))

  /** Test failpoint: invoked between the budget check and the fenced
    * record — the window in which a paused holder's lease can be
    * stale-broken by a contender. Production leaves the no-op. */
  @volatile private[graft] var recordFailpoint: () => Unit = () => ()

  /** [[recordRelease]] gated by the dataset's cumulative budget: the
    * release records ONLY when spent(dataset) + epsilonMicro stays
    * within `capMicro` — otherwise it REFUSES loudly (the approval
    * gate the audit row exists for, made enforceable). A retried
    * settled id stays a no-op BEFORE the cap check (its ε is already
    * counted — refusing a retry would wedge an at-cap pipeline).
    * The check-then-record pair runs under the ledger's writer lease
    * ([[withLedgerLease]]), so two concurrent near-cap pipelines can
    * never BOTH pass the spent check and overshoot the cap — the
    * loser observes the winner's row and refuses. The record is
    * FENCED: a holder paused past `staleMs` (GC, a slow Spark job)
    * whose lease was stale-broken finds the fencing generation moved
    * and refuses to record — its budget check is no longer current,
    * and landing anyway could overshoot the cap the moment the thief
    * records too. */
  def recordReleaseWithinBudget(s: org.apache.spark.sql.SparkSession,
      ledgerPath: String, releaseId: Long, dataset: String,
      mechanism: String, keyCol: String, epsilonMicro: Long,
      nKeys: Long, seed: String, releasedAt: String,
      capMicro: Long, staleMs: Long = 60000L): Boolean = {
    require(capMicro > 0L, s"capMicro must be positive, got $capMicro")
    // settled id: no-op before the cap check AND before the lease
    // (an at-cap retry must never block on, or be refused by, the
    // lease another pipeline holds — its ε is already counted)
    def settled = {
      val r = new org.apache.hadoop.fs.Path(ledgerPath)
      val fs = r.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(r,
        s"_batch-$releaseId")) ||
        TxBatch.appliedIds(s, ledgerPath).contains(releaseId)
    }
    if (settled) return false
    withLedgerLease(s, ledgerPath, staleMs) { lease =>
      // re-check under the lease: the id may have settled while we
      // waited for a concurrent pipeline publishing the SAME release
      if (settled) false
      else {
        val spent = readLedger(s, ledgerPath)
          .filter(col("dataset") === dataset)
          .agg(coalesce(sum(col("epsilon_micro")), lit(0L)))
          .head().getLong(0)
        if (spent + epsilonMicro > capMicro)
          throw new IllegalStateException(
            s"DP budget exceeded for dataset '$dataset': spent " +
              s"$spent micro-ε + requested $epsilonMicro > cap " +
              s"$capMicro — the release is REFUSED; raise the cap, " +
              "retire the dataset, or release nothing (the audit row " +
              "is the evidence an approval board reads)")
        recordFailpoint()
        // fencing: the budget check above is only as current as the
        // lease — if it was broken while this holder was paused, a
        // thief may have recorded since; refuse rather than land
        lease.checkFenced(
          s"DP ledger record for release $releaseId at $ledgerPath")
        recordRelease(s, ledgerPath, releaseId, dataset, mechanism,
          keyCol, epsilonMicro, nKeys, seed, releasedAt)
      }
    }
  }

  /** The budget audit over the ledger: cumulative spent ε (exact
    * micro-ε longs) per dataset — the row a release-approval gate
    * reads before authorizing the next release (sequential
    * composition: budgets over one dataset ADD). */
  def budgetAudit(s: org.apache.spark.sql.SparkSession,
      ledgerPath: String): DataFrame =
    readLedger(s, ledgerPath)
      .groupBy(col("dataset"))
      .agg(count(lit(1)).as("n_releases"),
        sum(col("epsilon_micro")).as("eps_micro_spent"),
        sum(col("n_keys")).as("n_keys_released"))

  /** ε-DP released means per `keyCol` group: the canonical count+sum
    * pair, each released under ε/2 (sequential composition: the two
    * queries read the same rows, so the budgets ADD — total ε). The
    * count half has sensitivity 1 (scale 2/ε); the sum half clips
    * contributions at `clip` (scale 2·clip/ε). The two draws key on
    * the same group under distinct derived seeds (`seed + "count:"`,
    * `seed + "sum:"`), so they are independent PRF draws from one
    * release secret. Output: `(keyCol, released_count, released_sum,
    * released_mean)` where the mean divides the released pair
    * (denominator floored at 1) and quantizes to 1e−6 — everything
    * published derives from already-noised values, so the division
    * spends no extra budget. */
  def dpMean(df: DataFrame, keyCol: String, valueCol: String,
      epsilon: Double, clip: Long, seed: String): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    require(clip > 0L, s"clip bound must be positive, got $clip")
    val clipped = greatest(least(col(valueCol).cast("long"),
      lit(clip)), lit(-clip))
    val halves = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_true"), sum(clipped).as("sum_clipped"))
      .withColumn("released_count", col("n_true") + releaseRound(
        noiseMicro(col(keyCol), 2.0 / epsilon, seed + "count:")))
      .withColumn("released_sum", col("sum_clipped") + releaseRound(
        noiseMicro(col(keyCol), 2.0 * clip / epsilon, seed + "sum:")))
    halves.select(col(keyCol), col("released_count"),
      col("released_sum"),
      (floor(col("released_sum").cast("double") /
        greatest(col("released_count"), lit(1L)).cast("double") *
        lit(1000000.0) + lit(0.5)) / lit(1000000.0))
        .as("released_mean"))
  }
}
