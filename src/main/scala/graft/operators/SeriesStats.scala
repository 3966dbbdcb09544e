package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable series/association statistics over grouped observations —
  * the library face of the T37/G31 query rows, so any relation (not
  * just the events fixture) can ask "is there lag structure" or "do
  * these two measures move together" through one call or its SQL TVF
  * (`graft_acf`, `graft_spearman`).
  *
  * Exactness contract (the engine-wide rule): every sum is an exact
  * long until the single final division — Spearman ranks carry as
  * DOUBLED mid-ranks (2·RANK + ties − 1, exact integers; the common
  * 2× scale cancels in ρ), ACF deviations cross-multiply by the group
  * day count instead of subtracting a rational mean, with an in-plan
  * raise_error envelope at |n·x − S| ≤ 3·10⁹. Degenerate variances
  * (constant series) report 0, never NULL/NaN — both engines, one
  * spelling.
  */
object SeriesStats {

  private def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0)

  /** Spearman rank correlation of (`xCol`, `yCol`) per `partCol`
    * group: `(partCol, n_obs, rho)`. Monotone association with
    * textbook mid-rank ties; ranks and sums run on the grouped
    * relation, so cost is bounded by the observation count, and ρ is
    * one identically-spelled q6 double per group. */
  def spearman(df: DataFrame, partCol: String, xCol: String,
      yCol: String): DataFrame = {
    def r2(c: String) =
      lit(2L) * rank().over(
        Window.partitionBy(col(partCol)).orderBy(col(c))).cast("long") +
        count(lit(1)).over(
          Window.partitionBy(col(partCol), col(c))).cast("long") -
        lit(1L)
    val ranked = df
      .select(col(partCol), r2(xCol).as("rx"), r2(yCol).as("ry"))
    val agg = ranked.groupBy(col(partCol))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    agg.select(col(partCol), col("n").as("n_obs"),
      q6(when(vx === 0L || vy === 0L, lit(0.0))
        .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))))
        .as("rho"))
  }

  /** Seasonal STRENGTH of a `period`-cycle in the integer series
    * `nCol` indexed by `dayCol` per `partCol` group (Hyndman's
    * F_s = max(0, 1 − Var(residual)/Var(deviation)), residual vs the
    * group's phase mean, deviation vs its grand mean):
    * `(partCol, n_days, ss_resid_c2, ss_total_c2, strength)`. Phase =
    * (day + phaseOffset) mod period — offset 3 on epoch days puts
    * phase 0 on Monday, the chi2 dow spelling. Both residual and
    * deviation quantize to CENTI-unit longs via one identically-
    * spelled division of exact-long cross products (no rational mean
    * is ever summed — the sums of squares stay order-free longs)
    * under an in-plan 3·10⁹ envelope; strength is one q6 double with
    * the degenerate branch at 0. */
  def seasonalStrength(df: DataFrame, partCol: String, dayCol: String,
      nCol: String, period: Int, phaseOffset: Int = 0): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val dd = df.withColumn("__phase",
      pmod(col(dayCol) + lit(phaseOffset.toLong), lit(period.toLong)))
    val byPhase = dd.groupBy(col(partCol), col("__phase"))
      .agg(count(lit(1)).as("nw"), sum(col(nCol)).as("sw"))
    val tot = dd.groupBy(col(partCol))
      .agg(count(lit(1)).as("nd"), sum(col(nCol)).as("sn"))
    def centi(num: Column, den: Column): Column = {
      val c = floor(num.cast("double") * lit(100.0) /
        den.cast("double") + lit(0.5)).cast("long")
      when(abs(c) > lit(3000000000L),
        expr("raise_error('SeriesStats.seasonalStrength: |dev|*100 > " +
          "3e9 — the exact-long envelope; pre-aggregate upstream')")
          .cast("bigint"))
        .otherwise(c)
    }
    dd.join(byPhase, Seq(partCol, "__phase"))
      .join(tot, partCol)
      .select(col(partCol),
        centi(col(nCol) * col("nw") - col("sw"), col("nw")).as("rm"),
        centi(col(nCol) * col("nd") - col("sn"), col("nd")).as("dm"))
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("rm") * col("rm")).as("ss_resid_c2"),
        sum(col("dm") * col("dm")).as("ss_total_c2"))
      .select(col(partCol), col("n_days"), col("ss_resid_c2"),
        col("ss_total_c2"),
        q6(when(col("ss_total_c2") === 0L, lit(0.0))
          .otherwise(greatest(lit(0.0),
            lit(1.0) - col("ss_resid_c2").cast("double") /
              col("ss_total_c2").cast("double")))).as("strength"))
  }

  /** Pairwise lead-lag cross-correlation between the groups of one
    * (id, day, n) relation at lags −`maxLag`..`maxLag`:
    * `(<id>_a, <id>_b, lag, n_pairs, r)` for ordered id pairs, where
    * r_L = Σ devA(t)·devB(t+L) / √(ΣdevA²·ΣdevB²) over shared days
    * and each series' deviations cross-multiply by its OWN day count
    * (the scale factors cancel in r). A peak at L > 0 reads "A leads
    * B by L days". The lag axis explodes onto the b side so the pair
    * join hashes on the shared day (no nested loop); same envelope
    * and degenerate-variance rules as [[acf]]. */
  def ccf(df: DataFrame, idCol: String, dayCol: String, nCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val outA = s"${idCol}_a"
    val outB = s"${idCol}_b"
    val tot = df.groupBy(col(idCol))
      .agg(count(lit(1)).as("nd"), sum(col(nCol)).as("sn"))
    val dev = df.join(tot, idCol)
      .select(col(idCol), col(dayCol).as("__day"),
        when(abs(col(nCol) * col("nd") - col("sn")) > lit(3000000000L),
          expr("raise_error('SeriesStats.ccf: |n*nd - sn| > 3e9 — " +
            "the exact-long envelope; pre-aggregate upstream')")
            .cast("bigint"))
          .otherwise(col(nCol) * col("nd") - col("sn")).as("d"))
    val den = dev.groupBy(col(idCol))
      .agg(sum(col("d") * col("d")).as("ss"))
    val a = dev.select(col(idCol).as(outA), col("__day").as("da"),
      col("d").as("xa"))
    val b = dev.select(col(idCol).as(outB), col("__day").as("db"),
      col("d").as("xb"))
      .withColumn("lag",
        explode(lit((-maxLag to maxLag).map(_.toLong).toArray)))
    a.join(b, col("da") === col("db") - col("lag") &&
        col(outA) < col(outB))
      .groupBy(col(outA), col(outB), col("lag"))
      .agg(sum(col("xa") * col("xb")).as("num"),
        count(lit(1)).as("n_pairs"))
      .join(den.select(col(idCol).as(outA), col("ss").as("ssa")), outA)
      .join(den.select(col(idCol).as(outB), col("ss").as("ssb")), outB)
      .select(col(outA), col(outB), col("lag"), col("n_pairs"),
        q6(when(col("ssa") === 0L || col("ssb") === 0L, lit(0.0))
          .otherwise(col("num").cast("double") /
            (sqrt(col("ssa").cast("double")) *
              sqrt(col("ssb").cast("double"))))).as("r"))
  }

  /** Lag-1..`maxLag` autocorrelation of the integer series `nCol`
    * indexed by `dayCol` per `partCol` group:
    * `(partCol, lag, n_days, n_pairs, r)`. Calendar-axis pairing —
    * a missing index contributes no pair (the observed-days
    * convention); deviations are the exact longs n_days·x − Σx under
    * an in-plan raise_error envelope at 3·10⁹. One row per (group,
    * lag) with ≥ 1 pair. */
  def acf(df: DataFrame, partCol: String, dayCol: String, nCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val tot = df.groupBy(col(partCol))
      .agg(count(lit(1)).as("nd"), sum(col(nCol)).as("sn"))
    val dev = df.join(tot, partCol)
      .select(col(partCol), col(dayCol).as("__day"),
        when(abs(col(nCol) * col("nd") - col("sn")) > lit(3000000000L),
          expr("raise_error('SeriesStats.acf: |n*nd - sn| > 3e9 — " +
            "the exact-long envelope; pre-aggregate upstream')")
            .cast("bigint"))
          .otherwise(col(nCol) * col("nd") - col("sn")).as("d"))
    val den = dev.groupBy(col(partCol))
      .agg(sum(col("d") * col("d")).as("den"))
    val a = dev.select(col(partCol), col("__day").as("di"),
      col("d").as("da"))
    val b = dev.select(col(partCol), col("__day").as("dj"),
      col("d").as("db"))
    a.join(b, Seq(partCol))
      .filter(col("dj") - col("di") >= 1L &&
        col("dj") - col("di") <= maxLag.toLong)
      .groupBy(col(partCol), (col("dj") - col("di")).as("lag"))
      .agg(sum(col("da") * col("db")).as("num"),
        count(lit(1)).as("n_pairs"))
      .join(den, partCol).join(tot, partCol)
      .select(col(partCol), col("lag"), col("nd").as("n_days"),
        col("n_pairs"),
        q6(when(col("den") === 0L, lit(0.0))
          .otherwise(col("num").cast("double") / col("den").cast("double")))
          .as("r"))
  }
}
