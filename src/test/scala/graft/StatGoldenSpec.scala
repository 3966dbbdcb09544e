package graft

import org.apache.commons.io.FileUtils

/** Hand-computed golden values for the hypothesis-test family, run
  * through the ACTUAL driver query entries over tiny planted events
  * fixtures — the evidence layer the DuckDB oracle cannot provide:
  * the oracle proves the two ENGINES agree, but a statistic bug
  * mirrored into both spellings keeps the hash green (the T31
  * n_days-counted-tie-GROUPS bug proved this class is real). Every
  * expected number below is worked from the textbook formula in the
  * comment, independent of either engine spelling.
  *
  * Fixture A (daily counts, type "a"): x = 3, 1, 4, 1, 5, 9 on days
  * 0..5 (n = 6, Σx = 23, ΣQ = 133).
  * Fixture A (type "b"): x = 1, 1, 1, 9, 9, 9 — the tie/step series.
  * Fixture B (split values): window A (before Jan 16) = {1, 2, 2, 5},
  * window B = {2, 3, 4}.
  */
class StatGoldenSpec extends SparkSuite {
  import spark.implicits._

  /** Write a tiny events table under /tmp and return the dir the
    * driver-contract query entries read. */
  private def writeEvents(name: String,
      rows: Seq[(String, String, Double)]): String = {
    val dir = s"/tmp/graft_golden/$name"
    FileUtils.deleteQuietly(new java.io.File(dir))
    rows.zipWithIndex.map { case ((ts, et, v), i) =>
      (i.toLong, ts, 1000L + i, et, v, "{}")
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value",
      "props")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Daily-count series realized as that many event rows per day. */
  private def dailySeries(tpe: String, counts: Seq[Long])
      : Seq[(String, String, Double)] =
    counts.zipWithIndex.flatMap { case (c, d) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
      Seq.fill(c.toInt)((s"$day 12:00:00", tpe, 1.0))
    }

  private lazy val dirDaily = writeEvents("daily",
    dailySeries("a", Seq(3L, 1L, 4L, 1L, 5L, 9L)) ++
      dailySeries("b", Seq(1L, 1L, 1L, 9L, 9L, 9L)))

  private lazy val dirSplit = writeEvents("split",
    Seq(1.0, 2.0, 2.0, 5.0).map(v => ("2024-01-10 12:00:00", "e", v)) ++
      Seq(2.0, 3.0, 4.0).map(v => ("2024-01-20 12:00:00", "e", v)))

  private def q(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("Mann–Kendall golden: S, tie term, Var18 and z from the " +
      "textbook formula on two hand-worked series") {
    // type a, x = 3,1,4,1,5,9: S = Σ_{i<j} sign(x_j − x_i): row sums
    // +1, +3, +1, +2, +1 → S = 8; one tie group (value 1, c = 2):
    // Σ c(c−1)(2c+5) = 18; n(n−1)(2n+5) = 6·5·17 = 510 → var18 = 492;
    // z = (S−1)/√(492/18) = 7/5.22813 = 1.338911 (q6), no trend.
    // type b, x = 1,1,1,9,9,9: S = 9 (the nine 1→9 pairs), two tie
    // groups c = 3: tie = 2·(3·2·11) = 132 → var18 = 378;
    // z = 8/√21 = 1.745743, no trend at 1.96.
    val r = q("mann_kendall_trend", dirDaily).collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5), x.getLong(6))))
      .toMap
    assert(r("a") == ((6L, 8L, 18L, 492L, 1.338911, 0L)))
    assert(r("b") == ((6L, 9L, 132L, 378L, 1.745743, 0L)))
  }

  test("Theil–Sen golden: the lower median of all 15 pairwise slopes") {
    // type a: slopes sorted = −3, −2, −2/3, 0, .5, .5, .5, 1.2,
    // 4/3, 5/3, 2, 3, 4, 4, 4 → lower median (8th of 15) = 1.2.
    // type b: 0 ×6, 1.6, 2 ×2, 8/3 ×3, 4 ×2, 8 → 8th = 2.0.
    val r = q("theil_sen", dirDaily).collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2),
        x.getDouble(3)))).toMap
    assert(r("a") == ((6L, 15L, 1.2)))
    assert(r("b") == ((6L, 15L, 2.0)))
  }

  test("turning-point golden: strict extrema count and Kendall z; " +
      "ties break no turning point") {
    // type a: interior days 1..4 → 3>1<4 TP, 1<4>1 TP, 4>1<5 TP,
    // 1<5<9 no → T = 3; E = 2(6−2)/3 = 8/3, Var = (16·6−29)/90 =
    // 67/90; z = (3 − 8/3)/√(67/90) = 0.386334 (q6).
    // type b: all interior comparisons tie on at least one side
    // (strict both sides required) → T = 0; z = (0 − 8/3)/√(67/90)
    // = −3.09067 — the tie convention is itself the pin.
    val r = q("turning_points", dirDaily).collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getLong(4)))).toMap
    assert(r("a") == ((6L, 3L, 0.386334, 0L)))
    assert(r("b") == ((6L, 0L, -3.09067, 1L)))
  }

  test("runs-test golden: run count against the Wald–Wolfowitz " +
      "E[R]/Var[R] on a hand-dichotomized series") {
    // type a: 6x vs Σx = 23 → B B A B A A (18,6 < 23; 24,30,54 > 23;
    // 6 < 23) → 4 runs, n1 = n2 = 3; E[R] = 1 + 2·9/6 = 4 → z = 0.
    // type b: B B B A A A → 2 runs; Var[R] = 2·9·(18−6)/(36·5) = 1.2;
    // z = (2−4)/√1.2 = −1.825742 (q6).
    val r = q("runs_test_drift", dirDaily).collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getLong(5)))).toMap
    assert(r("a") == ((3L, 3L, 4L, 0.0, 0L)))
    assert(r("b") == ((3L, 3L, 2L, -1.825742, 0L)))
  }

  test("CUSUM golden: the one-sided excursion walks the hand value " +
      "day by day, clamping to zero through the downward runs") {
    // type a: 6x − 23 = −5, −17, 1, −17, 7, 31; running S_t = −5,
    // −22, −21, −38, −31, 0; V_t = S_t − min(0, min_{j<t} S_j),
    // floored at 0 → 0, 0, 1, 0, 7, 38. Threshold: 25·(6·133 − 23²)
    // = 25·269 = 6725 > 38² → no change flagged.
    val r = q("cusum_changepoints", dirDaily)
      .filter($"event_type" === "a").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSeq
    assert(r == Seq((0L, 3L, 0L, 0L), (1L, 1L, 0L, 0L),
      (2L, 4L, 1L, 0L), (3L, 1L, 0L, 0L), (4L, 5L, 7L, 0L),
      (5L, 9L, 38L, 0L)))
  }

  test("change-localization golden: the argmax split, micro-quantized " +
      "score and the before/after means") {
    // type a: cum = 3,4,8,9,14 at t = 1..5; num = 6·cum − 23·t = −5,
    // −22, −21, −38, −31; score6 = round(num²/(t(6−t))·10⁶/36) =
    // 138889, 1680556, 1361111, 5013889, 5338889 → argmax t = 5
    // (split day 4): mean_before = 14/5 = 2.8, mean_after = 9/1 = 9.
    val r = q("change_localization", dirDaily)
      .filter($"event_type" === "a").collect().map(x =>
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4),
          x.getDouble(5), x.getLong(6))).toSeq
    assert(r == Seq((6L, 4L, 5L, 2.8, 9.0, 5338889L)))
  }

  test("Mann–Whitney golden: doubled mid-ranks, U, the tie term and " +
      "the tie-corrected z on a hand-ranked merged sample") {
    // merged {1, 2, 2, 2, 3, 4, 5}: ranks 1, 3, 3, 3, 5, 6, 7 (mid
    // of 2-4 for the tied 2s). R1 = 1 + 3 + 3 + 7 = 14 → 2·R1 = 28;
    // U1 = R1 − n1(n1+1)/2 = 4 → 2·U1 = 8; tie term = 3³ − 3 = 24;
    // z = (4 − 6)/√(1·(8 − 24/42)) = −2/2.725541 = −0.733799 (q6).
    val r = q("mannwhitney_drift", dirSplit).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
      x.getDouble(4), x.getLong(5)) == ((4L, 3L, 8L, 24L, -0.733799,
      0L)))
  }

  test("Kolmogorov–Smirnov golden: the max CDF gap as an exact " +
      "integer and the α=0.05 critical value") {
    // gaps |cum1·n2 − cum2·n1| after each distinct value: 3, 5, 1,
    // 3, 0 → D_num = 5; D = 5/12 = 0.416667 (q6); crit =
    // 1.358·√(7/12) = 1.03719 (q6); no rejection.
    val r = q("ks_drift", dirSplit).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
      x.getDouble(4), x.getLong(5)) == ((4L, 3L, 5L, 0.416667,
      1.03719, 0L)))
  }

  test("Welch golden: t and the Welch–Satterthwaite df from exact " +
      "cents sums") {
    // cents A = {100, 200, 200, 500}: n1 = 4, s1 = 1000, q1 = 340000
    // → va1 = (4·340000 − 10⁶)/12 = 30000, se1 = 7500; B = {200,
    // 300, 400}: va2 = (3·290000 − 810000)/6 = 10000, se2 = 10000/3.
    // t = (250 − 300)/√(7500 + 3333.33) = −0.480384; df =
    // 10833.33²/(7500²/3 + 3333.33²/2) = 4.828571 (q6).
    val r = q("welch_ttest", dirSplit).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3),
      x.getDouble(4), x.getDouble(5), x.getLong(6)) ==
      ((4L, 3L, 2.5, 3.0, -0.480384, 4.828571, 0L)))
  }

  test("chi-squared golden: a hand-worked 2×2 contingency table — " +
      "per-cell micro terms, χ² and Cramér's V") {
    // counts: (x,Mon)=10 (x,Tue)=20 (y,Mon)=30 (y,Tue)=40; N = 100;
    // margins row 30/70, col 40/60. Textbook Σ(obs−exp)²/exp with
    // exp = 12, 18, 28, 42 → 4/12 + 4/18 + 4/28 + 4/42 = 0.793650
    // (micro terms 333333 + 222222 + 142857 + 95238); V =
    // √(0.79365/(100·1)) = 0.089087 (q6). 2024-01-01 is a Monday.
    val dir = writeEvents("chi2",
      Seq.fill(10)(("2024-01-01 10:00:00", "x", 1.0)) ++
        Seq.fill(20)(("2024-01-02 10:00:00", "x", 1.0)) ++
        Seq.fill(30)(("2024-01-01 10:00:00", "y", 1.0)) ++
        Seq.fill(40)(("2024-01-02 10:00:00", "y", 1.0)))
    val r = q("chi2_independence", dir).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
      x.getDouble(4), x.getDouble(5)) == ((100L, 2L, 2L, 1L, 0.79365,
      0.089087)))
  }

  test("ANOVA golden: SSB/SSW/F from three hand-summed groups") {
    // cents g1 = {100,200,300}, g2 = {200,400}, g3 = {500,600,700}:
    // Σ s_g²/n_g = 120000 + 180000 + 1080000 = 1380000; SSB =
    // 1380000 − 3000²/8 = 255000 (cents² → 25.5); SSW = 1440000 −
    // 1380000 = 60000 (→ 6.0); F = (255000/2)/(60000/5) = 10.625.
    // Textbook check: group means 2, 3, 6 vs grand 3.75 → SSB =
    // 3·1.75² + 2·0.75² + 3·2.25² = 25.5; SSW = 2 + 2 + 2 = 6.
    val dir = writeEvents("anova",
      Seq(1.0, 2.0, 3.0).map(v => ("2024-01-05 10:00:00", "g1", v)) ++
        Seq(2.0, 4.0).map(v => ("2024-01-05 10:00:00", "g2", v)) ++
        Seq(5.0, 6.0, 7.0).map(v => ("2024-01-05 10:00:00", "g3", v)))
    val r = q("anova_f", dir).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
      x.getDouble(4), x.getDouble(5), x.getDouble(6)) ==
      ((3L, 8L, 2L, 5L, 25.5, 6.0, 10.625)))
  }
}
