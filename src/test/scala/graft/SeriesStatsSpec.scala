package graft

import graft.operators.SeriesStats

/** Hand-computed golden values for the series-stats operator family —
  * the fixture oracle proves engine parity; these prove the STATISTICS
  * are the textbook ones on series small enough to verify by hand. */
class SeriesStatsSpec extends SparkSuite {
  import spark.implicits._

  test("acf: an alternating series has the textbook negative lag-1 / " +
      "positive lag-2 signature, exactly") {
    // x = 10,20,10,20,10,20 on days 0..5: nd=6, S=90,
    // dev = n*6-90 = ±30 alternating, den = 5400;
    // lag1: 5 pairs of -900 -> -4500/5400 = -0.833333 (q6)
    // lag2: 4 pairs of +900 -> +3600/5400 = 0.666667 (q6)
    val df = Seq.tabulate(6)(i =>
      ("a", i.toLong, if (i % 2 == 0) 10L else 20L))
      .toDF("id", "day", "n")
    val r = SeriesStats.acf(df, "id", "day", "n", 2)
      .select($"lag", $"n_pairs", $"r")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .toSet
    assert(r == Set((1L, 5L, -0.833333), (2L, 4L, 0.666667)))
  }

  test("acf: a constant series reports r = 0 (degenerate variance), " +
      "never NULL/NaN") {
    val df = Seq.tabulate(5)(i => ("a", i.toLong, 7L))
      .toDF("id", "day", "n")
    val r = SeriesStats.acf(df, "id", "day", "n", 2)
      .select($"r").as[Double].collect()
    assert(r.nonEmpty && r.forall(_ == 0.0))
  }

  test("spearman: monotone pairs give exactly ±1; a constant side " +
      "gives 0") {
    val up = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 5L, 50L)).toDF("id", "x", "y")
    assert(SeriesStats.spearman(up, "id", "x", "y")
      .select($"rho").as[Double].head() == 1.0)
    val down = Seq(("a", 1L, 50L), ("a", 2L, 30L), ("a", 3L, 20L),
      ("a", 5L, 10L)).toDF("id", "x", "y")
    assert(SeriesStats.spearman(down, "id", "x", "y")
      .select($"rho").as[Double].head() == -1.0)
    val flat = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))
      .toDF("id", "x", "y")
    assert(SeriesStats.spearman(flat, "id", "x", "y")
      .select($"rho").as[Double].head() == 0.0)
  }

  test("spearman: ties take mid-ranks — a tied-x pair splits the " +
      "difference, matching the hand value") {
    // x = (1, 2, 2, 4), y = (1, 2, 3, 4): doubled mid-ranks
    // rx = 2,5,5,8; ry = 2,4,6,8 -> rho = 12/(sqrt(18)*sqrt(20))
    //   = 0.948683 (q6)
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 2L, 3L),
      ("a", 4L, 4L)).toDF("id", "x", "y")
    assert(SeriesStats.spearman(df, "id", "x", "y")
      .select($"rho").as[Double].head() == 0.948683)
  }

  test("ccf: a series that is an exact one-day-shifted copy peaks at " +
      "r = 1.0 at lag +1 (A leads B by one day)") {
    val a = Seq(5L, 9L, 2L, 7L, 3L, 8L)
    val df = (a.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      a.zipWithIndex.map { case (v, i) => ("b", i.toLong + 1L, v) })
      .toDF("id", "day", "n")
    val rows = SeriesStats.ccf(df, "id", "day", "n", 1)
      .select($"id_a", $"id_b", $"lag", $"n_pairs", $"r")
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    val atPlus1 = rows.find(_._3 == 1L).get
    assert(atPlus1 == ("a", "b", 1L, 6L, 1.0), rows.toSeq)
  }

  test("ccf: the reversed lead (B is a one-day-EARLIER copy of A) " +
      "peaks at lag -1 — the sign convention reads 'A lags B'") {
    val a = Seq(5L, 9L, 2L, 7L, 3L, 8L)
    val df = (a.zipWithIndex.map { case (v, i) => ("a", i.toLong + 1L, v) } ++
      a.zipWithIndex.map { case (v, i) => ("b", i.toLong, v) })
      .toDF("id", "day", "n")
    val atMinus1 = SeriesStats.ccf(df, "id", "day", "n", 1)
      .filter($"lag" === -1L)
      .select($"n_pairs", $"r")
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(atMinus1.toSeq == Seq((6L, 1.0)))
  }

  test("seasonal strength: a perfectly periodic series scores 1.0, a " +
      "constant series 0.0") {
    // period 3, values repeat (10, 20, 60) -> residuals vs the phase
    // means are all zero -> strength 1
    val periodic = Seq.tabulate(9)(i =>
      ("a", i.toLong, Seq(10L, 20L, 60L)(i % 3)))
      .toDF("id", "day", "n")
    val s1 = SeriesStats
      .seasonalStrength(periodic, "id", "day", "n", 3)
      .select($"strength").as[Double].head()
    assert(s1 == 1.0)
    val const = Seq.tabulate(9)(i => ("a", i.toLong, 7L))
      .toDF("id", "day", "n")
    val s0 = SeriesStats
      .seasonalStrength(const, "id", "day", "n", 3)
      .select($"strength").as[Double].head()
    assert(s0 == 0.0)
  }

  test("acf envelope: a deviation past 3e9 fails fast, in-plan") {
    val df = Seq(("a", 0L, 0L), ("a", 1L, 4000000000L))
      .toDF("id", "day", "n")
    val e = intercept[Exception](
      SeriesStats.acf(df, "id", "day", "n", 1).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exact-long envelope")),
      messages(e))
  }
}
