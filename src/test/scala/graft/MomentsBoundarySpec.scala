package graft

import org.apache.spark.sql.functions._

/** The exactness claims behind the power-sum aggregate family
  * (agg_moments G22, agg_corr G3, ols_fit G18), pinned at and beyond
  * the 2^53 boundary where a decimal→double cast stops being
  * trivially exact:
  *
  *   1. Spark's decimal(38,0)→double cast is CORRECTLY ROUNDED
  *      (round-to-nearest, ties-to-even) — bitwise equal to the IEEE
  *      reference (`java.math.BigDecimal.doubleValue`, specified as
  *      correctly rounded) at the boundary, at odd midpoints, and at
  *      38-digit magnitudes. DuckDB's HUGEINT→DOUBLE cast rounds the
  *      same way (asserted at the 2^53 midpoints by the oracle gate's
  *      agg_moments run, whose s4 sums sit near 1e22), so identical
  *      spellings stay hash-equal across engines past 2^53.
  *   2. The full agg_moments pipeline on values that push the q⁴ sums
  *      far past 2^53 is bitwise equal to an exact in-memory
  *      replay (BigInt power sums, correctly-rounded toDouble, the
  *      identical central-moment double algebra).
  *   3. The envelope guard FAILS LOUDLY: |value| above the documented
  *      1e3 bound raises instead of silently degrading.
  */
class MomentsBoundarySpec extends SparkSuite {
  import spark.implicits._

  private val boundaryValues: Seq[String] = Seq(
    "9007199254740991",                        // 2^53 − 1: exact
    "9007199254740992",                        // 2^53: exact
    "9007199254740993",                        // 2^53 + 1: odd midpoint → ties-to-even DOWN
    "9007199254740995",                        // odd midpoint → ties-to-even UP
    "9007199254740997",                        // non-midpoint, rounds down
    "18014398509481985",                       // 2^54 + 1: rounds (ulp = 4)
    "100000000000000009",                      // 1e17 + 9
    "1000000000000000007",                     // 1e18 + 7
    "123456789012345678901234567",             // 27 digits
    "99999999999999999999999999999999999999")  // 38 nines (decimal cap)

  test("decimal(38,0) -> double cast is correctly rounded at and past 2^53") {
    boundaryValues.foreach { v =>
      val got = spark.sql(
        s"SELECT CAST(CAST('$v' AS DECIMAL(38,0)) AS DOUBLE)")
        .head().getDouble(0)
      val want = new java.math.BigDecimal(v).doubleValue()
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"cast of $v: got $got, IEEE reference $want")
      // and negated (sign symmetry of the rounding)
      val gotNeg = spark.sql(
        s"SELECT CAST(CAST('-$v' AS DECIMAL(38,0)) AS DOUBLE)")
        .head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(gotNeg) ==
        java.lang.Double.doubleToLongBits(-want))
    }
  }

  test("agg_moments pipeline bitwise-equals an exact in-memory replay " +
      "with power sums far past 2^53") {
    // values at the top of the envelope (|v| ≤ 1e3 ⇒ q ≤ 1e7): ONE
    // row's q⁴ = 1e28 already dwarfs 2^53 ≈ 9e15, so every s2/s3/s4
    // cast below exercises the correctly-rounded regime
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(5000) { i =>
      val g = s"g${i % 3}"
      val v = 900.0 + rnd.nextInt(1000000) / 10000.0  // [900, 1000)
      (g, v)
    }
    val got = graft.queries.Aggregates
      .momentsOf(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Double, Double, Double)].collect().toSeq

    def q6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, vs) =>
      val qs = vs.map(r => math.floor(r._2 * 10000.0 + 0.5).toLong)
      val n = qs.length.toLong
      // exact integer power sums, then the correctly-rounded cast
      val s1 = qs.foldLeft(BigInt(0))((a, q) => a + BigInt(q)).toDouble
      val s2 = qs.foldLeft(BigInt(0))((a, q) => a + BigInt(q) * q).toDouble
      val s3 = qs.foldLeft(BigInt(0))((a, q) =>
        a + BigInt(q) * q * q).toDouble
      val s4 = qs.foldLeft(BigInt(0))((a, q) =>
        a + BigInt(q) * q * BigInt(q) * q).toDouble
      val nD = n.toDouble
      val mu = s1 / nD
      val m2 = s2 / nD - mu * mu
      val m3 = s3 / nD - 3.0 * mu * (s2 / nD) + 2.0 * mu * mu * mu
      val m4 = s4 / nD - 4.0 * mu * (s3 / nD) +
        6.0 * mu * mu * (s2 / nD) - 3.0 * mu * mu * mu * mu
      (g, n, q6(mu / 10000.0), q6(m3 / (m2 * math.sqrt(m2))),
        q6(m4 / (m2 * m2) - 3.0))
    }
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case (gr, wr) =>
      assert(gr._2 == wr._2)
      Seq((gr._3, wr._3, "mean"), (gr._4, wr._4, "skew"),
        (gr._5, wr._5, "kurt")).foreach { case (a, b, lbl) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b),
          s"group ${gr._1} $lbl: engine $a vs exact replay $b")
      }
    }
    // sanity: the sums really crossed the boundary
    val s4Min = rows.groupBy(_._1).values.map(vs =>
      vs.map { r =>
        val q = BigInt(math.floor(r._2 * 10000.0 + 0.5).toLong)
        q * q * q * q
      }.sum).min
    assert(s4Min > BigInt(2).pow(53) * 1000000,
      "fixture must push power sums far past 2^53")
  }

  test("the envelope guard fails loudly outside |value| <= 1e3") {
    val bad = Seq(("g", 500.0), ("g", 2000.5)).toDF("g", "v")
    val e = intercept[Exception] {
      graft.queries.Aggregates.momentsOf(bad, "g", "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exactness envelope exceeded")),
      s"expected the envelope raise_error, got: $e")
  }
}
