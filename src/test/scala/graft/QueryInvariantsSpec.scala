package graft

import org.apache.spark.sql.functions._

/** Independent-recompute parity and structural invariants for the
  * newest oracle rows whose COVERAGE entries carried no spec evidence
  * — each test re-derives the answer a different way (driver-side
  * brute force over the sf0.001 fixture) or asserts a property the
  * algorithm must satisfy by construction. */
class QueryInvariantsSpec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("vocab_growth: cumulative vocab partitions the corpus vocabulary") {
    val rows = q("vocab_growth")
      .select($"source", $"n_distinct", $"n_new", $"cum_vocab")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val totalVocab = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
      .distinct().count()
    assert(rows.map(_._3).sum == totalVocab,
      "every vocabulary item is NEW for exactly one (min) source")
    assert(rows.last._4 == totalVocab, "final cumulative = corpus vocab")
    rows.foreach { case (src, nd, nn, _) =>
      assert(nn <= nd, s"$src: new terms cannot exceed distinct terms")
    }
    // cum_vocab is the running sum of n_new in source order
    val cums = rows.scanLeft(0L)(_ + _._3).tail
    assert(rows.map(_._4).toSeq == cums.toSeq)
  }

  test("zipf_fit: slope matches a driver-side OLS over the same spectrum") {
    val got = q("zipf_fit")
      .select($"source", $"n_points", $"slope_q6")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val spectrum = Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("cnt"))
      .groupBy($"source", $"cnt").agg(count(lit(1)).as("n_toks"))
      .as[(String, Long, Long)].collect()
    val bySource = spectrum.groupBy(_._1)
    got.foreach { case (src, nPts, slope) =>
      val pts = bySource(src).map { case (_, cnt, nt) =>
        (math.floor(math.log(cnt.toDouble) * 1e6 + 0.5),
          math.floor(math.log(nt.toDouble) * 1e6 + 0.5))
      }
      assert(pts.length.toLong == nPts)
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val brute = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(brute - slope) < 1e-5, s"$src: $brute vs $slope")
    }
    // no sign assertion: the sf0.001 per-source spectra are degenerate
    // (25 docs from a small word pool — slope sign is arbitrary there);
    // the parity above and the sf0.01 oracle are the evidence
    assert(got.nonEmpty)
  }

  test("phrase_search: equals a driver-side adjacent-token scan") {
    val got = q("phrase_search").as[(Long, Long)].collect().toMap
    val brute = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val ws = text.split(" ", -1)
        id -> (0 until math.max(ws.length - 1, 0))
          .count(i => ws(i) == "table" && ws(i + 1) == "hash").toLong
      }.filter(_._2 > 0).toMap
    assert(got == brute)
    assert(got.nonEmpty, "fixture must contain the phrase")
  }

  test("mixture_apportion: exact-K Hare-quota properties hold") {
    val rows = q("mixture_apportion")
      .select($"source", $"n_docs", $"alloc")
      .as[(String, Long, Long)].collect()
    val k = 300L
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).sum == k, "allocations must sum exactly to K")
    rows.foreach { case (src, n, alloc) =>
      val base = k * n / total
      assert(alloc == base || alloc == base + 1,
        s"$src: Hare quota gives floor or floor+1, got $alloc vs $base")
    }
  }

  test("k_anonymity: equals a driver-side QI-group recount") {
    val got = q("k_anonymity")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val sizes = Tables.customer(spark, sf)
      .groupBy($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / lit(1000.0)).cast("long"))
      .agg(count(lit(1)).as("gsize"))
      .select($"gsize").as[Long].collect()
    got.foreach { case (k, nGroups, nViolating, atRisk) =>
      assert(nGroups == sizes.length.toLong)
      assert(nViolating == sizes.count(_ < k).toLong, s"k=$k")
      assert(atRisk == sizes.filter(_ < k).sum, s"k=$k")
    }
    assert(got.map(_._1).toSeq == Seq(2L, 5L, 10L))
  }

  test("agg_moments: power-sum skew/kurtosis ≈ Spark's builtin folds") {
    // the builtins are order-dependent double folds (why they can't
    // be the oracle); they still agree with the exact-integer lane to
    // well past the quantization grid
    val got = q("agg_moments")
      .select($"event_type", $"skew_q6", $"kurt_q6")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ref = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(skewness($"value").as("s"), kurtosis($"value").as("k"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (g, (sk, ku)) =>
      val (rs, rk) = ref(g)
      assert(math.abs(sk - rs) < 1e-2, s"$g skew $sk vs $rs")
      assert(math.abs(ku - rk) < 1e-2, s"$g kurt $ku vs $rk")
    }
  }

  test("touch_attribution: credit conserves each attributed purchase " +
      "exactly; U-shape holds") {
    val out = q("touch_attribution")
      .select($"event_type", $"touch_position", $"n_touches",
        floor($"credit" * 10000.0 + 0.5).cast("long").as("cm"))
      .as[(String, String, Long, Long)].collect()
    // driver-side replay: total credited micro == the micro value of
    // every purchase that HAS at least one 7-day-lookback touch
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .as[(Long, Long, java.sql.Timestamp, String, Double)].collect()
    val sevenDaysMs = 7L * 24 * 3600 * 1000
    val byUser = rows.groupBy(_._1)
    var attributed = 0L
    byUser.values.foreach { es =>
      es.filter(_._4 == "purchase").foreach { p =>
        val touches = es.filter(e => e._4 != "purchase" &&
          e._3.getTime < p._3.getTime &&
          e._3.getTime >= p._3.getTime - sevenDaysMs)
        if (touches.nonEmpty)
          attributed += math.floor(p._5 * 10000.0 + 0.5).toLong
      }
    }
    assert(out.map(_._4).sum == attributed,
      "total credited micro-units must equal the attributed purchases")
    // structure: all four positions appear; solo+first+last+middle
    // touch counts are positive at fixture scale
    val positions = out.map(_._2).toSet
    assert(positions == Set("solo", "first", "last", "middle"),
      s"positions: $positions")
  }

  test("penny_allocation: every order's cents are conserved exactly") {
    val sums = q("penny_allocation")
      .groupBy($"l_orderkey")
      .agg(sum($"alloc_cents").as("s"))
    val tgt = Tables.orders(spark, sf)
      .select($"o_orderkey",
        floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long").as("t"))
    // only orders that HAVE lineitems get allocations
    val joined = sums.join(tgt, $"l_orderkey" === $"o_orderkey")
      .select($"s", $"t").as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (s, t) =>
      assert(s == t, "no lost or invented pennies")
    }
  }

  test("mad_outliers: flags equal a driver-side robust recount") {
    val got = q("mad_outliers")
      .select($"event_type", $"n_rows", $"med", $"mad", $"n_outliers")
      .as[(String, Long, Double, Double, Long)].collect()
    val vals = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    def lowerMedian(xs: Array[Double]): Double = xs(((xs.length + 1) / 2) - 1)
    got.foreach { case (g, n, med, mad, nOut) =>
      val vs = vals(g)
      assert(n == vs.length.toLong)
      assert(med == lowerMedian(vs), s"$g median")
      val devs = vs.map(v => math.abs(v - med)).sorted
      assert(mad == lowerMedian(devs), s"$g mad")
      assert(nOut == vs.count(v => math.abs(v - med) > 3.0 * mad).toLong)
      assert(nOut > 0, s"$g: the heavy tail must flag something")
    }
  }
}
