package graft

import graft.queries.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSuite {
  import spark.implicits._

  test("agg_approx HLL estimate lands within 3x the configured rsd") {
    val rows = Aggregates.approxQueries("agg_approx")(spark, sf)
      .select($"o_orderpriority", $"approx_custs", $"exact_custs",
        $"within_bound").collect()
    val exact = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority").agg(countDistinct($"o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val (k, approx, ex) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ex == exact(k), s"$k: emitted exact $ex vs recomputed ${exact(k)}")
      val err = math.abs(approx.toDouble - ex) / ex
      assert(err <= 0.06, s"$k: approx $approx vs exact $ex (err $err)")
      assert(r.getBoolean(3), s"$k: within_bound flag disagrees with bound")
    }
  }

  test("kmv_overlap: full-sketch pairs are EXACT; all pairs in bound") {
    val rows = Aggregates.approxQueries("kmv_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // per-source distinct-GRAM counts decide full-sketch mode (k=256)
    val nd = Tables.documents(spark, sf)
      .select($"source",
        explode(graft.functions.GraftFunctions.shingle_hash_set($"text"))
          .as("t")).distinct()
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (a, b, exact, estMicro, bound) =>
      assert(bound === 1L, s"($a,$b) estimate outside the documented band")
      if (nd(a) <= 256 && nd(b) <= 256) {
        // θ = unsigned max ⇒ the sketches ARE the sets: estimate exact
        assert(estMicro === exact * 1000000L,
          s"($a,$b) full-sketch mode must be exact: $estMicro vs $exact")
      }
    }
  }

  test("kmv_overlap estimator mode (sf0.01, nd > k): bound holds for real") {
    // at sf0.001 every sketch is full (exact mode); sf0.01 vocabularies
    // (~700 distinct/source) exceed k=256, so this exercises the
    // actual θ-estimator and its error band
    val big = "/root/testdata/sf0.01"
    val rows = Aggregates.approxQueries("kmv_overlap")(spark, big)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val estMode = rows.count { case (_, _, exact, estMicro, _) =>
      estMicro % 1000000L != 0L || estMicro != exact * 1000000L
    }
    assert(estMode > 0, "expected at least one pair in estimator mode")
    rows.foreach { case (a, b, exact, estMicro, bound) =>
      val est = estMicro.toDouble / 1e6
      assert(bound === 1L,
        s"($a,$b) est $est vs exact $exact outside the documented band")
    }
  }

  test("agg_stats stddev matches Spark's native stddev_samp to 1e-6 relative") {
    val derived = Aggregates.queries("agg_stats")(spark, sf)
      .select($"l_returnflag", $"std_qty").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(stddev_samp($"l_quantity").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    native.foreach { case (k, s) =>
      assert(math.abs(derived(k) - s) / s < 1e-6,
        s"$k: derived ${derived(k)} vs native $s")
    }
  }

  test("agg_collect falls back to SortAggregate when object-hash agg is off (G2)") {
    val conf = "spark.sql.execution.useObjectHashAggregateExec"
    val byLang = Aggregates.queries("agg_collect")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    try {
      spark.conf.set(conf, "false")
      val sorted = Aggregates.queries("agg_collect")(spark, sf)
      val plan = sorted.queryExecution.executedPlan.toString
      assert(plan.contains("SortAggregate"), s"expected SortAggregate in:\n$plan")
      val rows = sorted.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == byLang, "sort-agg fallback must produce identical results")
    } finally spark.conf.set(conf, "true")
  }

  test("agg_rollup level counts are consistent") {
    val rows = Aggregates.queries("agg_rollup")(spark, sf).collect()
    val total = rows.filter(_.getLong(2) == 3).map(_.getLong(3)).sum
    val leaf = rows.filter(_.getLong(2) == 0).map(_.getLong(3)).sum
    assert(total == leaf, "grand total must equal sum of leaves")
  }

  test("selectivity_bounds: the exact count sits inside the bucket bounds") {
    val rows = Aggregates.queries("selectivity_bounds")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, actual, lo, hi) =>
      assert(lo <= actual && actual <= hi,
        s"flag=$flag actual=$actual outside [$lo, $hi]")
      // bounds are informative: the gap is at most the straddling
      // buckets, never the whole group
      assert(hi - lo < hi.max(1L), s"flag=$flag degenerate bounds")
    }
  }

  test("agg_histogram_eqdepth: ~n/8 per bucket, ranges ordered, broadcast binning") {
    val df = Aggregates.queries("agg_histogram_eqdepth")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"cut-point binning must be a broadcast join, got:\n$plan")
    val rows = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (flag, bs) =>
      assert(bs.map(_._2).sorted.toSeq == (1 to 8), s"flag=$flag buckets")
      val n = bs.map(_._3).sum
      // equi-depth up to ties: every bucket within 20% of n/8
      bs.foreach { case (_, b, cnt, mn, mx) =>
        assert(mn <= mx)
        assert(math.abs(cnt - n / 8.0) <= 0.2 * n / 8.0 + 1,
          s"flag=$flag bucket=$b count=$cnt n=$n not equi-depth")
      }
      // bucket value ranges are disjoint and ordered
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._5 <= pair(1)._4, s"flag=$flag overlap")
      }
    }
  }

  test("exact_median_2pass equals the full-sort order statistic; " +
      "the rank window sees only the selected bucket") {
    import spark.implicits._
    val out = graft.queries.Aggregates.queries("exact_median_2pass")(spark, sf)
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // brute force: sort each group fully, take the same integer ranks
    val byFlag = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    byFlag.foreach { case (g, vs) =>
      val n = vs.length
      assert(got((g, "p50")) == vs((n + 1) / 2 - 1), s"$g p50")
      assert(got((g, "p90")) == vs((9 * n + 9) / 10 - 1), s"$g p90")
    }
    // the two-pass contract: the rank Window's input carries the
    // bucket-selection join (never the raw full-group scan)
    val p = out.queryExecution.optimizedPlan.toString
    val winAt = p.indexOf("Window")
    assert(winAt >= 0 && p.indexOf("Join", winAt) >= 0,
      s"rank window must sit above the bucket-prune join:\n${p.take(2000)}")
  }
}
