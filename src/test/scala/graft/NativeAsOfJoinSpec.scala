package graft

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._

/** The custom Catalyst as-of operator (AsOfJoinPlan → AsOfJoinExec)
  * must agree with the union–window spelling, honor the
  * None-before-first contract of the reference floor search
  * (/root/reference/src/algo/search.rs:66-68), plan as a streaming
  * merge, and keep probe-side predicate pushdown working. */
class NativeAsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def probeBuild() = {
    val probe = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val build = Tables.orders(spark, sf)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("prev_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("prev_totalprice"))
      .select($"o_custkey".as("b_custkey"),
        $"o_orderdate".as("prev_orderdate"),
        $"prev_orderkey", $"prev_totalprice")
    (probe, build)
  }

  test("native as-of equals the union-window spelling on the fixture") {
    val (probe, build) = probeBuild()
    val native = AsOfJoin.asofNative(probe, build,
      probe("o_custkey"), build("b_custkey"),
      probe("o_orderdate"), build("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    val (probe2, build2) = probeBuild()
    val window = AsOfJoin.asof(probe2, build2,
      probe2("o_custkey"), build2("b_custkey"),
      probe2("o_orderdate"), build2("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    assert(native.count() == window.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("probe before first build row gets an all-null payload") {
    val probe = Seq((1L, 5), (1L, 15), (2L, 100)).toDF("k", "ts")
    val build = Seq((1L, 10, "a"), (1L, 12, "b"), (3L, 1, "z"))
      .toDF("bk", "bts", "v")
    val out = AsOfJoin.asofNative(probe, build,
        probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"))
      .orderBy($"k", $"ts").collect()
    assert(out(0).isNullAt(2), "ts=5 precedes every build row -> null")
    assert(out(1).getString(2) == "b", "ts=15 takes the latest (ts=12)")
    assert(out(2).isNullAt(2), "key 2 has no build rows at all -> null")
  }

  test("plans as AsOfJoinExec merge over clustered+sorted children") {
    val (probe, build) = probeBuild()
    val native = AsOfJoin.asofMerge(probe, build,
      probe("o_custkey"), build("b_custkey"),
      probe("o_orderdate"), build("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    // AQE wraps the plan (AdaptiveSparkPlanExec hides children from
    // collect/exists), so inspect the rendered plan.
    val exec = native.queryExecution.executedPlan.toString
    assert(exec.contains("AsOfJoin ["), s"expected AsOfJoinExec in:\n$exec")
    // merge contract: one exchange per side for the as-of keys plus
    // the build-side aggregation's own exchange — nothing else
    assert("Exchange hashpartitioning".r.findAllIn(exec).size == 3)
    assert(exec.contains("Sort [o_custkey"), "probe sorted by (key, time)")
  }

  test("auto build side is stats-based like JoinSelection") {
    val (probe, build) = probeBuild()
    def planOf(threshold: String): String = {
      var plan = ""
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> threshold) {
        plan = AsOfJoin.asofNative(probe, build,
          probe("o_custkey"), build("b_custkey"),
          probe("o_orderdate"), build("prev_orderdate"),
          Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
          .queryExecution.executedPlan.toString
      }
      plan
    }
    // small build under the default 10MB threshold → broadcast exec
    val small = planOf("10485760")
    assert(small.contains("BroadcastAsOfJoin"),
      s"small build must auto-broadcast:\n$small")
    // stats over a 1-byte threshold (≡ a too-large build) → merge exec
    val large = planOf("1")
    assert(large.contains("AsOfJoin [") && !large.contains("BroadcastAsOfJoin"),
      s"large build must auto-merge:\n$large")
    // disabled threshold (-1) also falls back to the merge exec
    val off = planOf("-1")
    assert(!off.contains("BroadcastAsOfJoin"),
      "threshold -1 must disable auto-broadcast")
  }

  test("forward as-of: strict successor contract and after-last nulls") {
    val probe = Seq((1L, 10), (1L, 11), (1L, 100), (2L, 5)).toDF("k", "ts")
    val build = Seq((1L, 10, "a"), (1L, 12, "b"), (3L, 1, "z"))
      .toDF("bk", "bts", "v")
    val out = AsOfJoin.asofForward(probe, build,
        probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"))
      .orderBy($"k", $"ts").collect()
    // ts=10: the SAME-instant build row must not match (strict) — the
    // next one does; ts=11 -> b; ts=100 after last -> null; key 2 -> null
    assert(out(0).getString(2) == "b", "strictly-after skips the ts=10 row")
    assert(out(1).getString(2) == "b")
    assert(out(2).isNullAt(2), "probe after last build row -> null")
    assert(out(3).isNullAt(2), "keyless probe -> null")
    // inclusive variant takes the same-instant row
    val incl = AsOfJoin.asofForward(probe, build,
        probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"),
        strict = false)
      .orderBy($"k", $"ts").collect()
    assert(incl(0).getString(2) == "a", "at-or-after takes the ts=10 row")
  }

  test("forward as-of equals the window successor spelling on the fixture") {
    val probe = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val build = Tables.orders(spark, sf)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(min($"o_orderkey").as("next_orderkey"))
      .select($"o_custkey".as("b_custkey"),
        $"o_orderdate".as("next_orderdate"), $"next_orderkey")
    val fwd = AsOfJoin.asofForward(probe, build,
        probe("o_custkey"), build("b_custkey"),
        probe("o_orderdate"), build("next_orderdate"), Seq("next_orderkey"))
      .select($"o_orderkey", $"next_orderkey")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    // independent spelling: per-probe min over the strictly-later builds
    val want = probe.join(build,
        probe("o_custkey") === build("b_custkey") &&
          build("next_orderdate") > probe("o_orderdate"), "left")
      .groupBy($"o_orderkey")
      .agg(min_by($"next_orderkey", $"next_orderdate").as("nk"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(fwd == want)
    assert(fwd.valuesIterator.exists(_ != null) &&
      fwd.valuesIterator.exists(_ == null),
      "fixture must exercise both match and after-last cases")
  }

  test("the asof_join_auto query entry broadcasts at the oracle sf") {
    // the CORRECTNESS row drives the Auto stats path; this pins that at
    // test scale the decision lands on the broadcast exec (so the
    // driver run exercises size-estimate → broadcast, not a
    // degenerate always-merge)
    val df = SparkEntry.queries("asof_join_auto")(spark, sf)
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastAsOfJoin"),
      s"Auto must pick broadcast for the small build side:\n${exec.take(2000)}")
    assert(df.count() > 0)
  }

  test("probe-only filters push through the custom node to the scan") {
    val (probe, build) = probeBuild()
    val joined = AsOfJoin.asofNative(probe, build,
      probe("o_custkey"), build("b_custkey"),
      probe("o_orderdate"), build("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    val filtered = joined.filter($"o_orderkey" === 42L)
    val optimized = filtered.queryExecution.optimizedPlan
    // After PushFilterThroughAsOfJoin, no Filter sits directly on the
    // custom node; the conjunct lands below it (and then reaches the
    // scan as a pushed data filter).
    val topIsAsOf = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[AsOfJoinPlan] => f
    }
    assert(topIsAsOf.isEmpty, s"filter not pushed:\n$optimized")
    // (plan strings truncate PushedFilters, so match the Filter node
    // that feeds the probe-side scan instead)
    val exec = filtered.queryExecution.executedPlan.toString
    assert("""o_orderkey#\d+L = 42""".r.findFirstIn(exec).isDefined,
      s"pushed predicate should reach the probe scan:\n$exec")
  }

  test("broadcast as-of equals the merge spelling; no shuffle planned") {
    val (probe, build) = probeBuild()
    val bcast = AsOfJoin.asofBroadcast(probe, build,
      probe("o_custkey"), build("b_custkey"),
      probe("o_orderdate"), build("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    val (probe2, build2) = probeBuild()
    val merge = AsOfJoin.asofMerge(probe2, build2,
      probe2("o_custkey"), build2("b_custkey"),
      probe2("o_orderdate"), build2("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    assert(bcast.exceptAll(merge).isEmpty && merge.exceptAll(bcast).isEmpty)
    val exec = bcast.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastAsOfJoin"), s"wrong exec:\n$exec")
    // zero-shuffle contract for the JOIN: the probe branch (the `:-`
    // subtree lines under BroadcastAsOfJoin) must contain no exchange;
    // the build side moves via broadcast only. (The build's own
    // pre-aggregation may shuffle below the BroadcastExchange — that
    // is the aggregation's exchange, not the join's.)
    val probeBranch = exec.linesIterator
      .filter(l => l.contains(":- ") || l.contains(":  "))
      .mkString("\n")
    assert(!probeBranch.contains("Exchange"),
      s"broadcast as-of must not move the probe side:\n$exec")
    assert(exec.contains("BroadcastExchange"), "build must broadcast")
  }

  test("broadcast as-of honors the None-before-first contract") {
    val probe = Seq((1L, 5), (1L, 15), (2L, 100)).toDF("k", "ts")
    val build = Seq((1L, 10, "a"), (1L, 12, "b"), (3L, 1, "z"))
      .toDF("bk", "bts", "v")
    val out = AsOfJoin.asofBroadcast(probe, build,
        probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"))
      .orderBy($"k", $"ts").collect()
    assert(out(0).isNullAt(2) && out(1).getString(2) == "b" &&
      out(2).isNullAt(2))
  }

  test("narrow select above the custom node prunes probe scan columns") {
    // Probe deliberately keeps ALL order columns; after selecting just
    // two outputs, PruneColumnsThroughAsOfJoin must shrink the probe
    // read to key/time/selected — unreferenced wide columns (o_clerk,
    // o_shippriority, o_comment) never reach any scan.
    val probe = Tables.orders(spark, sf)
    val build = Tables.orders(spark, sf)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("prev_orderkey"))
      .select($"o_custkey".as("b_custkey"),
        $"o_orderdate".as("prev_orderdate"), $"prev_orderkey")
    val narrow = AsOfJoin.asofNative(probe, build,
        probe("o_custkey"), build("b_custkey"),
        probe("o_orderdate"), build("prev_orderdate"), Seq("prev_orderkey"))
      .select($"o_orderkey", $"prev_orderkey")
    assert(narrow.count() > 0)
    val exec = narrow.queryExecution.executedPlan.toString
    Seq("o_clerk", "o_shippriority", "o_comment").foreach { c =>
      assert(!exec.contains(c), s"unpruned column $c in:\n${exec.take(2000)}")
    }
  }

  test("salted as-of matches the merge exec and spreads a hot probe key") {
    // every probe shares ONE key — the shape AQE cannot split for a
    // custom exec; salting must give identical results while the plan
    // partitions on (key, salt)
    val probe = spark.range(0, 5000).select(lit(1L).as("k"),
      ($"id" % 997).cast("int").as("ts"), $"id".as("pv"))
    val build = Seq((1L, 10, "a"), (1L, 500, "b"), (2L, 3, "z"))
      .toDF("bk", "bts", "v")
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"ts", $"pv", $"v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3))).sortBy(t => (t._3, t._2))
    val salted = AsOfJoin.asofSalted(probe, build,
      probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"),
      saltBuckets = 8)
    val probe2 = spark.range(0, 5000).select(lit(1L).as("k"),
      ($"id" % 997).cast("int").as("ts"), $"id".as("pv"))
    val merge = AsOfJoin.asofMerge(probe2, build,
      probe2("k"), build("bk"), probe2("ts"), build("bts"), Seq("v"))
    assert(sortedRows(salted).toSeq == sortedRows(merge).toSeq)
    // before-first and no-key probes stay null-extended through salting
    assert(sortedRows(salted).count(_._4 == null) ==
      sortedRows(merge).count(_._4 == null))
    val exec = salted.queryExecution.executedPlan.toString
    assert(exec.contains("__asof_salt"),
      s"salt must reach the exchange keys:\n${exec.take(2000)}")
  }

  test("saltOn spreads a snapshot-stamped hot key that ts-salting can't") {
    // every probe shares ONE key AND one timestamp (a snapshot-stamped
    // batch — exactly the shape that produces a hot key): the default
    // ts-derived salt is constant there, so the caller salts on the
    // probe id instead. Results must still match the merge exec, and
    // the id salt must actually fan out over >1 bucket.
    val probe = spark.range(0, 2000).select(lit(1L).as("k"),
      lit(100).as("ts"), $"id".as("pv"))
    val build = Seq((1L, 10, "a"), (1L, 500, "b")).toDF("bk", "bts", "v")
    val salted = AsOfJoin.asofSalted(probe, build,
      probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"),
      saltBuckets = 8, saltOn = Seq(probe("pv")))
    val got = salted.select($"pv", $"v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000 && got.values.forall(_ == "a"),
      "every probe floors to the ts=10 build row")
    // the salt expression itself fans out (ts-only salting would not)
    import graft.functions.{GraftFunctions => F}
    val buckets = probe.select(
        pmod(F.fnv1a($"pv"), lit(8L)).cast("int").as("s"))
      .distinct().count()
    val tsBuckets = probe.select(
        pmod(F.fnv1a($"ts"), lit(8L)).cast("int").as("s"))
      .distinct().count()
    assert(buckets == 8, s"id salt must use all buckets, got $buckets")
    assert(tsBuckets == 1, "constant ts collapses the default salt " +
      "(the documented precondition this test pins)")
  }

  test("key/time type mismatch fails loudly at construction") {
    val probe = Seq((1, 5)).toDF("k", "ts") // int key
    val build = Seq((1L, 10, "a")).toDF("bk", "bts", "v") // long key
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofNative(probe, build,
        probe("k"), build("bk"), probe("ts"), build("bts"), Seq("v"))
    }
    assert(e.getMessage.contains("key type mismatch"))
  }

  test("graft_asof SQL table function plans the custom operator") {
    AsOfJoin.registerSqlTableFunction(spark)
    val (probe, build) = probeBuild()
    probe.createOrReplaceTempView("tvf_probe")
    build.createOrReplaceTempView("tvf_build")
    def sqlAsOf(extra: String) = spark.sql(
      s"""SELECT * FROM graft_asof(
         |  'tvf_probe', 'tvf_build',
         |  'o_custkey', 'b_custkey', 'o_orderdate', 'prev_orderdate',
         |  'prev_orderkey,prev_orderdate,prev_totalprice'$extra)""".stripMargin)
    val viaSql = sqlAsOf("").orderBy($"o_orderkey").collect()
    val viaSqlBroadcast = sqlAsOf(", 'broadcast'").orderBy($"o_orderkey").collect()
    val viaApi = AsOfJoin.asofNative(probe, build,
      probe("o_custkey"), build("b_custkey"),
      probe("o_orderdate"), build("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
      .orderBy($"o_orderkey").collect()
    assert(viaSql.nonEmpty)
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSqlBroadcast.toSeq == viaApi.toSeq)
    // the merge exec (not a rewrite) is what the SQL text planned
    assert(sqlAsOf("").queryExecution.executedPlan.toString
      .contains("AsOfJoin"))
    // non-literal / wrong-arity arguments fail loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('tvf_probe')").collect()
    }
  }

  test("dataset round-trip keeps working after the custom plan (smoke)") {
    val (probe, build) = probeBuild()
    val native = AsOfJoin.asofNative(probe, build,
      probe("o_custkey"), build("b_custkey"),
      probe("o_orderdate"), build("prev_orderdate"),
      Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
    // downstream relational ops over the custom node's output
    val agg = native.groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    assert(agg.count() > 0)
    assert(native.isInstanceOf[ClassicDataset[_]])
  }

  test("bucketed inputs: as-of merge plans with NO Exchange and NO Sort") {
    // the checked form of AsOfJoinExec's "none if the input is already
    // clustered" scaladoc claim — both sides written bucketed on the
    // key (sorted (key, time) within buckets), the exec's
    // ClusteredDistribution is satisfied by the scan's
    // HashPartitioning and its ordering by the sorted single-file
    // buckets, so the recurring as-of moves NOTHING at read time
    val (probe, build) = probeBuild()
    graft.operators.Bucketing.writeBucketed(
      probe, "asof_spec_probe", 8, Seq("o_custkey"), Seq("o_orderdate"))
    graft.operators.Bucketing.writeBucketed(
      build, "asof_spec_build", 8, Seq("b_custkey"), Seq("prev_orderdate"))
    try withSQLConf(
        graft.operators.Bucketing.SortedScanConf -> "true") {
      val pt = spark.table("asof_spec_probe")
      val bt = spark.table("asof_spec_build")
      val joined = AsOfJoin.asofMerge(pt, bt,
        pt("o_custkey"), bt("b_custkey"),
        pt("o_orderdate"), bt("prev_orderdate"),
        Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
      val exec = joined.queryExecution.executedPlan.toString
      assert(exec.contains("AsOfJoin"), s"wrong exec:\n${exec.take(1200)}")
      assert(!exec.contains("Exchange"),
        s"bucketed as-of still shuffles:\n${exec.take(1500)}")
      assert(!"(?m)^\\s*[+:]- Sort ".r.findFirstIn(exec).isDefined,
        s"bucketed as-of still sorts:\n${exec.take(1500)}")
      // and the zero-movement plan returns the same rows as the
      // shuffled merge over the unbucketed frames
      val (probe2, build2) = probeBuild()
      val merge = AsOfJoin.asofMerge(probe2, build2,
        probe2("o_custkey"), build2("b_custkey"),
        probe2("o_orderdate"), build2("prev_orderdate"),
        Seq("prev_orderkey", "prev_orderdate", "prev_totalprice"))
      assert(joined.exceptAll(merge).isEmpty &&
        merge.exceptAll(joined).isEmpty)
    } finally {
      graft.operators.Bucketing.drop(spark, "asof_spec_probe")
      graft.operators.Bucketing.drop(spark, "asof_spec_build")
    }
  }
}
