package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Pins [[graft.operators.PageRank]] to an in-memory integer
  * reimplementation of the same recursion (identical DIV/sum
  * arithmetic), plus the structural invariants: dangling leak bound,
  * determinism, edge hygiene, and plan shape (no cartesian). */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  /** The identical integer recursion, sequentially. */
  private def reference(edges: Seq[(Long, Long)], iterations: Int,
      scale: Long = 1000000L, num: Long = 85L,
      den: Long = 100L): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = ((den - num) * scale) / den
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iterations) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(p => r(p._1) / outdeg(p._1)).sum
      }
      r = nodes.map(n => n -> (base + (num * in.getOrElse(n, 0L)) / den)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("s", "d"), "s", "d", iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph: equals the sequential integer recursion exactly") {
    // 1 -> 2,3; 2 -> 3; 3 -> 1; 4 -> 3 (4 is a source; 3 is central)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    for (k <- Seq(1, 3, 5)) {
      assert(run(edges, k) == reference(edges, k), s"iterations=$k")
    }
  }

  test("random graph: equals the sequential recursion, every node present") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val got = run(edges, 4)
    val want = reference(edges, 4)
    assert(got == want)
    val nodes = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(got.keySet == nodes)
  }

  test("dangling nodes leak mass; total never exceeds n*scale") {
    // 1 -> 2, 2 has no out-edges: 2's damped mass leaks each round
    val edges = Seq((1L, 2L))
    val r = run(edges, 3)
    val total = r.values.sum
    assert(total <= 2L * 1000000L)
    assert(r(2L) > r(1L)) // 2 receives, 1 only holds the base
    assert(run(edges, 3) == reference(edges, 3))
  }

  test("duplicate edges and self-loops do not change the result") {
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = clean ++ clean ++ Seq((1L, 1L), (2L, 2L))
    assert(run(clean, 3) == run(noisy, 3))
  }

  test("star hub outranks leaves and the recursion is deterministic") {
    val edges = (2L to 30L).flatMap(i => Seq((i, 1L), (1L, i)))
    val a = run(edges, 3)
    val b = run(edges, 3)
    assert(a == b)
    assert(a(1L) > a(2L) * 5, "hub must dominate leaf rank")
  }

  test("plan: no cartesian product, no nested loop join") {
    val df = PageRank.ranks(
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d", 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  /** Sequential twin of ranksSeeded (weighted + seed teleport). */
  private def referenceSeeded(edges: Seq[(Long, Long, Long)],
      seeds: Long => Boolean, iterations: Int, scale: Long = 1000000L,
      num: Long = 85L, den: Long = 100L): Map[Long, Long] = {
    val e = edges.filter(t => t._1 != t._2 && t._3 > 0)
      .groupBy(t => (t._1, t._2))
      .map { case ((s, d), ts) => (s, d, ts.map(_._3).sum) }.toSeq
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val strength = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val nSeeds = nodes.count(seeds)
    val seedBase = (((den - num) * scale * nodes.size) / den) / nSeeds
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iterations) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(t => (r(t._1) * t._3) / strength(t._1)).sum
      }
      r = nodes.map(n => n ->
        ((if (seeds(n)) seedBase else 0L) +
          (num * in.getOrElse(n, 0L)) / den)).toMap
    }
    r
  }

  test("seeded+weighted rank equals the sequential recursion") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong, (rnd.nextInt(5) + 1).toLong))
    val got = PageRank.ranksSeeded(edges.toDF("s", "d", "w"),
        "s", "d", "w", n => n % 7 === 0, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referenceSeeded(edges, _ % 7 == 0, 3))
  }

  test("trust is local: the seed's neighbor outranks the far end of a path") {
    // 0(seed) - 1 - 2 - 3 - 4: rank must decay with distance from trust
    val edges = (0L to 3L).flatMap(i => Seq((i, i + 1, 1L), (i + 1, i, 1L)))
    val r = PageRank.ranksSeeded(edges.toDF("s", "d", "w"),
        "s", "d", "w", n => n === 0, 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L))
  }

  test("heavier edges pull more rank at equal topology") {
    // both 1 and 2 feed 0's mass; the heavy edge wins
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
    val r = PageRank.ranksSeeded(edges.toDF("s", "d", "w"),
        "s", "d", "w", n => n === 0, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L))
  }

  test("empty seed set fails fast") {
    intercept[IllegalArgumentException](
      PageRank.ranksSeeded(Seq((1L, 2L, 1L)).toDF("s", "d", "w"),
        "s", "d", "w", _ => org.apache.spark.sql.functions.lit(false), 1))
  }

  test("bad parameters fail fast") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException](PageRank.ranks(e, "s", "d", 0))
    intercept[IllegalArgumentException](PageRank.ranks(e, "s", "d", 1, scale = 0L))
    intercept[IllegalArgumentException](
      PageRank.ranks(e, "s", "d", 1, dampNum = 101L, dampDen = 100L))
  }

  test("celebrity in-degree hub: no task's shuffle input scales with hub degree") {
    // The 100x-scale skew proof for the graph family: co-purchase
    // degrees are data-bounded, but an arbitrary link graph has
    // celebrity nodes. Plant one dst with in-degree n-1 (~1000x the
    // cold median of ~1) and measure per-task shuffle-read records
    // across the whole job with a listener. The mechanism under test
    // is the map-side partial sum of the contrib aggregation: each map
    // task emits AT MOST ONE combined row per distinct dst, so the hub
    // key reaches its reducer as <= #map-partitions rows, never
    // deg(hub) rows. Without the combine, the hub's reduce task would
    // read ~|E_hub| + its cold share (~2.5x every other task); with
    // it, every task's input stays within a small factor of the
    // balanced share |E|/P.
    val n = 8000
    val rnd = new scala.util.Random(97)
    val cold = (0 until n).map(i =>
      (i.toLong, rnd.nextInt(n).toLong)) // ~1 out-edge per node
    val hub = (1 until n).map(i => (i.toLong, 0L)) // all point at 0
    val edges = cold ++ hub
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) recs.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      // AQE's partition coalescing merges this KB-scale shuffle into
      // ONE task (advisory 64 MB), which would read as "skew" to the
      // per-task meter — disable it so task counts reflect the keyed
      // partitioning the 100 TB plan would actually run with
      var r: Map[Long, Long] = Map.empty
      withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
        r = PageRank.ranks(edges.toDF("s", "d"), "s", "d", 2)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      }
      // drain straggler listener events (local mode: fast)
      var (stable, last) = (0, -1)
      while (stable < 3 && last < 10000) {
        Thread.sleep(100)
        if (recs.size == last) stable += 1 else { stable = 0; last = recs.size }
      }
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(got == reference(edges, 2), "hub graph must stay exact")
    assert(got(0L) > got(1L) * 100, "the hub must dominate")
    import scala.jdk.CollectionConverters._
    val maxTask = recs.asScala.map(_.toLong).max
    val share = edges.size / 4 // |E| / shuffle partitions
    assert(maxTask <= share * 3 / 2,
      s"a task read $maxTask shuffle records (balanced share ~$share, " +
        s"hub degree ${n - 1}) — hub skew is concentrating input")
    // and the mechanism is visible in the plan: the contrib sum is
    // partially aggregated map-side before its exchange
    val plan = PageRank.ranks(edges.toDF("s", "d"), "s", "d", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      s"contrib aggregation must map-side combine:\n${plan.take(1500)}")
  }

  test("reliable checkpointDir mode is bitwise-equal and writes the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
    try {
      val rnd = new scala.util.Random(13)
      val edges = Seq.fill(300)(
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      // integer-exact contract ⇒ the reliable-checkpoint run must be
      // BITWISE equal to the localCheckpoint run, not merely close
      val reliable = PageRank.ranks(edges.toDF("s", "d"), "s", "d", 3,
          checkpointDir = Some(dir.toString))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == run(edges, 3))
      assert(java.nio.file.Files.walk(dir).count() > 1,
        s"no checkpoint files written under $dir")

      val wedges = edges.map { case (s, d) => (s, d, 1L + (s + d) % 3) }
      def seeded(ck: Option[String]) =
        PageRank.ranksSeeded(wedges.toDF("s", "d", "w"), "s", "d", "w",
            n => n % 5 === 0, 3, checkpointDir = ck)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(seeded(Some(dir.toString)) == seeded(None))

      // prepared-graph reuse (the Graph.scala per-dir cache pattern):
      // one prepare() consumed by REPEATED rankings returns the same
      // labeling every time, and equals the monolithic entry point
      val (pe, pn) = PageRank.prepare(edges.toDF("s", "d"), "s", "d")
      val viaPrepared = (1 to 2).map(_ =>
        PageRank.ranksPrepared(pe, pn, 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(viaPrepared.forall(_ == run(edges, 3)))
      val (se, sn) = PageRank.prepareSeeded(
        wedges.toDF("s", "d", "w"), "s", "d", "w", n => n % 5 === 0)
      val seededPrepared = (1 to 2).map(_ =>
        PageRank.ranksSeededPrepared(se, sn, 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(seededPrepared.forall(_ == seeded(None)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
