package graft

import graft.operators.KCore

/** Pins [[graft.operators.KCore]] to the sequential synchronous peel,
  * the fixture-convergence contract behind `part_kcore`'s fixed round
  * count, and plan hygiene. */
class KCoreSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential synchronous peel — the obvious single-threaded
    * recursion the distributed operator must equal. */
  private def reference(edges: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var sym = und ++ und.map(_.swap)
    for (_ <- 1 to rounds) {
      val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      sym = sym.filter(e => keep(e._1) && keep(e._2))
    }
    sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      .filter(_._2 >= k)
  }

  private def run(edges: Seq[(Long, Long)], k: Long, rounds: Int,
      dir: Option[String] = None): Map[Long, Long] =
    KCore.core(edges.toDF("x", "y"), "x", "y", k, rounds, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs equal the sequential synchronous peel") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3; rounds <- Seq(1, 3)) {
      val edges = Seq.fill(150)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(edges, 3L, rounds) == reference(edges, 3L, rounds),
        s"trial $trial rounds $rounds")
    }
  }

  test("clique survives, pendant chain peels away") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    // 5-clique (internal degree 4) + a chain hanging off it
    val edges = clique(1L to 5L) ++ Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val core = run(edges, 3L, 4)
    assert(core.keySet == (1L to 5L).toSet, "3-core = the clique only")
    assert(core.values.toSet == Set(4L), "in-core degree = 4 for all")
  }

  test("peel is monotone: an extra round past convergence is a no-op") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(120)(
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    // equal consecutive depths prove the fixpoint (peeling is
    // monotone: once stable, stable forever)
    val converged = run(edges, 3L, 8)
    assert(run(edges, 3L, 9) == converged)
    assert(reference(edges, 3L, 8) == converged)
  }

  test("part_kcore's fixed depth converges at BOTH the smoke and the " +
      "verify scale factors") {
    // sf0.001 = the suite fixture; sf0.01 = where the driver's oracle
    // gate actually runs — non-convergence there would leave engine
    // and oracle agreeing on a superset of the true 3-core, invisible
    // to the gate (both unroll the same rounds)
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select($"l_orderkey", $"l_partkey")
      val pairs = li.as("a").join(li.as("b"), Seq("l_orderkey"))
        .filter($"a.l_partkey" < $"b.l_partkey")
        .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("w"))
        .filter($"w" >= 2)
      def at(r: Int): Map[Long, Long] =
        KCore.core(pairs, "u", "v", 3L, r)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      // 10 = Graph.CoreRounds (measured peel depths: sf0.001 = 0,
      // sf0.01 = 8, sf0.1 = 2)
      assert(at(10) == at(11),
        s"one round past part_kcore's depth must be a no-op at $dir")
    }
  }

  test("reliable checkpointDir mode is bitwise-equal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kcore-ckpt")
    try {
      val rnd = new scala.util.Random(37)
      val edges = Seq.fill(150)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(edges, 3L, 3, Some(dir.toString)) == run(edges, 3L, 3))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("plan has no cartesian/NLJ; semi-joins restrict the edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val df = KCore.core(edges.toDF("x", "y"), "x", "y", 2L, 2)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftSemi"), "survivor restriction must be semi-join")
  }
}
