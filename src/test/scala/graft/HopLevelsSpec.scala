package graft

import graft.operators.HopLevels

/** Pins [[graft.operators.HopLevels]] to sequential BFS, the
  * horizon-cut contract, and plan hygiene. */
class HopLevelsSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential BFS from the seed set — exact hop distances. */
  private def reference(edges: Seq[(Long, Long)], seeds: Long => Boolean,
      rounds: Int): Map[Long, Int] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lv = adj.keys.filter(seeds).map(_ -> 0).toMap
    for (i <- 1 to rounds) {
      val next = lv.collect { case (n, l) if l == i - 1 => n }
        .flatMap(n => adj(n)).toSet
      lv = lv ++ next.filterNot(lv.contains).map(_ -> i)
    }
    lv
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int,
      dir: Option[String] = None): Map[Long, Int] =
    HopLevels.levels(edges.toDF("x", "y"), "x", "y",
        n => n % 5 === 0, rounds, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("random graphs equal sequential BFS") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 3; rounds <- Seq(1, 3)) {
      val edges = Seq.fill(120)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(edges, rounds) ==
        reference(edges, _ % 5 == 0, rounds),
        s"trial $trial rounds $rounds")
    }
  }

  test("path graph: exact levels, horizon cut, unreached absent") {
    // 0-1-2-3-4-5-6 path; seed = {0, 5}; 2 rounds
    val edges = (0L to 5L).map(i => (i, i + 1))
    val lv = HopLevels.levels(edges.toDF("x", "y"), "x", "y",
        n => n === 0 || n === 5, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lv == Map(0L -> 0, 5L -> 0, 1L -> 1, 4L -> 1, 6L -> 1,
      2L -> 2, 3L -> 2))
  }

  test("min-distance wins when two seeds reach the same node") {
    // triangle 0-1-2 with a tail 2-3; seeds {0}: 3 is 2 hops via 2
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val lv = HopLevels.levels(edges.toDF("x", "y"), "x", "y",
        n => n === 0, 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lv == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2))
  }

  test("reliable checkpointDir mode is bitwise-equal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hops-ckpt")
    try {
      val rnd = new scala.util.Random(47)
      val edges = Seq.fill(120)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(edges, 3, Some(dir.toString)) == run(edges, 3))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("plan joins the frontier only; no cartesian/NLJ") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val df = HopLevels.levels(edges.toDF("x", "y"), "x", "y",
      n => n === 0, 2)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the expansion side filters on the previous round's level — the
    // frontier restriction must appear as a pushed filter, not a
    // post-join one
    assert(df.queryExecution.optimizedPlan.toString
      .contains("level"), "level filter present in plan")
  }
}
