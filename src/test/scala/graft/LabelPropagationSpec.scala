package graft

import graft.operators.LabelPropagation

/** Pins [[graft.operators.LabelPropagation]] to the sequential
  * synchronous-mode recursion, plus the community-vs-component
  * distinction (a bridge edge must NOT merge two dense cliques) and
  * plan hygiene. */
class LabelPropagationSpec extends SparkSuite {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelPropagation.communities(edges.toDF("x", "y"), "x", "y", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs equal the sequential synchronous recursion") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3; rounds <- Seq(1, 3)) {
      val edges = Seq.fill(150)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(edges, rounds) == reference(edges, rounds),
        s"trial $trial rounds $rounds")
    }
  }

  test("two cliques + one bridge: distinct communities (unlike CC)") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L)
    val labels = run(edges, 3)
    val c1 = (1L to 5L).map(labels).toSet
    val c2 = (11L to 15L).map(labels).toSet
    assert(c1.size == 1 && c2.size == 1, "each clique must be one community")
    assert(c1 != c2, "the bridge must not merge the cliques")
    // the same graph IS one connected component — LPA sees density
    val cc = graft.operators.ConnectedComponents
      .components(edges.toDF("x", "y"), "x", "y")
      .select("component").distinct().count()
    assert(cc == 1L)
  }

  test("deterministic across runs; plan has no cartesian/NLJ") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(run(edges, 3) == run(edges, 3))
    val df = LabelPropagation.communities(edges.toDF("x", "y"), "x", "y", 2)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("reliable checkpointDir mode is bitwise-equal and writes the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa-ckpt")
    try {
      val rnd = new scala.util.Random(41)
      val edges = Seq.fill(150)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      // deterministic tie-break ⇒ bitwise equality across truncation
      // modes, not merely the same partition structure
      val reliable = LabelPropagation.communities(
          edges.toDF("x", "y"), "x", "y", 3,
          checkpointDir = Some(dir.toString))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == run(edges, 3))
      assert(java.nio.file.Files.walk(dir).count() > 1,
        s"no checkpoint files written under $dir")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
