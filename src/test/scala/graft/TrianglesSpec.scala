package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._

/** Pins [[graft.operators.Triangles]] to brute-force enumeration on
  * random and adversarial graphs, plus the structural guarantees:
  * exactly-once per triangle, edge hygiene, and an equi-join-only
  * plan. */
class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)).toSet
  }

  private def run(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    Triangles.triangles(edges.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("random graphs equal brute force, each triangle exactly once") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(300)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val got = run(edges)
      assert(got.size == got.toSet.size, s"trial $trial: duplicate triangle")
      assert(got.toSet == brute(edges), s"trial $trial")
      assert(got.nonEmpty, s"trial $trial should have triangles at this density")
    }
  }

  test("planted triangle plus chain noise") {
    val edges = Seq((100L, 200L), (200L, 300L), (100L, 300L),
      (1L, 2L), (2L, 3L), (3L, 4L)) // chain has no triangle
    assert(run(edges).toSet == Set((100L, 200L, 300L)))
  }

  test("star hub yields zero triangles and bounded wedges") {
    // all edges orient INTO the hub (it has max degree), so the hub
    // generates no wedges — the Suri-Vassilvitskii point
    val edges = (2L to 400L).map(i => (1L, i))
    assert(run(edges).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges do not change the result") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = clean ++ clean.map(_.swap) ++ Seq((1L, 1L), (2L, 2L))
    assert(run(noisy).toSet == Set((1L, 2L, 3L)))
  }

  test("plan: equi-joins only, no cartesian/NLJ") {
    val df = Triangles.triangles(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("x", "y"), "x", "y")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
