package graft

import graft.operators.Skyline

/** Pins [[graft.operators.Skyline]] to the quadratic dominance
  * definition, the tie matrix, and plan hygiene. */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  /** Literal ICDE'01 dominance: p survives unless some q is <= in
    * cost, >= in gain, and strict in at least one. Duplicates kept. */
  private def reference(pts: Seq[(Double, Int)]): Seq[(Double, Int)] =
    pts.filterNot { p =>
      pts.exists(q => q._1 <= p._1 && q._2 >= p._2 &&
        (q._1 < p._1 || q._2 > p._2))
    }

  private def run(pts: Seq[(Double, Int)]): Seq[(Double, Int)] =
    Skyline.frontier2d(pts.toDF("cost", "gain"), "cost", "gain")
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq

  test("random point sets equal the quadratic dominance filter") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 4) {
      val pts = Seq.fill(80)(
        (rnd.nextInt(20).toDouble, rnd.nextInt(20)))
      assert(run(pts).sorted == reference(pts).sorted, s"trial $trial")
    }
  }

  test("tie matrix: equal points both kept; same-cost and same-gain dominated") {
    // (1,5) and its duplicate are mutually non-dominating → both kept;
    // (1,3) loses to (1,5) on gain; (2,5) loses to (1,5) on cost;
    // (2,7) survives (more gain than anything cheaper)
    val pts = Seq((1.0, 5), (1.0, 5), (1.0, 3), (2.0, 5), (2.0, 7))
    assert(run(pts).sorted == Seq((1.0, 5), (1.0, 5), (2.0, 7)))
  }

  test("strictly improving staircase keeps everything") {
    val pts = (1 to 10).map(i => (i.toDouble, i))
    assert(run(pts).sorted == pts)
  }

  test("single dominator keeps exactly one") {
    val pts = Seq((1.0, 10)) ++ (2 to 9).map(i => (i.toDouble, i))
    assert(run(pts) == Seq((1.0, 10)))
  }

  test("plan: no cartesian/NLJ; the survivor join is a semi-join") {
    val df = Skyline.frontier2d(
      Seq((1.0, 2), (2.0, 3)).toDF("cost", "gain"), "cost", "gain")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftSemi"))
  }
}
