package graft

import graft.queries.Joins

/** Plan-shape assertions for the join family: the physical plan must be
  * the one we'd want at 100 TB, not merely a correct one. */
class JoinsSpec extends SparkSuite {

  private def plan(name: String): String =
    Joins.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("join_star broadcasts all three dimension joins") {
    val p = plan("join_star")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "dimension joins must not shuffle the fact side")
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") == 3)
  }

  test("join_large pins the fact-fact join to sort-merge (shuffle-on-key)") {
    val p = plan("join_large")
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("join_theta broadcasts the small side of the nested-loop join") {
    val p = plan("join_theta")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("join_semi_anti plans semi and anti joins") {
    val p = plan("join_semi_anti")
    assert(p.contains("LeftSemi"))
    assert(p.contains("LeftAnti"))
  }

  test("join_star pushes the shipdate filter to the parquet scan") {
    val p = plan("join_star")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"expected shipdate pushdown in:\n$p")
  }

  test("join family row-level sanity at sf0.001") {
    assert(Joins.queries("join_cross")(spark, sf).count() == 125)
    val fo = Joins.queries("join_full_outer")(spark, sf).collect()
    assert(fo.map(_.getInt(0)).distinct.length == fo.length, "one row per nation")
  }
}
