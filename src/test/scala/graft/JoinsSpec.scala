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

  private def countOf(p: String, token: String): Int =
    p.sliding(token.length).count(_ == token)

  test("tpch_q3: both fact-fact joins sort-merge; top-k never global-sorts") {
    val p = plan("tpch_q3")
    assert(countOf(p, "SortMergeJoin") == 2,
      s"customer-orders and orders-lineitem must both shuffle on key:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      "no fact side may be broadcast (it won't fit at 100 TB)")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must plan as TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("tpch_q5: facts merge-join, dimension chain broadcasts, filters push") {
    val p = plan("tpch_q5")
    assert(countOf(p, "SortMergeJoin") == 2,
      s"customer-orders and orders-lineitem must both shuffle on key:\n$p")
    assert(countOf(p, "BroadcastHashJoin") >= 1,
      s"the supplier/nation/region dim side must broadcast:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      s"region filter must reach the scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date range must reach the scan:\n$p")
  }

  test("tpch_q10: returnflag filter pushes; nation joins after the agg") {
    val p = plan("tpch_q10")
    assert(countOf(p, "SortMergeJoin") == 2)
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter must reach the lineitem scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
    // nation decorates the aggregated (per-customer) rows: the
    // BroadcastHashJoin must sit ABOVE the final HashAggregate in the
    // operator listing (smaller string index = closer to the root)
    val bhj = p.indexOf("BroadcastHashJoin")
    val agg = p.indexOf("HashAggregate")
    assert(bhj >= 0 && agg >= 0 && bhj < agg,
      s"nation must join after the aggregate:\n$p")
  }

  test("tpch_q18: agg-before-join; both joins merge; top-k planned") {
    val p = plan("tpch_q18")
    assert(countOf(p, "SortMergeJoin") == 2,
      s"customer-orders and orders-bigorders must both shuffle on key:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      "no fact side may be broadcast (it won't fit at 100 TB)")
    assert(p.contains("TakeOrderedAndProject"))
    // the quantity rollup must run BELOW its join (filter the fact by
    // the aggregate, then join the survivors): some HashAggregate
    // appears deeper in the listing than the last SortMergeJoin
    val lastSmj = p.lastIndexOf("SortMergeJoin")
    assert(p.indexOf("HashAggregate", lastSmj) > lastSmj,
      s"per-order quantity agg must be computed under the join:\n$p")
  }

  test("tpch_q22: one-row threshold broadcasts; anti join shuffles on key") {
    val p = plan("tpch_q22")
    assert(p.contains("LeftAnti"),
      s"dormancy test must plan as an anti join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"the anti join against orders must shuffle on key, not broadcast " +
        s"the order side (huge at 100 TB):\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the scalar threshold must ride a one-row broadcast:\n$p")
  }

  test("tpch_q7: both nation aliases broadcast distinctly; facts merge") {
    val p = plan("tpch_q7")
    assert(countOf(p, "SortMergeJoin") >= 2,
      s"lineitem-orders and orders-customer must shuffle on key:\n$p")
    assert(countOf(p, "BroadcastHashJoin") == 3,
      s"pruned supplier + BOTH nation aliases must broadcast (a planner " +
        s"collapse of the aliases would drop one):\n$p")
  }

  test("tpch_q7: two-nation prune reaches the fact tree, below the first merge") {
    val p = plan("tpch_q7")
    // the nation-pruned supplier must broadcast into lineitem BELOW the
    // lineitem⋈orders merge (deeper in the listing = larger index), so
    // both heavy exchanges carry only two-nation rows
    val smjLO = p.indexOf("SortMergeJoin [l_orderkey")
    val bhjSupp = p.indexOf("BroadcastHashJoin [l_suppkey")
    assert(smjLO >= 0, s"expected the l⋈o merge join:\n$p")
    assert(bhjSupp > smjLO,
      s"supplier prune must sit UNDER the l⋈o merge, not above it:\n$p")
    // the two-nation IN filter must reach both nation scans
    assert(countOf(p, "In(n_name") >= 2,
      s"n_name IN (NATION_3, NATION_7) must push to both nation scans:\n$p")
  }

  test("tpch_q17: per-part threshold joins back on a merge, never broadcast") {
    val p = plan("tpch_q17")
    assert(p.contains("SortMergeJoin"),
      s"the agg output is O(|part|) — the join-back must shuffle on key:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the brand dimension must broadcast:\n$p")
    // the partkey aggregate must sit under the join-back
    val smj = p.indexOf("SortMergeJoin")
    assert(p.indexOf("HashAggregate", smj) > smj,
      s"per-part average must be computed below its join:\n$p")
  }

  test("tpch_q21: one semi and one anti join over the same fact") {
    val p = plan("tpch_q21")
    assert(p.contains("LeftSemi"),
      s"the other-supplier EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"),
      s"the no-other-late NOT EXISTS must plan as an anti join:\n$p")
    assert(countOf(p, "SortMergeJoin") >= 3,
      s"orders join, semi, and anti are all fact-fact — every one " +
        s"shuffles on key:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("tpch composed queries return sane top-k rows") {
    val q3 = Joins.queries("tpch_q3")(spark, sf).collect()
    assert(q3.length <= 10 && q3.nonEmpty)
    // revenue sorted non-increasing with key tie-break
    val rev3 = q3.map(_.getDouble(2))
    assert(rev3.zip(rev3.tail).forall { case (a, b) => a >= b })
    val q5 = Joins.queries("tpch_q5")(spark, sf).collect()
    assert(q5.nonEmpty && q5.length <= 5, "one row per ASIA nation at most")
    val q10 = Joins.queries("tpch_q10")(spark, sf).collect()
    assert(q10.length <= 20 && q10.nonEmpty)
    val q18 = Joins.queries("tpch_q18")(spark, sf).collect()
    assert(q18.length <= 100, "top-100 cap")
    assert(q18.forall(_.getDouble(5) > 300.0), "HAVING must hold")
    val q22 = Joins.queries("tpch_q22")(spark, sf).collect()
    assert(q22.forall(_.getLong(1) >= 1L))
  }
}
