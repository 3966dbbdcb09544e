package graft

import graft.queries.TpchShapes

/** Plan-shape pins for the 13 TPC-H classes added by TpchShapes.scala
  * — same contract as JoinsSpec: the physical plan must be the one
  * we'd want at 100 TB, not merely a correct one. */
class TpchShapesSpec extends SparkSuite {

  private def plan(name: String): String =
    TpchShapes.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def countOf(p: String, token: String): Int =
    p.sliding(token.length).count(_ == token)

  test("tpch_q2: supply aggregates meet on a merge join-back; dims broadcast") {
    val p = plan("tpch_q2")
    assert(p.contains("SortMergeJoin"),
      s"per-(part,supplier) and per-part aggregates must meet on a " +
        s"shuffle-on-partkey join (both huge at 100 TB):\n$p")
    assert(countOf(p, "BroadcastHashJoin") >= 2,
      s"part and supplier decoration must broadcast:\n$p")
  }

  test("tpch_q4: correlated EXISTS plans as a semi join with residual") {
    val p = plan("tpch_q4")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the orders-lineitem semi join must shuffle on key:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date range must reach the orders scan:\n$p")
  }

  test("tpch_q6: all three predicates reach the scan; no join at all") {
    val p = plan("tpch_q6")
    assert(!p.contains("Join"), s"Q6 must plan join-free:\n$p")
    // the PushedFilters list is truncated in the plan print — assert
    // membership there for the first filter and on the Filter node
    // (which prints in full) for the value predicates
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"scan-level pushdown missing:\n$p")
    assert(p.contains(">= 0.04)") && p.contains("<= 0.06)"),
      s"discount band must reach the filter:\n$p")
    assert(p.contains("< 24.0)"), s"quantity cap must reach the filter:\n$p")
  }

  test("tpch_q8: market semi join + merge facts + broadcast dims") {
    val p = plan("tpch_q8")
    assert(p.contains("LeftSemi"),
      s"the AMERICA-market membership must plan as a semi join:\n$p")
    assert(countOf(p, "SortMergeJoin") >= 2,
      s"lineitem-orders and the market semi join must shuffle on key:\n$p")
    assert(countOf(p, "BroadcastHashJoin") >= 2,
      s"part and supplier-nation must broadcast:\n$p")
  }

  test("tpch_q9: dimension-only joins all broadcast; LIKE prunes part side") {
    val p = plan("tpch_q9")
    assert(countOf(p, "BroadcastHashJoin") == 3,
      s"part, supplier and nation must all broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no fact-fact edge exists — nothing may shuffle the fact:\n$p")
    assert(p.contains("widget"),
      s"the %widget% filter must prune the part side before it ships:\n$p")
  }

  test("tpch_q11: per-part agg shuffles once; threshold is a one-row broadcast") {
    val p = plan("tpch_q11")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the global total must ride a one-row broadcast:\n$p")
    assert(p.contains("Exchange hashpartitioning(l_partkey"),
      s"the per-part aggregate must shuffle on partkey:\n$p")
  }

  test("tpch_q12: fact-fact merge join; shipdate year pushes to the scan") {
    val p = plan("tpch_q12")
    assert(p.contains("SortMergeJoin"), s"lineitem-orders must merge:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      "no fact side may be broadcast (it won't fit at 100 TB)")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"the 1997 window must reach the lineitem scan:\n$p")
  }

  test("tpch_q13: left outer with residual; two aggregation levels") {
    val p = plan("tpch_q13")
    assert(p.contains("LeftOuter"),
      s"zero-order customers must survive — left outer required:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"customer-orders must shuffle on key:\n$p")
    assert(countOf(p, "Exchange hashpartitioning") >= 2,
      s"per-customer and per-count aggregations each shuffle once:\n$p")
  }

  test("tpch_q14: single-group ratio — part broadcasts, month pushes") {
    val p = plan("tpch_q14")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"part is the only join and must broadcast:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"the month window must reach the scan:\n$p")
  }

  test("tpch_q15: integer max rides a one-row broadcast; winner decorates") {
    val p = plan("tpch_q15")
    // the INTEGER equality lets Spark plan the one-row max broadcast
    // as a hash join keyed on the value (better than a nested loop)
    assert(countOf(p, "BroadcastHashJoin") == 2,
      s"max-scalar probe and supplier decoration must both broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the winner path may shuffle:\n$p")
  }

  test("tpch_q16: blacklist anti lands before the distinct aggregation") {
    val p = plan("tpch_q16")
    assert(p.contains("LeftAnti"),
      s"the bad-standing exclusion must plan as an anti join:\n$p")
    assert(countOf(p, "BroadcastHashJoin") == 2,
      s"blacklist (6 rows) and filtered part must both broadcast:\n$p")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(p.indexOf("LeftAnti") > p.indexOf("HashAggregate"),
      s"anti join must sit under the distinct aggregate, so excluded " +
        s"pairs never enter the distinct shuffle:\n$p")
    assert(lastAgg > 0)
  }

  test("tpch_q19: the OR-of-ANDs stays residual on an equi join") {
    val p = plan("tpch_q19")
    assert(p.contains("BroadcastHashJoin"),
      s"partkey must still drive a hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"the disjunction must not break the equi join:\n$p")
  }

  test("tpch_q20: two aggregates of one scan meet on merge; semi join out") {
    val p = plan("tpch_q20")
    assert(p.contains("SortMergeJoin"),
      s"per-(part,supplier) and per-part volumes must meet on a " +
        s"shuffle-on-partkey join:\n$p")
    assert(p.contains("LeftSemi"),
      s"excess membership must plan as a semi join:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"the 1996 window must reach the lineitem scan:\n$p")
  }

  test("scalar-aggregate rows always exist; winner set is non-empty") {
    assert(TpchShapes.queries("tpch_q6")(spark, sf).count() == 1)
    assert(TpchShapes.queries("tpch_q14")(spark, sf).count() == 1)
    val q15 = TpchShapes.queries("tpch_q15")(spark, sf).collect()
    assert(q15.nonEmpty, "at least one max-revenue supplier")
    val q13 = TpchShapes.queries("tpch_q13")(spark, sf).collect()
    assert(q13.map(_.getLong(1)).sum == Tables.customer(spark, sf).count(),
      "Q13's distribution must partition the customer set exactly")
  }
}
