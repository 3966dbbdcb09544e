package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Join family over the star schema — SURVEY.md §2 rows J1–J7.
  *
  * Plan-shape notes (the 100 TB contract):
  *  - Dimension joins (`supplier`/`nation`/`region`) are explicitly
  *    `broadcast()` — zero shuffle of the fact side for them; the fact
  *    table shuffles only where a fact–fact join or aggregation needs
  *    its key.
  *  - The fact–fact `lineitem ⋈ orders` join carries a `merge` hint:
  *    at sf0.01 Catalyst would broadcast the 15k-row orders side, but
  *    at 100 TB orders is itself huge — a shuffle-on-key plan
  *    (sort-merge, AQE may downgrade to shuffled-hash) is the shape
  *    that survives the scale-up, so we pin it to keep the benched
  *    plan honest.
  *  - Theta/cross joins broadcast their small side by construction —
  *    a nested-loop join is only ever acceptable when one side is a
  *    dimension.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // J1/J2: fact ⋈ three broadcast dims, revenue rollup per nation.
    "join_star" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    }),

    // J3: large equi-join pinned to the shuffle-on-key (sort-merge)
    // plan that fact–fact joins need at scale.
    "join_large" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).hint("merge"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"o_orderpriority")
    }),

    // J4 (left outer): every customer with order count + spend, zeros
    // for the orderless — null-preserving side exercised and folded
    // through conditional aggregation.
    "join_outer" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey", $"c_mktsegment")
        .agg(
          count($"o_orderkey").as("n_orders"),
          dsum(coalesce($"o_totalprice", lit(0.0))).as("spent"))
        .orderBy($"c_custkey")
    }),

    // J4 (full outer): nations seen from the customer side vs the
    // supplier side — unmatched rows survive on both sides.
    "join_full_outer" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
      val su = Tables.supplier(s, dir)
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_suppliers"))
      c.join(su, $"c_nationkey" === $"s_nationkey", "full")
        .select(
          coalesce($"c_nationkey", $"s_nationkey").cast("int").as("nationkey"),
          coalesce($"n_customers", lit(0L)).as("n_customers"),
          coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
        .orderBy($"nationkey")
    }),

    // J5: existence filtering both ways — customers with at least one
    // urgent order (semi) and customers with no orders at all (anti).
    "join_semi_anti" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      val semi = c.join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", lit("has_urgent").as("status"))
      val anti = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", lit("no_orders").as("status"))
      semi.unionByName(anti).orderBy($"c_custkey", $"status")
    }),

    // J6: Cartesian product of the two smallest dims.
    "join_cross" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select($"r_regionkey".cast("int").as("r_regionkey"),
          $"n_nationkey".cast("int").as("n_nationkey"),
          ($"n_regionkey" === $"r_regionkey").as("same_region"))
        .orderBy($"r_regionkey", $"n_nationkey")
    }),

    // J7: pure non-equi (theta) join — per supplier, how many customers
    // hold a strictly larger balance. Supplier side is 10 rows →
    // BroadcastNestedLoopJoin with the dimension broadcast.
    "join_theta" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(broadcast(Tables.supplier(s, dir)), $"s_acctbal" < $"c_acctbal")
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_richer_customers"))
        .orderBy($"s_suppkey")
    }),

    // J32: null-safe equi join (<=>) — the one equality semantic the
    // family above lacks: NULL keys MATCH each other (a plain equi
    // join silently drops every NULL row — the classic "where did my
    // unattributed bucket go" bug). EqualNullSafe is still an equi
    // key, so the plan is an ordinary shuffle-on-key join, never a
    // nested loop; the NULL bucket is reported as key -1.
    "join_nullsafe" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val a = c.select($"c_custkey".as("a_id"),
        when($"c_custkey" % 7 === 3, lit(null))
          .otherwise($"c_nationkey").as("ka"))
      val b = c.select($"c_custkey".as("b_id"),
        when($"c_custkey" % 5 === 2, lit(null))
          .otherwise($"c_nationkey").as("kb"))
      a.join(b.hint("merge"), $"ka" <=> $"kb")
        .groupBy(coalesce($"ka", lit(-1)).as("k"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"k")
    }),

    // ---- Composed multi-join analytics (the TPC-H Q3/Q5/Q10 shapes):
    // the coverage class the single-shape rows above can't regression-
    // protect — join ORDER and per-edge strategy choices across 3-6
    // tables. Every fact⋈fact edge carries an explicit `merge` hint
    // (at the oracle sf Catalyst would broadcast a 15k-row fact side;
    // at 100 TB customer/orders/lineitem are all huge — the pinned
    // shuffle-on-key plan is the one that survives the scale-up) and
    // every genuine dimension is broadcast. JoinsSpec pins both.

    // Q3 shape: shipping-priority top-k — segment-filtered customers
    // ⋈ open orders ⋈ shipped-later lineitems, revenue per order,
    // top-10 via TakeOrderedAndProject (never a global sort). Filters
    // reach the scans; the deterministic tie-break (revenue DESC,
    // orderkey) makes top-k oracle-exact under the dsum quantization.
    "tpch_q3" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cut = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val o = Tables.orders(s, dir).filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val l = Tables.lineitem(s, dir).filter($"l_shipdate" > cut)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      c.join(o.hint("merge"), $"c_custkey" === $"o_custkey")
        .join(l.hint("merge"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // Q5 shape: local-supplier volume — 6 tables; region→nation→
    // supplier prune broadcast-side, the customer⋈orders⋈lineitem
    // chain shuffles on its keys, and the c_nationkey = s_nationkey
    // "local" equality rides the supplier join as a second key (never
    // a post-join filter over a wider join).
    "tpch_q5" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val dims = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), $"s_nationkey" === $"n_nationkey")
        .join(Tables.region(s, dir).filter($"r_name" === "ASIA"),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_nationkey", $"n_name")
      Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
        .join(Tables.orders(s, dir)
          .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
          .select($"o_orderkey", $"o_custkey").hint("merge"),
          $"c_custkey" === $"o_custkey")
        .join(Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_suppkey", $"l_extendedprice",
            $"l_discount").hint("merge"),
          $"o_orderkey" === $"l_orderkey")
        .join(broadcast(dims), $"l_suppkey" === $"s_suppkey" &&
          $"c_nationkey" === $"s_nationkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Q10 shape: returned-item revenue per customer — 4 tables, top-20
    // customers by lost revenue in a quarter, nation broadcast onto
    // the aggregated output (join AFTER the heavy agg: the dimension
    // decorates 20-ish groups, not 60k lineitems... conceptually — the
    // agg keys on c_nationkey so the join input is one row per
    // customer, still bounded).
    "tpch_q10" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-04-01").cast("timestamp")
      Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
        .join(Tables.orders(s, dir)
          .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
          .select($"o_orderkey", $"o_custkey").hint("merge"),
          $"c_custkey" === $"o_custkey")
        .join(Tables.lineitem(s, dir)
          .filter($"l_returnflag" === "R")
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
          .hint("merge"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("revenue"))
        .join(broadcast(Tables.nation(s, dir)),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name",
          $"revenue")
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // Q18 shape: large-volume orders — the group-HAVING semi pattern
    // (filter a fact by an aggregate OVER ITSELF, then decorate). The
    // per-order quantity total is computed ONCE and plays both roles
    // (the HAVING filter and the output column) — classic Q18 spells
    // it as a correlated IN-subquery that Catalyst would decorrelate
    // into exactly this aggregate + join. Both joins are fact⋈fact →
    // merge-pinned; the agg precedes the joins so only qualifying
    // orders (46 at sf0.01) reach them.
    "tpch_q18" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val oq = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(dsum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 300.0)
      Tables.customer(s, dir).select($"c_custkey", $"c_name")
        .join(Tables.orders(s, dir)
          .select($"o_orderkey", $"o_custkey", $"o_orderdate",
            $"o_totalprice").hint("merge"),
          $"c_custkey" === $"o_custkey")
        .join(oq.hint("merge"), $"o_orderkey" === $"l_orderkey")
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
        .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
        .limit(100)
    }),

    // Q22 shape: dormant wealthy customers — scalar-aggregate
    // threshold (one-row broadcast; exact under davg quantization) +
    // anti join against recent orders + per-nation rollup. The classic
    // Q22 global-lost-opportunity report with the fixture's schema
    // (no phone column → nation key is the grouping dimension; "never
    // ordered" → "no order since the cutoff", which keeps the row
    // non-empty on a fixture where every customer has SOME order).
    "tpch_q22" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cut = lit("1999-01-01").cast("timestamp")
      val c = Tables.customer(s, dir)
      val thr = c.filter($"c_acctbal" > 0.0)
        .agg(davg($"c_acctbal").as("thr"))
      val active = Tables.orders(s, dir)
        .filter($"o_orderdate" >= cut).select($"o_custkey")
      c.crossJoin(broadcast(thr))
        .filter($"c_acctbal" > $"thr")
        .join(active.hint("merge"), $"c_custkey" === $"o_custkey",
          "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_custs"), dsum($"c_acctbal").as("total_bal"))
        .orderBy($"c_nationkey")
    }),

    // Q21 shape: the multi-correlated-EXISTS pattern — suppliers who
    // were the SOLE late supplier on a multi-supplier order ("late" =
    // shipped > 60 days after order date; the fixture carries no
    // commit/receipt dates). Classic Q21 is EXISTS + NOT EXISTS over
    // the same fact table; decorrelated here as one semi and one anti
    // join over the deduped (order, supplier) relations — both
    // merge-pinned (fact⋈fact both sides at 100 TB), with the
    // supplier-differs inequality riding each join as a residual
    // predicate on the equi key, never a post-join filter.
    "tpch_q21" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_suppkey").distinct()
      val late = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(Tables.orders(s, dir)
          .select($"o_orderkey", $"o_orderdate").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .select($"l_orderkey", $"l_suppkey").distinct()
      val others = l.select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      val lateOthers = late
        .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      late
        .join(others.hint("merge"),
          $"l_orderkey" === $"ok" && $"l_suppkey" =!= $"sk", "left_semi")
        .join(lateOthers.hint("merge"),
          $"l_orderkey" === $"ok" && $"l_suppkey" =!= $"sk", "left_anti")
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)
          .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
        .select($"s_name", $"s_suppkey", $"numwait")
        .orderBy($"numwait".desc, $"s_suppkey")
        .limit(10)
    }),

    // Q7 shape: the SELF-ALIASED-dimension pattern — the same nation
    // dimension plays two roles (supplier's nation, customer's
    // nation) in one join tree, the one composed-join shape the
    // Q3/Q5/Q10 star rows don't cover (join reorder must keep the two
    // aliases distinct; a planner bug that collapses them changes
    // every pair). Bidirectional NATION_3↔NATION_7 trade volume per
    // year. Scale shape: the ~2/25-nation selectivity (≈12×) must
    // land on the FACT tree, not on a top residual — supplier and
    // customer are each pre-pruned through their 2-row nation alias
    // FIRST, the pruned supplier broadcasts into lineitem BELOW the
    // lineitem⋈orders merge (so both heavy exchanges carry only
    // two-nation rows), and the pre-pruned customer edge stays
    // merge-pinned. Only the symmetric pair disjunction (which needs
    // both sides at once) remains as the top residual.
    "tpch_q7" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val twoNations = Seq("NATION_3", "NATION_7")
      val n1 = Tables.nation(s, dir)
        .filter($"n_name".isin(twoNations: _*))
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .filter($"n_name".isin(twoNations: _*))
        .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
      val supp = Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_nationkey")
        .join(broadcast(n1), $"s_nationkey" === $"sn_key")
        .select($"s_suppkey", $"supp_nation")
      val cust = Tables.customer(s, dir)
        .select($"c_custkey", $"c_nationkey")
        .join(broadcast(n2), $"c_nationkey" === $"cn_key")
        .select($"c_custkey", $"cust_nation")
      val pair = ($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3")
      Tables.lineitem(s, dir)
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
          .hint("merge"), $"l_orderkey" === $"o_orderkey")
        .join(cust.hint("merge"), $"o_custkey" === $"c_custkey")
        .filter(pair)
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(count(lit(1)).as("n_items"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // Q17 shape: the PER-GROUP correlated-scalar-threshold pattern —
    // the one decorrelation class Q18 (self-HAVING) and Q22 (global
    // scalar) don't cover: each fact row is filtered against an
    // aggregate of its OWN group ("small-quantity orders": lineitems
    // under 20% of their part's average quantity), reported per brand.
    // Decorrelated as one per-partkey aggregate (map-combinable;
    // davg-quantized so the 0.2·avg cut is engine-exact) joined back
    // to the fact on the SAME key — agg output is O(|part|), itself
    // huge at 100 TB, so the join-back is merge-pinned, never
    // broadcast; the brand dimension decorates via broadcast. The
    // partkey shuffle is paid once and reused by both the aggregate
    // and the join-back sides.
    "tpch_q17" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val thr = l.groupBy($"l_partkey")
        .agg(davg($"l_quantity").as("avg_qty"))
      l.join(thr.hint("merge"), "l_partkey")
        .filter($"l_quantity" < lit(0.2) * $"avg_qty")
        .join(broadcast(Tables.part(s, dir)
          .select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          count(lit(1)).as("n_small"),
          (dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"))
        .orderBy($"p_brand")
    }),
  )

  val oracle: Map[String, String] = Map(
    "join_star" ->
      s"""SELECT r_name, n_name,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,

    "join_large" ->
      s"""SELECT o_orderpriority,
         |  COUNT(*) AS n_items,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "join_outer" ->
      s"""SELECT c_custkey, c_mktsegment,
         |  COUNT(o_orderkey) AS n_orders,
         |  ${sqlDsum("COALESCE(o_totalprice, 0)")} AS spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_mktsegment
         |ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT CAST(COALESCE(c_nationkey, s_nationkey) AS INTEGER) AS nationkey,
        |  COALESCE(n_customers, 0) AS n_customers,
        |  COALESCE(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
        |  ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "join_semi_anti" ->
      """SELECT c_custkey, 'has_urgent' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey, status""".stripMargin,

    "join_cross" ->
      """SELECT CAST(r_regionkey AS INTEGER) AS r_regionkey,
        |  CAST(n_nationkey AS INTEGER) AS n_nationkey,
        |  n_regionkey = r_regionkey AS same_region
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "join_theta" ->
      """SELECT s_suppkey, COUNT(*) AS n_richer_customers
        |FROM customer JOIN supplier ON s_acctbal < c_acctbal
        |GROUP BY s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    "join_nullsafe" ->
      """WITH a AS (
        |  SELECT c_custkey AS a_id,
        |    CASE WHEN c_custkey % 7 = 3 THEN NULL
        |         ELSE c_nationkey END AS ka
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey AS b_id,
        |    CASE WHEN c_custkey % 5 = 2 THEN NULL
        |         ELSE c_nationkey END AS kb
        |  FROM customer)
        |SELECT COALESCE(ka, -1) AS k, COUNT(*) AS n_pairs
        |FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
        |GROUP BY 1 ORDER BY k""".stripMargin,

    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY 1, 2
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "tpch_q5" ->
      s"""SELECT n_name,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |  AND l_returnflag = 'R'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "tpch_q18" ->
      s"""WITH oq AS (
         |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING ${sqlDsum("l_quantity")} > 300.0)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  o_totalprice, total_qty
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN oq ON o_orderkey = l_orderkey
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
         |LIMIT 100""".stripMargin,

    "tpch_q22" ->
      s"""WITH thr AS (
         |  SELECT ${sqlDavg("c_acctbal")} AS thr
         |  FROM customer WHERE c_acctbal > 0.0)
         |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
         |  ${sqlDsum("c_acctbal")} AS total_bal
         |FROM customer CROSS JOIN thr
         |WHERE c_acctbal > thr
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '1999-01-01')
         |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "tpch_q21" ->
      """WITH l AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |sole AS (
        |  SELECT w.l_orderkey, w.l_suppkey FROM late w
        |  WHERE EXISTS (SELECT 1 FROM l o2
        |      WHERE o2.l_orderkey = w.l_orderkey
        |        AND o2.l_suppkey <> w.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late l2
        |      WHERE l2.l_orderkey = w.l_orderkey
        |        AND l2.l_suppkey <> w.l_suppkey))
        |SELECT s_name, s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM sole JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 10""".stripMargin,

    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         |  COUNT(*) AS n_items,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "tpch_q17" ->
      s"""WITH thr AS (
         |  SELECT l_partkey, ${sqlDavg("l_quantity")} AS avg_qty
         |  FROM lineitem GROUP BY 1)
         |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_small,
         |  ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem
         |JOIN thr USING (l_partkey)
         |JOIN part ON l_partkey = p_partkey
         |WHERE l_quantity < 0.2 * avg_qty
         |GROUP BY 1 ORDER BY p_brand""".stripMargin,
  )
}
