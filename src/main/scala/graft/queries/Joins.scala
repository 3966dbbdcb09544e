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
  )
}
