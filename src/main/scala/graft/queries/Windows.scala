package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (W1–W5), sorts/limits/top-k (O2–O4) and set
  * operations (O5–O7) — SURVEY.md §2 E/F.
  *
  * Determinism: every window orders by a unique composite key (peers
  * would otherwise make RANGE/ROWS defaults diverge between engines);
  * value-carrying frames use explicit ROWS frames; windowed double
  * sums use the quantized-integer recipe (QueryUtil scaladoc).
  * Scale: windows shuffle once on their partition key; global top-k is
  * `TakeOrderedAndProject` (per-partition heap + driver merge of k
  * rows, never a full sort); partition-local sort never issues a
  * global range exchange.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // W1: the ranking family over one per-customer window.
    "window_rank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy($"o_custkey", $"rn")
    }),

    // W2 + W3: offset access and explicit-frame running aggregates.
    "window_analytic" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      val rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sliding = w.rowsBetween(-2, Window.currentRow)
      // RANGE frame: a true value-based window — all orders of the
      // customer within the trailing 7 days, however many rows that is.
      val week = Window.partitionBy($"o_custkey").orderBy($"epoch_sec")
        .rangeBetween(-7L * 24 * 3600, Window.currentRow)
      val q = floor($"o_totalprice" * lit(10000.0) + lit(0.5))
      Tables.orders(s, dir)
        .withColumn("epoch_sec", unix_timestamp($"o_orderdate"))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first($"o_orderkey").over(rows).as("first_key"),
          nth_value($"o_orderkey", 2).over(rows).as("second_key"),
          (sum(q).over(rows).cast("double") / lit(10000.0)).as("running_spend"),
          (sum(q).over(sliding).cast("double") / lit(10000.0) /
            count(lit(1)).over(sliding)).as("avg3_spend"),
          (sum(q).over(week).cast("double") / lit(10000.0)).as("spend_7d"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // W4: forward fill — carry the last purchase value to every later
    // event of the same user (floor semantics along a partition,
    // search.rs:51-80 as a window).
    "window_fill" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("purchase_value",
          when($"event_type" === "purchase", $"value"))
        .select($"event_id", $"user_id", $"event_type",
          last($"purchase_value", ignoreNulls = true).over(w)
            .as("last_purchase_value"))
        .orderBy($"event_id")
    }),

    // W5: top-3 per group via ranking filter.
    "topk_per_group" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rn")
    }),

    // O3/O4: global top-k — planned as TakeOrderedAndProject (heap per
    // partition, merge of k at the driver), never a full global sort.
    "top_k" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // O8: keyset pagination — the scale-safe spelling of OFFSET:
    // "the next 100 rows after cursor (price, key)". OFFSET n scans
    // and discards n rows on every page (O(n·pages) total); the
    // keyset predicate is sargable, pushes to the scan, and every
    // page costs one TakeOrderedAndProject over the filtered
    // remainder. The cursor tuple is the last row of the previous
    // page under the same (price DESC, key ASC) total order.
    "keyset_page" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val (cPrice, cKey) = (400000.0, 0L)
      Tables.orders(s, dir)
        .filter($"o_totalprice" < cPrice ||
          ($"o_totalprice" === cPrice && $"o_orderkey" > cKey))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // W6: rolling EXACT median (order-statistic window) — the
    // robust-smoothing window neither engine ships natively at this
    // contract: per user, the median of the trailing 7 event values
    // under the (ts, event_id) total order. Selection, not
    // interpolation — the emitted value is an actual data double, so
    // it is engine-exact with no quantization; frames are ROWS with a
    // unique tie-break, so frame CONTENTS are deterministic. Scale:
    // partitions are user-sized; the per-row sort touches ≤ 7
    // elements (the frame width), never the partition.
    "rolling_median" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("vals", collect_list($"value").over(w))
        .select($"user_id", $"event_id",
          size($"vals").cast("long").as("n_win"),
          element_at(sort_array($"vals"),
            expr("CAST((size(vals) + 1) DIV 2 AS INT)")).as("med"))
        .orderBy($"user_id", $"event_id")
    }),

    // O9: 2-D skyline (Pareto frontier) — the parts no other part
    // beats on BOTH price (min) and size (max). NOT the quadratic
    // NOT-EXISTS self-join: the 2-D skyline is a prefix-max scan,
    // distributed with the PrefixSum two-phase offset pattern
    // (operators.Skyline scaladoc). Pure comparisons — engine-exact
    // on doubles.
    "pareto_frontier" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Skyline
        .frontier2d(Tables.part(s, dir), "p_retailprice", "p_size")
        .select($"p_partkey", $"p_name", $"p_retailprice", $"p_size")
        .orderBy($"p_retailprice", $"p_partkey")
    }),

    // O2: partition-local sort — no global exchange; the oracle compare
    // is order-insensitive, the plan shape is asserted in WindowsSpec.
    "partition_sort" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .repartition($"l_returnflag")
        .sortWithinPartitions($"l_returnflag", $"l_shipdate", $"l_orderkey",
          $"l_linenumber")
        .select($"l_returnflag", $"l_shipdate", $"l_orderkey", $"l_linenumber")
    }),

    // O5/O6/O7: the full set-operation family, distinct and multiset
    // variants, labeled into one relation.
    "set_ops" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val a = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_nationkey".cast("int").as("nationkey"))
      val b = Tables.supplier(s, dir)
        .select($"s_nationkey".cast("int").as("nationkey"))
      def lab(df: DataFrame, op: String): DataFrame =
        df.select(lit(op).as("op"), col("nationkey"))
      lab(a.union(b).distinct(), "union")
        .unionByName(lab(a.union(b), "union_all"))
        .unionByName(lab(a.intersect(b), "intersect"))
        .unionByName(lab(a.intersectAll(b), "intersect_all"))
        .unionByName(lab(a.except(b), "except"))
        .unionByName(lab(a.exceptAll(b), "except_all"))
        .orderBy($"op", $"nationkey")
    }),

    // O8: distributed exact NTILE — global quantile bucketing without
    // the one-task global sort `ntile() OVER (ORDER BY …)` plans. The
    // global rank comes from the shared two-phase offset prefix-sum
    // ([[graft.operators.PrefixSum]] with no groups: range-partition
    // by the order key, per-partition running count, tiny per-
    // partition offset relation), the bucket from pure arithmetic on
    // (rank, n) — the same Bresenham floor((r-1)·k/n) both engines
    // replay. Output: per-decile row counts and price ranges (decile
    // boundaries are the audit: min of bucket d ≥ max of bucket d−1).
    "exact_ntile" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables.orders(s, dir).select($"o_orderkey", $"o_totalprice")
      val ranked = graft.operators.PrefixSum.withRunningSum(
        o, Seq.empty, struct($"o_totalprice", $"o_orderkey"),
        lit(1L), "rank")
      val n = o.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .select($"o_totalprice",
          floor(($"rank" - lit(1L)).cast("double") * lit(10.0) / $"n")
            .as("decile"))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_orders"),
          min($"o_totalprice").as("min_price"),
          max($"o_totalprice").as("max_price"))
        .orderBy($"decile")
    }),
  )

  val oracle: Map[String, String] = Map(
    // identical rank + Bresenham bucket arithmetic; the oracle MAY
    // use the naive global window — it is the semantics, not the plan
    "exact_ntile" ->
      """WITH r AS (
        |  SELECT o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM orders)
        |SELECT CAST(FLOOR(CAST(rn - 1 AS DOUBLE) * 10.0 / n) AS BIGINT)
        |    AS decile,
        |  COUNT(*) AS n_orders,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "window_analytic" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER wr AS first_key,
        |  nth_value(o_orderkey, 2) OVER wr AS second_key,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER wr AS DOUBLE)
        |    / 10000.0 AS running_spend,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER ws AS DOUBLE)
        |    / 10000.0 / COUNT(*) OVER ws AS avg3_spend,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER wk AS DOUBLE)
        |    / 10000.0 AS spend_7d
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  ws AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  wk AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "window_fill" ->
      """SELECT event_id, user_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "top_k" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "keyset_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice < 400000.0
        |   OR (o_totalprice = 400000.0 AND o_orderkey > 0)
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "partition_sort" ->
      """SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber
        |FROM lineitem""".stripMargin,

    "pareto_frontier" ->
      """WITH g AS (
        |  SELECT p_retailprice AS cost, MAX(p_size) AS gmax
        |  FROM part GROUP BY 1),
        |r AS (
        |  SELECT cost, gmax,
        |    MAX(gmax) OVER (ORDER BY cost
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM g)
        |SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
        |FROM part p JOIN r ON p.p_retailprice = r.cost
        |WHERE p.p_size = r.gmax AND (r.prev IS NULL OR r.gmax > r.prev)
        |ORDER BY p_retailprice, p_partkey""".stripMargin,

    "set_ops" ->
      """WITH a AS (SELECT CAST(c_nationkey AS INTEGER) AS nationkey
        |           FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier)
        |SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM a UNION SELECT nationkey FROM b)
        |UNION ALL
        |SELECT 'union_all', nationkey FROM (SELECT nationkey FROM a UNION ALL SELECT nationkey FROM b)
        |UNION ALL
        |SELECT 'intersect', nationkey FROM (SELECT nationkey FROM a INTERSECT SELECT nationkey FROM b)
        |UNION ALL
        |SELECT 'intersect_all', nationkey FROM (SELECT nationkey FROM a INTERSECT ALL SELECT nationkey FROM b)
        |UNION ALL
        |SELECT 'except', nationkey FROM (SELECT nationkey FROM a EXCEPT SELECT nationkey FROM b)
        |UNION ALL
        |SELECT 'except_all', nationkey FROM (SELECT nationkey FROM a EXCEPT ALL SELECT nationkey FROM b)
        |ORDER BY op, nationkey""".stripMargin,

    "rolling_median" ->
      """SELECT user_id, event_id, CAST(len(vals) AS BIGINT) AS n_win,
        |  list_sort(vals)[(len(vals) + 1) // 2] AS med
        |FROM (
        |  SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS vals
        |  FROM events)
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
