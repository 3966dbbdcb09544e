package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Core relational queries: scan / filter / project / aggregate / sort.
  *
  * Realizes SURVEY.md §2 rows S1, F1–F4, G1, G3, O1. The flagship
  * `pricing_summary` is a TPC-H-Q1-style aggregation: a pushed-down
  * timestamp filter, a low-cardinality groupBy (partial → shuffle →
  * final HashAggregate — 6 groups regardless of input size, so the
  * shuffle is O(partitions), not O(rows), at any scale), and a global
  * sort of a tiny result.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "pricing_summary" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "filter_project" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // F1/F2/F4: conjunctive predicates + derived projection; the
      // filter and the 4-column read schema both reach the Parquet scan.
      Tables.lineitem(s, dir)
        .filter($"l_quantity" > 45 && $"l_discount" <= 0.02 &&
          $"l_returnflag" =!= "A")
        .select(
          $"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1) - $"l_discount")).as("net_price"),
          $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "global_sort" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // O1: total order via range-partitioned sort (samples bounds, no
      // single-node sort at scale).
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
    }),
  )

  val oracle: Map[String, String] = Map(
    "pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS net_price,
        |  l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount <= 0.02 AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "global_sort" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
  )
}
