package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: two tables bucketed+sorted by the same
  * key into the same bucket count must join with NO shuffle exchange
  * and NO per-task sort — and produce exactly the rows of the plain
  * join. This is the write-once/join-free layout lever for recurring
  * fact⋈fact joins at scale. */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed join plans without exchange or sort, same result") {
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
    val items = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    Bucketing.writeBucketed(orders, "bspec_orders", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(items, "bspec_items", 8, Seq("o_orderkey"))
    try withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        Bucketing.SortedScanConf -> "true") {
      val joined = Bucketing.table(spark, "bspec_orders")
        .join(Bucketing.table(spark, "bspec_items"), "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n${p.take(1200)}")
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n${p.take(1500)}")
      assert(!"(?m)^\\s*[+:]- Sort ".r.findFirstIn(p).isDefined,
        s"bucketed join still sorts (sortBy metadata unused):\n${p.take(1500)}")
      // identical result to the unbucketed join
      val got = joined.agg(count(lit(1)), sum($"l_quantity"))
        .as[(Long, Double)].head()
      val want = orders.join(items, "o_orderkey")
        .agg(count(lit(1)), sum($"l_quantity"))
        .as[(Long, Double)].head()
      assert(got == want)
    } finally {
      Bucketing.drop(spark, "bspec_orders")
      Bucketing.drop(spark, "bspec_items")
    }
  }

  test("bucketId matches the bucket-file suffixes a bucketed write emits") {
    val orders = Tables.orders(spark, sf).select($"o_orderkey")
    Bucketing.writeBucketed(orders, "bspec_map", 8, Seq("o_orderkey"))
    try {
      // every row must sit in the file whose _NNNNN suffix equals
      // bucketId(key, 8) — this is the expression bucket_layout
      // oracle-checks, so the driver-gated arithmetic IS the layout
      val mismatches = Bucketing.table(spark, "bspec_map")
        .select($"o_orderkey",
          regexp_extract(input_file_name(), "_(\\d{5})(?:\\.|c)", 1)
            .cast("int").as("file_bucket"),
          Bucketing.bucketId($"o_orderkey", 8).as("expr_bucket"))
        .filter($"file_bucket" =!= $"expr_bucket")
        .count()
      assert(mismatches == 0L)
    } finally Bucketing.drop(spark, "bspec_map")
  }

  test("mismatched bucket counts fall back to a shuffled join") {
    val orders = Tables.orders(spark, sf).select($"o_orderkey")
    Bucketing.writeBucketed(orders, "bspec_a", 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(orders, "bspec_b", 6, Seq("o_orderkey"))
    try withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = Bucketing.table(spark, "bspec_a")
        .join(Bucketing.table(spark, "bspec_b"), "o_orderkey")
        .queryExecution.executedPlan.toString
      // one side still avoids its exchange; the other must shuffle
      assert(p.contains("Exchange"), s"expected a shuffle:\n${p.take(1200)}")
    } finally {
      Bucketing.drop(spark, "bspec_a")
      Bucketing.drop(spark, "bspec_b")
    }
  }
}
