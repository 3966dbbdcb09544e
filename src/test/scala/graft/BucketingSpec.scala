package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the plan must contain NO Exchange on
  * either side — the shuffle is paid once at write time, not per
  * join. */
class BucketingSpec extends SparkSuite {

  test("bucketed+sorted tables sort-merge join with zero shuffles") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "b_lineitem", "o_orderkey", 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness: same row count as the plain join
      val expected = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
