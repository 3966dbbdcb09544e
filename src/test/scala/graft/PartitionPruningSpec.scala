package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning (SURVEY §4): a partitioned fact joined on
  * its partition column against a filtered dimension must plan a
  * runtime pruning subquery — at 100 TB this is the difference between
  * scanning one year and scanning all of them. */
class PartitionPruningSpec extends SparkSuite {

  test("join against filtered dim dynamically prunes fact partitions") {
    import spark.implicits._
    val root = "/tmp/graft_dpp/orders_by_year"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft_dpp"))
    Tables.orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .write.partitionBy("o_year").parquet(root)

    // the dim must carry a visible selective predicate on a scan —
    // a filtered literal relation constant-folds and DPP never fires
    val dimRoot = "/tmp/graft_dpp/years"
    Tables.orders(spark, sf).select(year($"o_orderdate").as("y"))
      .distinct().write.parquet(dimRoot)
    val fact = spark.read.parquet(root)
    val dim = spark.read.parquet(dimRoot).filter($"y" <= 1996)
    val joined = fact
      .join(dim, $"o_year" === $"y")
      .groupBy($"o_year").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in:\n${plan.take(2000)}")

    val got = joined.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = Tables.orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .filter($"o_year".isin(1995, 1996))
      .groupBy($"o_year").agg(count(lit(1)))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
