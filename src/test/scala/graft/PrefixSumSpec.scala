package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-phase offset prefix-sum must equal the naive
  * one-task window spelling exactly — grouped and global, under
  * repartitioning, with null costs — and must plan WITHOUT the global
  * sort it replaces. */
class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(500) { i =>
      (s"g${rnd.nextInt(4)}", i.toLong,
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(50).toLong))
    }
  }

  test("grouped running sum equals the naive per-group ROWS window") {
    val df = rows.toDF("g", "id", "v").repartition(13)
    val got = PrefixSum.withRunningSum(df, Seq(col("g")), col("id"),
        coalesce(col("v"), lit(0L)), "cum")
      .select("g", "id", "cum").as[(String, Long, Long)].collect().sorted
    val naive = df.withColumn("cum",
        sum(coalesce(col("v"), lit(0L))).over(
          Window.partitionBy(col("g")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "id", "cum").as[(String, Long, Long)].collect().sorted
    assert(got.sameElements(naive))
  }

  test("global (no groups) running sum equals the naive global window") {
    val df = rows.toDF("g", "id", "v").repartition(7)
    val got = PrefixSum.withRunningSum(df, Seq.empty, col("id"),
        coalesce(col("v"), lit(0L)), "cum")
      .select("id", "cum").as[(Long, Long)].collect().sorted
    val naive = df.withColumn("cum",
        sum(coalesce(col("v"), lit(0L))).over(
          Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().sorted
    assert(got.sameElements(naive))
  }

  test("NULL group keys form a real group and are never dropped") {
    val df = rows.map { case (g, i, v) =>
      (if (i % 5 == 0) null else g, i, v) }.toDF("g", "id", "v")
      .repartition(9)
    val got = PrefixSum.withRunningSum(df, Seq(col("g")), col("id"),
        coalesce(col("v"), lit(0L)), "cum")
      .select("g", "id", "cum").as[(Option[String], Long, Long)]
      .collect().sorted
    assert(got.length == rows.length, "NULL-group rows dropped")
    val naive = df.withColumn("cum",
        sum(coalesce(col("v"), lit(0L))).over(
          Window.partitionBy(col("g")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "id", "cum").as[(Option[String], Long, Long)]
      .collect().sorted
    assert(got.sameElements(naive))
  }

  test("original columns pass through unchanged") {
    val df = rows.toDF("g", "id", "v")
    val out = PrefixSum.withRunningSum(df, Seq(col("g")), col("id"),
      coalesce(col("v"), lit(0L)), "cum")
    assert(out.columns.toSeq == Seq("g", "id", "v", "cum"))
    assert(out.drop("cum").as[(String, Long, Option[Long])].collect().sorted
      .sameElements(rows.map { case (g, i, v) => (g, i, Option(v).map(_.longValue)) }.sorted))
  }

  test("grouped plan has NO SinglePartition stage at all") {
    val out = PrefixSum.withRunningSum(rows.toDF("g", "id", "v"),
      Seq(col("g")), col("id"), coalesce(col("v"), lit(0L)), "cum")
    // both the data cumsum window (group, pid) and the offset window
    // (group) are hash-partitioned — nothing in the grouped plan may
    // collapse to one task
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"one-task stage leaked:\n${plan.take(2000)}")
  }
}
