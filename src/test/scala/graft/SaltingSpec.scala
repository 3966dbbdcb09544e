package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSuite {

  test("skew-safe count distinct equals the plain aggregate") {
    val o = Tables.orders(spark, sf)
    val salted = Salting.skewSafeCountDistinct(
      o.select(col("o_orderpriority"), col("o_custkey").cast("string").as("v")),
      Seq("o_orderpriority"), "v", salts = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salt lanes partition values disjointly (no double counting)") {
    val df = spark.range(0, 1000).selectExpr("CAST(id % 10 AS STRING) AS k",
      "CAST(id % 37 AS STRING) AS v")
    val salted = Salting.skewSafeCountDistinct(df, Seq("k"), "v", salts = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted.values.forall(_ == 37 || salted.values.forall(_ <= 37)))
    val plain = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("AQE splits the skewed partition of a shuffle join (skew=true)") {
    // The runtime half of the skew story (Salting is the static half
    // for operators AQE can't touch): a planted hot key must make
    // OptimizeSkewedJoin mark the SMJ and split the partition — the
    // mechanism the 100 TB contract leans on for plain equi-joins.
    import org.apache.spark.sql.functions._
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hot = spark.range(0, 60000)
        .select(lit(1L).as("k"), col("id").as("payload"))
      val rest = spark.range(0, 500)
        .select((col("id") + 2).as("k"), col("id").as("payload"))
      val right = spark.range(0, 3000)
        .select((col("id") % 600 + 1).as("k"), col("id").as("r"))
      val j = hot.unionAll(rest).join(right, "k")
      // execute THIS plan (df.count() would run a column-pruned twin
      // and leave j's adaptive plan unfinalized)
      val n = j.queryExecution.toRdd.count()
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ in the final adaptive plan:\n${plan.take(2000)}")
    }
  }
}
