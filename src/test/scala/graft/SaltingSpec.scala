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
}
