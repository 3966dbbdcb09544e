package graft

import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Properties of the dynamic-seed FNV-1a expression and the SQL
  * registration of the seeded family. */
class Fnv1aSeededSpec extends SparkSuite with TableDrivenPropertyChecks {
  import spark.implicits._

  test("dynamic seed equals static seed for arbitrary seeds/values") {
    val seeds = Seq(Fnv1aCore.OffsetBasis, 0L, -1L, 42L, Long.MinValue)
    val data = Seq("", "a", "deadbeef", "key agg row").toDF("s")
    seeds.foreach { seed =>
      val rows = data.select(
        F.fnv1a_seeded(seed, $"s").as("stat"),
        F.fnv1a_seeded_dyn(lit(seed), $"s").as("dyn")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    }
  }

  test("seeding with OffsetBasis reproduces the unseeded hash") {
    val data = Seq("a", "deadbeef").toDF("s")
    val rows = data.select(F.fnv1a($"s").as("h"),
      F.fnv1a_seeded_dyn(lit(Fnv1aCore.OffsetBasis), $"s").as("hs")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("distinct seeds give distinct hash-family members") {
    val data = Seq("same input").toDF("s")
    val hashes = (0L until 16L).map(seed =>
      data.select(F.fnv1a_seeded_dyn(lit(seed), $"s")).collect().head.getLong(0))
    assert(hashes.distinct.length == hashes.length)
  }

  test("SQL registration exposes fnv1a and fnv1a_seeded") {
    F.registerSql(spark)
    Seq("x").toDF("s").createOrReplaceTempView("t_fnv")
    val r = spark.sql(
      """SELECT fnv1a(s) AS a, fnv1a_seeded(CAST(-3750763034362895579 AS BIGINT), s) AS b
        |FROM t_fnv""".stripMargin).collect().head
    // -3750763034362895579 == OffsetBasis as signed
    assert(r.getLong(0) == r.getLong(1))
  }

  test("SQL registration exposes dotd") {
    F.registerSql(spark)
    val r = spark.sql(
      "SELECT dotd(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head
    assert(r.getDouble(0) == 32.0)
  }

  test("Graft.enable wires SQL functions and the as-of strategy in one call") {
    Graft.enable(spark)
    Graft.enable(spark) // idempotent
    assert(spark.sql("SELECT fnv1a('x') = fnv1a('x')").collect().head.getBoolean(0))
    assert(spark.experimental.extraStrategies.count(
      _ == graft.plans.GraftStrategies) == 1)
    assert(spark.experimental.extraOptimizations.count(
      _ == graft.plans.PushFilterThroughAsOfJoin) == 1)
  }
}
