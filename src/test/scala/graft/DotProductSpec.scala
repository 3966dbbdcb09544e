package graft

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.functions._

/** DotProductD must be bit-identical to the interpreted HOF spelling
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — the oracle-parity
  * contract every embedding query leans on. */
class DotProductSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("dotd == HOF left-fold bit-for-bit on fixture embeddings") {
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(F.dotd(col("a.v"), col("b.v")).as("fast"),
        hofDot(col("a.v"), col("b.v")).as("slow"),
        F.dotd(col("a.v"), col("a.v")).as("fastn"),
        hofDot(col("a.v"), col("a.v")).as("slown"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("dotd null semantics: unequal lengths and null elements -> null") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (Seq(1.0), Seq(3.0, 4.0))).toDF("a", "b")
    val out = df.select(F.dotd($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    val withNull = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) a, array(1.0D, 2.0D) b")
    assert(withNull.select(F.dotd(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("dotd interpreted eval matches codegen") {
    val emb = Tables.embeddings(spark, sf)
      .select($"embedding".cast("array<double>").as("v")).limit(50)
    val cg = emb.select(F.dotd($"v", $"v")).collect().map(_.getDouble(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = emb.select(F.dotd($"v", $"v")).collect().map(_.getDouble(0))
      assert(cg.toSeq == interp.toSeq)
    }
  }
}
