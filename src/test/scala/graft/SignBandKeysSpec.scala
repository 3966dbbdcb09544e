package graft

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.functions._

/** SignBandKeys must pack exactly the bits the per-plane spelling
  * produced: bit = (left-fold dot of the vector with the plane) >= 0,
  * keys fold bits MSB-first per band. Verified against a plain Scala
  * reimplementation (same IEEE fold order) on fixture vectors, plus
  * codegen/interpreted parity and the degenerate-input contract. */
class SignBandKeysSpec extends SparkSuite {
  import spark.implicits._

  // the same parity-derived ±1 hyperplanes the Pipeline object builds
  private val planes: Seq[Seq[Double]] = (0 until 96).map { h =>
    (0 until 64).map { j =>
      val parity = java.lang.Long.bitCount(graft.functions.Fnv1aCore.hashLong(
        j.toLong, graft.functions.Fnv1aCore.hashLong(h.toLong,
          graft.functions.Fnv1aCore.OffsetBasis))) & 1
      if (parity == 1) 1.0 else -1.0
    }
  }

  private def expectedKeys(v: Array[Double], bands: Int, bits: Int): Seq[Long] =
    (0 until bands).map { b =>
      (0 until bits).foldLeft(0L) { (acc, i) =>
        var s = 0.0
        val p = planes(b * bits + i)
        var j = 0
        while (j < 64) { s += v(j) * p(j); j += 1 }
        acc * 2 + (if (s >= 0) 1L else 0L)
      }
    }

  test("band keys equal the per-plane fold on fixture embeddings") {
    val flat = planes.take(7 * 13).flatten
    val rows = Tables.embeddings(spark, sf).limit(100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .select($"v", F.sign_band_keys($"v", flat, 64, 13).as("keys"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      assert(r.getSeq[Long](1) == expectedKeys(v, 7, 13))
    }
  }

  test("codegen matches interpreted eval") {
    val flat = planes.take(8).flatten
    val df = Tables.embeddings(spark, sf).limit(50)
      .select($"embedding".cast("array<double>").as("v"))
    val cg = df.select(F.sign_band_keys($"v", flat, 64, 8))
      .collect().map(_.getSeq[Long](0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(F.sign_band_keys($"v", flat, 64, 8))
        .collect().map(_.getSeq[Long](0))
      assert(cg.toSeq == interp.toSeq)
    }
  }

  test("degenerate inputs: wrong length / null element -> all-zero keys; null -> null") {
    val flat = planes.take(8).flatten
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>)) AS t(v)""".stripMargin)
    val rows = edge.select(F.sign_band_keys($"v", flat, 64, 8)).collect()
    assert(rows(0).getSeq[Long](0) == Seq(0L))
    assert(rows(1).isNullAt(0))
  }
}
