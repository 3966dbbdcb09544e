package graft

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.functions._

/** MinHashSignature must be value-identical to the HOF spelling
  * (per-lane array_min over fnv1a_seeded) in every case the pipeline
  * can produce: plain arrays, null elements, empty arrays. */
class MinHashSignatureSpec extends SparkSuite {
  import spark.implicits._

  private val seeds: Seq[Long] =
    Seq(0x9e3779b97f4a7c15L, -42L, 7L, 0L, Long.MinValue)

  private def hof(hs: org.apache.spark.sql.Column) =
    array(seeds.map(seed =>
      array_min(transform(hs, h => F.fnv1a_seeded(seed, h)))): _*)

  test("one-pass signature equals the per-lane HOF spelling") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong()))
    val df = data.toDF("hs")
    val rows = df.select(
      F.minhash_sig(seeds, $"hs").as("fast"), hof($"hs").as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("null elements are skipped; all-null/empty input yields null lanes") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(5 AS BIGINT), CAST(NULL AS BIGINT), CAST(-3 AS BIGINT))),
        |  (array(CAST(NULL AS BIGINT))),
        |  (array()) AS t(hs)""".stripMargin)
    val rows = df.select(
      F.minhash_sig(seeds, $"hs".cast("array<bigint>")).as("fast"),
      hof($"hs".cast("array<bigint>")).as("slow")).collect()
    rows.foreach { r =>
      val fast = r.getSeq[Any](0)
      val slow = r.getSeq[Any](1)
      assert(fast == slow, s"fast=$fast slow=$slow")
    }
    assert(rows(1).getSeq[Any](0).forall(_ == null))
    assert(rows(2).getSeq[Any](0).forall(_ == null))
  }

  test("interpreted eval matches codegen") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(-9L)).toDF("hs")
    val cg = df.select(F.minhash_sig(seeds, $"hs")).collect()
      .map(_.getSeq[Long](0))
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
      "spark.sql.codegen.wholeStage" -> "false") {
      val interp = df.select(F.minhash_sig(seeds, $"hs")).collect()
        .map(_.getSeq[Long](0))
      assert(cg.toSeq == interp.toSeq)
    }
  }
}
