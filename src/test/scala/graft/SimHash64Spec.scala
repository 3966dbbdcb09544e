package graft

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.functions._

/** SimHash64 must be bit-for-bit identical to the 64-unrolled HOF
  * spelling it replaced (majority vote per bit, ties set the bit,
  * null element → 0, empty array → all bits set). */
class SimHash64Spec extends SparkSuite {
  import spark.implicits._

  /** The round-2 spelling: one interpreted aggregate sweep per bit. */
  private def hofSimhash(hs: org.apache.spark.sql.Column) =
    (0 until 64).map { i =>
      when(
        aggregate(hs, lit(0L),
          (acc, h) => acc + shiftright(h, i).bitwiseAND(1L)) * 2
          >= size(hs),
        lit(1L << i)).otherwise(0L)
    }.reduce(_ bitwiseOR _)

  test("simhash64 == HOF spelling on fixture shingle hashes") {
    val hashed = Tables.documents(spark, sf).limit(200)
      .select($"doc_id",
        transform(split($"text", " "), w => F.fnv1a(w)).as("hs"))
    val rows = hashed
      .select(F.simhash64($"hs").as("fast"), hofSimhash($"hs").as("slow"))
      .collect()
    assert(rows.length == 200)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhash64 edge semantics: empty, null element, null input") {
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(5 AS BIGINT))),
        |  (array(CAST(NULL AS BIGINT), CAST(5 AS BIGINT))),
        |  (array(CAST(NULL AS BIGINT))),
        |  (CAST(array() AS ARRAY<BIGINT>)),
        |  (CAST(NULL AS ARRAY<BIGINT>)) AS t(hs)""".stripMargin)
    val rows = edge
      .select(F.simhash64($"hs").as("fast"), hofSimhash($"hs").as("slow"))
      .collect()
    // single element: fingerprint is that element's bits
    assert(rows(0).getLong(0) == 5L)
    // null element poisons to 0 in both spellings
    assert(rows(1).getLong(0) == 0L && rows(1).getLong(1) == 0L)
    assert(rows(2).getLong(0) == 0L && rows(2).getLong(1) == 0L)
    // empty: vacuous majority sets every bit in both spellings
    assert(rows(3).getLong(0) == -1L && rows(3).getLong(1) == -1L)
    // null input: the custom expression is null; the HOF spelling
    // degenerates to 0 — callers never feed null shingle arrays
    assert(rows(4).isNullAt(0))
  }

  test("simhash_neighbors is skew-proof AND equals the brute all-pairs count") {
    val q = SparkEntry.queries("simhash_neighbors")(spark, sf)
    // candidate generation must route through CandidatePairs' bounded
    // bucket aggregation — the naive band self-join would hand one
    // task m² pairs for an m-doc boilerplate band
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("bounded_min_set"),
      s"banded candidates bypass CandidatePairs:\n${plan.take(1200)}")
    // the banded+chunked search must still be exact: every doc's
    // Hamming≤3 neighbor count equals the brute all-pairs scan
    val fps = graft.queries.Pipeline.simhashFrame(spark, sf)
      .select($"doc_id", $"simhash").as[(Long, Long)].collect()
    val brute = fps.map { case (id, h) =>
      id -> fps.count { case (o, oh) =>
        o != id && java.lang.Long.bitCount(h ^ oh) <= 3 }.toLong
    }.sortBy(_._1).toSeq
    val got = q.as[(Long, Long)].collect().toSeq
    assert(got == brute)
  }

  test("simhash64 codegen matches interpreted eval") {
    val hashed = Tables.documents(spark, sf).limit(50)
      .select(transform(split($"text", " "), w => F.fnv1a(w)).as("hs"))
    val cg = hashed.select(F.simhash64($"hs")).collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = hashed.select(F.simhash64($"hs")).collect().map(_.getLong(0))
      assert(cg.toSeq == interp.toSeq)
    }
  }
}
