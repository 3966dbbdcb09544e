package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic hash sampling: retry-stable, partitioning-invariant,
  * uniform, and salt-decorrelated — the properties that make it the
  * sampling primitive a 100 TB pipeline can re-run safely. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).select($"doc_id")
  private lazy val n = docs.count().toDouble

  test("sample is deterministic and invariant under repartitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSample(df, col("doc_id"), 0.5)
        .select($"doc_id").as[Long].collect().toSet
    val a = ids(docs)
    assert(a == ids(docs), "re-run must select identical rows")
    assert(a == ids(docs.repartition(7)),
      "selection must not depend on physical layout")
  }

  test("sampled fraction is binomially plausible and salts decorrelate") {
    val p = 0.5
    val a = Sampling.hashSample(docs, col("doc_id"), p, "saltA:")
      .select($"doc_id").as[Long].collect().toSet
    // ~4 sigma binomial tolerance around p
    val tol = 4 * math.sqrt(p * (1 - p) / n)
    assert(math.abs(a.size / n - p) < tol, s"fraction ${a.size / n}")
    val b = Sampling.hashSample(docs, col("doc_id"), p, "saltB:")
      .select($"doc_id").as[Long].collect().toSet
    // independent samples overlap near p^2, not near p
    val overlap = (a & b).size / n
    assert(math.abs(overlap - p * p) < 2 * tol, s"overlap $overlap")
  }

  test("null keys are kept, deterministic, and consistent across primitives") {
    // null-key policy: rows are never silently dropped — a NULL key
    // hashes via the sentinel, so fraction=1.0 is the identity sample
    // and hashSample/splitLabel agree on where null-key rows go
    val df = Seq(Some(1L), Some(2L), None, None)
      .toDF("k")
    assert(Sampling.hashSample(df, col("k"), 1.0).count() == 4,
      "fraction=1.0 must keep null-key rows")
    assert(Sampling.hashSample(df, col("k"), 0.0).count() == 0)
    // all null-key rows share one hash → one side of any threshold
    val nullHashes = df.filter($"k".isNull)
      .select(Sampling.keyHash32(col("k"), "sample:").as("h"))
      .as[Long].collect().toSet
    assert(nullHashes.size == 1, s"null keys must hash alike: $nullHashes")
    // splitLabel routes null-key rows by the SAME hash as hashSample:
    // the label is whichever band the sentinel hash falls in, not a
    // hardcoded bucket
    val h = nullHashes.head
    val expected =
      if (h < math.floor(0.8 * 4294967296L).toLong) "train"
      else if (h < math.floor(0.9 * 4294967296L).toLong) "valid"
      else "test"
    val labels = df.filter($"k".isNull)
      .select(Sampling.splitLabel($"k", 0.8, 0.1, "sample:").as("s"))
      .as[String].collect().toSet
    assert(labels == Set(expected), s"labels $labels != $expected")
  }

  test("split labels are exhaustive, disjoint, and near the fractions") {
    val counts = docs
      .withColumn("split", Sampling.splitLabel($"doc_id", 0.8, 0.1))
      .groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "valid", "test")))
    assert(counts.values.sum == n.toLong, "every row gets exactly one label")
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.8) < 0.1)
    assert(math.abs(counts.getOrElse("valid", 0L) / n - 0.1) < 0.06)
  }
}
