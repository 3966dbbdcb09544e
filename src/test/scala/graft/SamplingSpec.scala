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

  test("mixture resampling: exact copy counts per row, deterministic") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, null))
      .toDF("k", "s")
    val rates = Map("a" -> 2.0, "b" -> 0.0, "c" -> 1.5)
    def run() = Sampling.resampleMixture(df, $"s", $"k", rates)
      .select($"k", $"copy_no").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run()
    // rate 2.0: exactly two copies, no hash involved
    assert(got.filter(_._1 <= 2) ==
      Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
    // rate 0: stratum b disappears
    assert(!got.exists(_._1 == 3L))
    // rate 1.5: one sure copy + hash-decided extra
    val cCopies = got.count(_._1 == 4L)
    assert(cCopies == 1 || cCopies == 2)
    val extra = Sampling.keyHash32(lit(4L), "mix:v1:") <
      lit(Sampling.fracThreshold32(1.5))
    val wantExtra = df.sparkSession.range(1)
      .select(extra.as("e")).head().getBoolean(0)
    assert(cCopies == (if (wantExtra) 2 else 1))
    // NULL stratum takes the default rate (1.0): exactly one copy
    assert(got.filter(_._1 == 5L) == Set((5L, 0L)))
    assert(run() == got, "resampling must be deterministic")
  }

  test("mixture resampling holds the expected corpus size at scale") {
    val rates = Map("en" -> 0.5, "es" -> 2.0, "de" -> 1.3, "fr" -> 0.0)
    val byLang = Tables.documents(spark, sf)
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.resampleMixture(
      Tables.documents(spark, sf), $"lang", $"doc_id", rates)
    val expected = byLang.map { case (l, c) => c * rates.getOrElse(l, 1.0) }.sum
    val gotN = out.count().toDouble
    // fractional parts are hash-Bernoulli; 4-sigma bound on their sum
    val varSum = byLang.map { case (l, c) =>
      val f = rates.getOrElse(l, 1.0) % 1.0; c * f * (1 - f)
    }.sum
    assert(math.abs(gotN - expected) <= 4 * math.sqrt(varSum) + 1e-9,
      s"got $gotN expected $expected")
  }

  test("temperature rates: alpha=1 identity, alpha=0 uniform, size-preserving") {
    val counts = Map("en" -> 800L, "es" -> 150L, "zh" -> 50L)
    val total = counts.values.sum.toDouble
    val id = Sampling.temperatureRates(counts, 1.0)
    assert(id.values.forall(r => math.abs(r - 1.0) < 1e-12))
    val uni = Sampling.temperatureRates(counts, 0.0)
    // uniform mixture: every stratum's expected share is total/k
    counts.foreach { case (k, c) =>
      assert(math.abs(uni(k) * c - total / counts.size) < 1e-6) }
    // any alpha preserves expected corpus size
    for (a <- Seq(0.0, 0.3, 0.7, 1.0)) {
      val r = Sampling.temperatureRates(counts, a)
      val size = counts.map { case (k, c) => c * r(k) }.sum
      assert(math.abs(size - total) < 1e-6, s"alpha=$a size=$size")
    }
    // flattening is monotone: rarer strata get larger rates as alpha drops
    val mid = Sampling.temperatureRates(counts, 0.5)
    assert(mid("zh") > mid("es") && mid("es") > mid("en"))
  }
}
