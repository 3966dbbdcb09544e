package graft

import graft.operators.Privacy

/** Mechanism-level evidence for the DP release operator — the fixture
  * oracle proves engine parity; these prove the MECHANISM properties
  * the privacy story depends on. */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"source")

  test("the release is deterministic per (key, salt): re-running " +
      "republishes byte-identical values (release-once semantics)") {
    val a = Privacy.dpCounts(docs, "source", 0.5)
      .orderBy($"source").collect().toSeq
    val b = Privacy.dpCounts(docs, "source", 0.5)
      .orderBy($"source").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("a larger epsilon shrinks every key's noise magnitude — the " +
      "budget knob acts per key, monotonically (same uniform, " +
      "smaller scale)") {
    def noise(eps: Double) = Privacy.dpCounts(docs, "source", eps)
      .select($"source", $"noise_micro")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val loose = noise(0.25) // scale 4
    val tight = noise(2.0)  // scale 0.5
    assert(loose.keySet == tight.keySet && loose.nonEmpty)
    // |noise| scales by exactly 1/eps for the SAME keyed uniform, so
    // every key's magnitude must shrink (up to the micro rounding)
    loose.foreach { case (k, nl) =>
      assert(math.abs(tight(k)) <= math.abs(nl),
        s"key $k: eps=2.0 noise $nl vs eps=0.25 noise ${tight(k)}")
    }
  }

  test("the noise distribution is two-sided: both signs occur across " +
      "the key domain (the draw is not accidentally folded)") {
    val ns = Privacy.dpCounts(docs, "source", 0.5)
      .select($"noise_micro").as[Long].collect()
    assert(ns.exists(_ > 0L) && ns.exists(_ < 0L), ns.toSeq.toString)
  }

  test("a non-positive epsilon is refused") {
    intercept[IllegalArgumentException](
      Privacy.dpCounts(docs, "source", 0.0))
  }
}
