package graft

import graft.functions.{AHash64, GraftFunctions => F}
import org.apache.spark.sql.functions._

/** The L105 perceptual fingerprint: golden vectors (independently
  * computed from the published aHash recipe), interpreted-eval ==
  * codegen parity, the empty-payload NULL, and the planted probe
  * Hamming geometry the phash_neardup row relies on. */
class AHashSpec extends SparkSuite {
  import spark.implicits._

  private def evalOf(bytes: Array[Byte]): Any =
    AHash64(org.apache.spark.sql.catalyst.expressions.Literal(bytes))
      .eval(null)

  test("golden vectors and interpreted == codegen") {
    val base =
      "the quick brown fox jumps over the lazy dog while zebras graze " * 10
    val cases = Seq(
      base.getBytes("UTF-8") -> -4899919926183068471L,
      "abc".getBytes("UTF-8") -> -4194304L,
      (0 until 64).map(_.toByte).toArray -> -4294967296L)
    cases.foreach { case (bytes, want) =>
      assert(evalOf(bytes) == want, s"eval of ${bytes.length} bytes")
    }
    // codegen path (whole-stage projection) agrees with eval
    val df = cases.map(_._1).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("id", "payload")
    val got = df.select($"id", F.ahash64($"payload").as("h"))
      .orderBy($"id").as[(Long, Long)].collect().map(_._2).toSeq
    assert(got == cases.map(_._2))
    // SQL registration
    F.registerSql(spark)
    df.createOrReplaceTempView("t_ahash")
    val sqlGot = spark.sql(
      "SELECT ahash64(payload) FROM t_ahash ORDER BY id")
      .as[Long].collect().toSeq
    assert(sqlGot == cases.map(_._2))
  }

  test("empty payload hashes to NULL; probe Hamming geometry holds") {
    assert(evalOf(Array.emptyByteArray) == null)
    // the phash_neardup probes: copy at 0, one-byte splice at 1,
    // two-byte splice at 2, the control far outside the τ=3 cut
    val base =
      "the quick brown fox jumps over the lazy dog while zebras graze " * 10
    val n = base.length
    def splice(t: String, p: Int) =
      t.substring(0, p) + " " + t.substring(p + 1)
    val c1 = splice(base, (10 * n) / 64)
    val c2 = splice(c1, (32 * n) / 64)
    def h(t: String) = evalOf(t.getBytes("UTF-8")).asInstanceOf[Long]
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(base), h(base)) == 0)
    assert(ham(h(base), h(c1)) == 1)
    assert(ham(h(base), h(c2)) == 2)
    val control = ("completely different payload content with other " +
      "words entirely here " * 10).take(n)
    assert(ham(h(base), h(control)) > 3)
  }

  test("a planted identical-payload hot band pairs completely through " +
      "the CandidatePairs chunk path — no task owns the O(m²)") {
    // byte-identical payloads (empty/placeholder assets — the NORMAL
    // degenerate crawl case) all share every band value; the
    // phash_neardup pairing must therefore ride the skew guard. This
    // is the query's own shape: ahash64 → 4×16-bit bands →
    // CandidatePairs → bit_count verify.
    val m = 2000
    val docs = (0 until m).map(i => (i.toLong, "identical payload body"))
      .toDF("doc_id", "text")
    val hashes = docs
      .select($"doc_id", F.ahash64($"text".cast("binary")).as("h"))
      .filter($"h".isNotNull)
    val banded = hashes.select($"doc_id",
      posexplode(array((0 to 3).map(bb =>
        shiftrightunsigned($"h", bb * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band_no", "band_val")))
    val pairs = graft.operators.CandidatePairs
      .fromBuckets(banded, Seq("band_no", "band_val"), "doc_id",
        "doc_a", "doc_b")
      .join(hashes.select($"doc_id".as("doc_a"), $"h".as("ha")), Seq("doc_a"))
      .join(hashes.select($"doc_id".as("doc_b"), $"h".as("hb")), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        bit_count($"ha".bitwiseXOR($"hb")).cast("long").as("hamming"))
      .filter($"hamming" <= 3L)
    // complete pair set at Hamming 0, exactly once each
    assert(pairs.count() == m.toLong * (m - 1) / 2)
    assert(pairs.filter($"hamming" =!= 0L).count() == 0L)
    // the hot-band chunk branch is live (m = 2000 > cap = 1024): its
    // role-join columns appear in the executed plan, so per-task pair
    // work is ≤ cap² regardless of how many payloads are identical
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("__cl") && plan.contains("__cr"),
      s"expected the CandidatePairs chunk branch:\n${plan.take(2000)}")
  }
}
