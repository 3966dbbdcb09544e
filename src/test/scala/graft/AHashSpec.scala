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
}
