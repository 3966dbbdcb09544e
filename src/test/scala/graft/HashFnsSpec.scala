package graft

import graft.functions.IndependentHashes
import org.apache.spark.sql.functions._

/** X9 verification for the non-cryptographic hash family. DuckDB has no
  * compatible xxhash64 / murmur3 / crc32, so the driver-side oracle
  * interpolates values from [[graft.functions.IndependentHashes]]
  * (public-spec reimplementations, main code since round 8 so the
  * Verify dump can use them) — this spec is the independent check ON
  * that oracle source: pinned standard vectors plus boundary-length
  * strings exercising every tail path, compared against Spark's
  * builtins over the fixture corpus.
  */
class HashFnsSpec extends SparkSuite {
  import spark.implicits._

  // every tail-length class: 0..40 covers <32-byte, 8/4/1-byte tails
  private val boundaryStrings: Seq[String] =
    (0 to 40).map("abcdefghijklmnopqrstuvwxyz0123456789ABCD".take(_)) ++
      Seq("123456789", "the quick brown fox jumps over the lazy dog",
        "data engine", "éü世界") // non-ASCII UTF-8

  test("crc32 standard check value") {
    assert(IndependentHashes.crc32("123456789".getBytes("UTF-8"))
      == 0xCBF43926L)
  }

  test("xxhash64/murmur3/crc32 match independent impls on boundary strings") {
    val df = boundaryStrings.toDF("s")
      .select($"s", xxhash64($"s").as("xxh"),
        hash($"s").as("mm"), crc32($"s").as("crc"))
    df.collect().foreach { r =>
      val b = r.getString(0).getBytes("UTF-8")
      assert(r.getLong(1) == IndependentHashes.xxh64(b, 42L),
        s"xxhash64 mismatch for len ${b.length}")
      assert(r.getInt(2) == IndependentHashes.murmur3x86_32(b, 42),
        s"murmur3 mismatch for len ${b.length}")
      assert(r.getLong(3) == IndependentHashes.crc32(b),
        s"crc32 mismatch for len ${b.length}")
    }
  }

  test("hash_fns_native columns verified over the fixture corpus") {
    val out = SparkEntry.queries("hash_fns_native")(spark, sf)
    val joined = out.join(Tables.documents(spark, sf), "doc_id")
      .select($"doc_id", $"xxh64", $"murmur3", $"crc32", $"text")
      .collect()
    assert(joined.length == 500)
    joined.foreach { r =>
      val b = r.getString(4).getBytes("UTF-8")
      assert(r.getLong(1) == IndependentHashes.xxh64(b, 42L))
      assert(r.getLong(2) == IndependentHashes.murmur3x86_32(b, 42).toLong)
      assert(r.getLong(3) == IndependentHashes.crc32(b))
    }
  }

  test("hash_fns_native oracle SQL interpolates the independent values") {
    SparkEntry.queries("hash_fns_native")(spark, sf)
    val sql = graft.queries.Scalars.oracleFor(sf)("hash_fns_native")
    // spot-check: the VALUES rows carry IndependentHashes output, not
    // engine output — recompute one known doc's triple and find it.
    val doc = Tables.documents(spark, sf).select($"doc_id", $"text")
      .orderBy($"doc_id").limit(1).collect().head
    val b = doc.getString(1).getBytes("UTF-8")
    val row = s"(${doc.getLong(0)}, ${IndependentHashes.xxh64(b, 42L)}, " +
      s"${IndependentHashes.murmur3x86_32(b, 42).toLong}, " +
      s"${IndependentHashes.crc32(b)})"
    assert(sql.contains(row), s"oracle SQL missing expected row $row")
  }
}
