package graft

import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** X9 verification for the non-cryptographic hash family. DuckDB has no
  * compatible xxhash64 / murmur3 / crc32, so these columns cannot be
  * oracle-gated; instead each is checked against an INDEPENDENT
  * implementation over the fixture corpus plus boundary-length strings
  * that exercise every tail path:
  *  - crc32   vs java.util.zip.CRC32 (zlib's CRC-32) + the standard
  *    check value crc32("123456789") = 0xCBF43926;
  *  - xxhash64 vs an in-spec reimplementation of public XXH64
  *    (xxhash.com algorithm spec; Spark's documented seed 42);
  *  - hash    vs an in-spec reimplementation of Murmur3 x86_32
  *    (Austin Appleby's public algorithm; seed 42, with Spark's
  *    documented per-SIGNED-byte tail processing).
  */
class HashFnsSpec extends SparkSuite {
  import spark.implicits._

  // --- XXH64 per the public spec (little-endian reads) ---
  private object XXH64Ref {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    private def rotl(x: Long, r: Int) = java.lang.Long.rotateLeft(x, r)
    private def round(acc: Long, in: Long) = rotl(acc + in * P2, 31) * P1
    private def merge(h: Long, acc: Long) = (h ^ round(0L, acc)) * P1 + P4
    def hash(data: Array[Byte], seed: Long): Long = {
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val len = data.length
      var i = 0
      var h = 0L
      if (len >= 32) {
        var a1 = seed + P1 + P2; var a2 = seed + P2
        var a3 = seed; var a4 = seed - P1
        while (i + 32 <= len) {
          a1 = round(a1, bb.getLong(i)); a2 = round(a2, bb.getLong(i + 8))
          a3 = round(a3, bb.getLong(i + 16)); a4 = round(a4, bb.getLong(i + 24))
          i += 32
        }
        h = rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
        h = merge(h, a1); h = merge(h, a2); h = merge(h, a3); h = merge(h, a4)
      } else h = seed + P5
      h += len
      while (i + 8 <= len) {
        h = rotl(h ^ round(0L, bb.getLong(i)), 27) * P1 + P4; i += 8
      }
      if (i + 4 <= len) {
        h = rotl(h ^ ((bb.getInt(i) & 0xFFFFFFFFL) * P1), 23) * P2 + P3; i += 4
      }
      while (i < len) {
        h = rotl(h ^ ((data(i) & 0xFF).toLong * P5), 11) * P1; i += 1
      }
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
      h
    }
  }

  // --- Murmur3 x86_32, Spark tail convention (per-signed-byte mix) ---
  private def murmur3Spark(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var h = seed
    var i = 0
    def mix(k0: Int): Unit = {
      var k = k0
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    }
    while (i + 4 <= data.length) { mix(bb.getInt(i)); i += 4 }
    while (i < data.length) { mix(data(i).toInt); i += 1 } // SIGNED byte
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  private def crc32Ref(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(data); c.getValue
  }

  // every tail-length class: 0..40 covers <32-byte, 8/4/1-byte tails
  private val boundaryStrings: Seq[String] =
    (0 to 40).map("abcdefghijklmnopqrstuvwxyz0123456789ABCD".take(_)) ++
      Seq("123456789", "the quick brown fox jumps over the lazy dog",
        "data engine", "éü世界") // non-ASCII UTF-8

  test("crc32 standard check value") {
    assert(crc32Ref("123456789".getBytes("UTF-8")) == 0xCBF43926L)
  }

  test("xxhash64/murmur3/crc32 match independent impls on boundary strings") {
    val df = boundaryStrings.toDF("s")
      .select($"s", xxhash64($"s").as("xxh"),
        hash($"s").as("mm"), crc32($"s").as("crc"))
    df.collect().foreach { r =>
      val b = r.getString(0).getBytes("UTF-8")
      assert(r.getLong(1) == XXH64Ref.hash(b, 42L),
        s"xxhash64 mismatch for len ${b.length}")
      assert(r.getInt(2) == murmur3Spark(b, 42),
        s"murmur3 mismatch for len ${b.length}")
      assert(r.getLong(3) == crc32Ref(b),
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
      assert(r.getLong(1) == XXH64Ref.hash(b, 42L))
      assert(r.getLong(2) == murmur3Spark(b, 42).toLong)
      assert(r.getLong(3) == crc32Ref(b))
    }
  }
}
