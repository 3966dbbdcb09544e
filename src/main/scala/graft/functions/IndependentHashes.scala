package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Independent reimplementations of the non-cryptographic hash family
  * Spark exposes as `xxhash64` / `hash` (Murmur3 x86_32) / `crc32` —
  * written from the PUBLIC algorithm specs (xxhash.com's XXH64 spec;
  * Austin Appleby's Murmur3, with Spark's documented per-SIGNED-byte
  * tail convention; zlib's CRC-32 via java.util.zip), never from
  * Spark's own code paths.
  *
  * These exist for EVIDENCE, not execution: the `hash_fns_native`
  * oracle interpolates values computed here into DuckDB SQL (DuckDB's
  * `hash` is a different algorithm, so the engine's columns have no
  * native SQL twin), and HashFnsSpec checks them against pinned
  * vectors (incl. the CRC-32 standard check value
  * crc32("123456789") = 0xCBF43926). Nothing here runs in a query
  * plan — query-side hashing is Spark's codegen'd builtins.
  */
object IndependentHashes {

  /** XXH64 per the public spec (little-endian lane reads). */
  def xxh64(data: Array[Byte], seed: Long): Long = {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    def rotl(x: Long, r: Int) = java.lang.Long.rotateLeft(x, r)
    def round(acc: Long, in: Long) = rotl(acc + in * P2, 31) * P1
    def merge(h: Long, acc: Long) = (h ^ round(0L, acc)) * P1 + P4
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

  /** Murmur3 x86_32 with Spark's tail convention: trailing bytes are
    * each mixed as a full SIGN-EXTENDED int round (Spark's documented
    * divergence from the canonical k1-accumulation tail). */
  def murmur3x86_32(data: Array[Byte], seed: Int): Int = {
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
    while (i < data.length) { mix(data(i).toInt); i += 1 }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** zlib CRC-32 (the polynomial Spark's `crc32` implements), as an
    * unsigned 32-bit value in a long. */
  def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(data); c.getValue
  }
}
