package graft.functions

/** 64-bit FNV-1a core, byte-at-a-time, seedable.
  *
  * Carries the reference's hash identity
  * (`/root/reference/src/algo/fnv1a.rs:4-42`): state starts at
  * `OFFSET_BASIS` (fnv1a.rs:15), each byte does XOR then wrapping
  * multiply by `FNV_PRIME` (fnv1a.rs:18,38-41). The reference widens to
  * u128 to wrap (fnv1a.rs:40); JVM `Long` arithmetic wraps natively, so
  * `(state ^ b) * PRIME` is equivalent mod 2^64.
  *
  * Typed encodings follow the `FNV1aIterator` impls (fnv1a.rs:44-95):
  * integers hash their little-endian bytes (fnv1a.rs:68-79), booleans
  * hash Java's `Boolean.hashCode()` constants 1231/1237 as a 4-byte LE
  * i32 (fnv1a.rs:47-51), byte strings hash raw bytes (fnv1a.rs:55-64).
  * Multi-value hashing chains the state (fnv1a.rs:9-11).
  *
  * Methods are plain statics (via Scala object forwarders) so generated
  * whole-stage code can call them directly.
  */
object Fnv1aCore {
  final val OffsetBasis: Long = 0xcbf29ce484222325L
  final val Prime: Long = 0x100000001b3L

  /** Engine-wide second-fingerprint-lane seed (the 64-bit golden-ratio
    * odd constant): `fnv1a_seeded(Lane2Seed, x)` is every operator's
    * second lane of the 128-bit content identity — exact dedup, line
    * dedup — and the MinHash seed-schedule multiplier. ONE definition
    * so the cross-module identity cannot silently diverge. */
  final val Lane2Seed: Long = 0x9e3779b97f4a7c15L

  def iterate(state: Long, b: Byte): Long = (state ^ (b & 0xffL)) * Prime

  def hashBytes(bytes: Array[Byte], state0: Long): Long = {
    var state = state0
    var i = 0
    while (i < bytes.length) {
      state = (state ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    state
  }

  /** 4 little-endian bytes (fnv1a.rs:72 `to_le_bytes`). */
  def hashInt(v: Int, state0: Long): Long = {
    var state = state0
    state = (state ^ (v & 0xffL)) * Prime
    state = (state ^ ((v >>> 8) & 0xffL)) * Prime
    state = (state ^ ((v >>> 16) & 0xffL)) * Prime
    state = (state ^ ((v >>> 24) & 0xffL)) * Prime
    state
  }

  /** 8 little-endian bytes. */
  def hashLong(v: Long, state0: Long): Long = {
    var state = state0
    var i = 0
    while (i < 8) {
      state = (state ^ ((v >>> (8 * i)) & 0xffL)) * Prime
      i += 1
    }
    state
  }

  /** Java Boolean.hashCode() constants, hashed as 4-byte LE i32
    * (fnv1a.rs:47-51). */
  def hashBoolean(v: Boolean, state0: Long): Long =
    hashInt(if (v) 1231 else 1237, state0)

  /** IEEE-754 bit pattern as 4-byte LE i32. The reference hashed no
    * float types (no `FNV1aIterator` impl); this engine extension keeps
    * hash ⇔ SQL-equality consistency the way Spark's own hash family
    * does: -0.0 normalizes to 0.0 (they compare equal) and every NaN
    * hashes the canonical NaN bits (`floatToIntBits` canonicalizes). */
  def hashFloat(v: Float, state0: Long): Long =
    hashInt(java.lang.Float.floatToIntBits(if (v == 0.0f) 0.0f else v), state0)

  /** IEEE-754 bit pattern as 8-byte LE i64 — same normalization
    * contract as [[hashFloat]]. */
  def hashDouble(v: Double, state0: Long): Long =
    hashLong(java.lang.Double.doubleToLongBits(if (v == 0.0d) 0.0d else v), state0)
}
