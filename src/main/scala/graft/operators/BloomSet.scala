package graft.operators

import graft.functions.GraftFunctions.fnv1a_seeded
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge => B}

/** Broadcast Bloom-filter membership — the scale path for "drop every
  * corpus row whose key is in this (much smaller) set" when the set is
  * still too large to ship as a literal IN-list but its BITSET is a
  * few KB–MB: decontamination against eval/benchmark keys, blocklist
  * filtering, incremental-ingest "seen before" pre-checks.
  *
  * Shape: [[build]] is one narrow pass over the key set (k seeded
  * FNV-1a positions per key, exploded) into a `bit_or` aggregate keyed
  * by bitset WORD — at most `numBits/64` groups whatever the key
  * count — collected into one Long array. [[mightContain]] compiles
  * that array into a pure codegen'd column predicate (array literal +
  * bit tests — no UDF, no join, no shuffle): the 100 TB corpus side is
  * a FILTER. Bloom answers are one-sided (false positives only), so an
  * exact-semantics caller confirms the (tiny) candidate set with a
  * real join afterwards — see the `bloom_decontaminate` query — and
  * the corpus never shuffles on the key.
  *
  * Hash family: position i = `pmod(fnv1a_seeded(i, key), numBits)` —
  * the reference's seeded-init family (`fnv1a.rs:26-28`), identical
  * expression on the build and probe sides by construction.
  */
object BloomSet {

  /** Bitsets above this many BITS (2^26 = 8 MiB of words) stop being
    * sane plan literals / broadcast payloads — fail fast instead.
    *
    * Key-count / false-positive envelope at the cap (k = 4 hashes,
    * fp ≈ (1 − e^{−kn/m})^k with m = 2^26):
    *
    *  - n = 10^6 keys → bit density ≈ 0.058, fp ≈ 1e-5
    *  - n = 10^7 keys → bit density ≈ 0.45,  fp ≈ 4%  (spec-pinned
    *    boundary — BloomSetSpec measures it)
    *  - n ≳ 10^8 keys → the filter saturates and no-confirm answers
    *    approach "always maybe".
    *
    * Eval/blocklist sets (the decontamination use case) sit well under
    * 10^7. Through the 10^7–10^8 range, [[buildSharded]] holds this
    * envelope by sharding the KEY SET across up to [[MaxShards]]
    * per-shard bitsets (spec-pinned at 2×10^7 keys in BloomSetSpec).
    * Past that, no broadcast literal is sane — keep the filter as a
    * cheap pre-prune and rely on the exact confirm join
    * (`bloom_decontaminate`'s shape). */
  val MaxBits: Long = 1L << 26

  /** An immutable built filter: `words(w) bit b` set ⇔ some inserted
    * key hashed to position 64w+b. */
  final case class Filter(words: Array[Long], numBits: Long, k: Int) {
    /** Set-bit count → effective false-positive rate estimate
      * (1 - e^{-kn/m})^k with the actual bit density. */
    def bitDensity: Double =
      words.map(java.lang.Long.bitCount).sum.toDouble / numBits
  }

  private def shl(one: Column, by: Column): Column =
    B.column(ShiftLeft(B.expression(one), B.expression(by)))
  private def shr(v: Column, by: Column): Column =
    B.column(ShiftRight(B.expression(v), B.expression(by)))

  /** Spreads lane index i into a well-separated 64-bit seed. The
    * seeded-init FNV family is affine in its seed (h(init) =
    * init·p^len + f(key) up to the per-byte XORs), so SEQUENTIAL
    * seeds 0..k-1 produce positions that differ by near-constant
    * offsets per key-length class — measured: 4 sequential seeds gave
    * only ~1.3 effective hashes at the MaxBits cap. Golden-ratio
    * multiples decorrelate the lanes (measured: 30.3M distinct
    * positions of 30.1M uniform-expected at n=10^7, k=4). */
  private def laneSeed(i: Int): Long = i * -7046029254386353131L

  /** k hash positions of `key` in [0, numBits). */
  private def positions(key: Column, numBits: Long, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(fnv1a_seeded(laneSeed(i), key), lit(numBits)))

  /** Build the filter over the distinct values of `key` in `keys`.
    * NULL keys are skipped (a NULL never "is in" the set — callers
    * decide their own NULL policy, as [[mightContain]] returns NULL
    * for NULL probes). One pass + one word-keyed aggregation; driver
    * memory is `numBits/64` longs regardless of key count. */
  def build(keys: DataFrame, key: Column, numBits: Long, k: Int): Filter = {
    require(numBits > 0 && numBits % 64 == 0 && numBits <= MaxBits,
      s"numBits must be a positive multiple of 64 <= $MaxBits, got $numBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val pos = explode(array(positions(key, numBits, k): _*)).as("pos")
    val rows = keys.where(key.isNotNull)
      .select(pos)
      .select(shr(col("pos"), lit(6)).as("w"),
        shl(lit(1L), pmod(col("pos"), lit(64L))).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
      .collect()
    val words = new Array[Long]((numBits / 64).toInt)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    Filter(words, numBits, k)
  }

  /** Pure-expression membership probe: true ⇒ maybe present, false ⇒
    * DEFINITELY absent, NULL for NULL keys. The filter rides the plan
    * as an array literal, so the probe is a codegen'd per-row filter —
    * nothing joins, nothing shuffles. */
  def mightContain(key: Column, f: Filter): Column =
    wordTests(key, typedlit(f.words.toSeq), f.numBits, f.k)

  /** The k bit-tests against a words array (either a 1-D literal or
    * the shard row an outer element_at selected). */
  private def wordTests(key: Column, words: Column, numBits: Long,
      k: Int): Column =
    positions(key, numBits, k).map { p =>
      shr(element_at(words, (shr(p, lit(6)) + lit(1)).cast("int")),
        pmod(p, lit(64L))).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  // ---- Per-group bloom INDEX relations (file-skip indexes) ----

  /** A DISTRIBUTED per-group bloom index: one row per (group, word)
    * with the OR of that group's inserted bits — the Delta/Iceberg-
    * style per-FILE bloom skip index as a plain relation. Unlike
    * [[build]] nothing is collected or broadcast: the index lives
    * partitioned (by group, like the files it describes) and probes
    * reach it through a word-keyed equi-join. NULL keys skipped. */
  def buildGroupedIndex(df: DataFrame, groups: Seq[Column], key: Column,
      numBits: Long, k: Int): DataFrame = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val pos = explode(array(positions(key, numBits, k): _*)).as("pos")
    df.where(key.isNotNull)
      .select((groups :+ pos): _*)
      .select((groups :+ shr(col("pos"), lit(6)).as("w") :+
        shl(lit(1L), pmod(col("pos"), lit(64L))).as("m")): _*)
      .groupBy((groups :+ col("w")): _*)
      .agg(bit_or(col("m")).as("bits"))
  }

  /** A probe key's per-word required-bit masks: array of
    * struct(w: long, m: long) with lanes landing in the same word
    * OR-merged — a group "maybe contains" the key iff for EVERY
    * element some index row (group, w) has `bits & m == m`. */
  def probeWordMasks(key: Column, numBits: Long, k: Int): Column = {
    val pairs = positions(key, numBits, k).map(p =>
      struct(shr(p, lit(6)).as("w"),
        shl(lit(1L), pmod(p, lit(64L))).as("m")))
    // merge same-word lanes: aggregate the array by w
    aggregate(
      array(pairs: _*),
      array().cast("array<struct<w:bigint,m:bigint>>"),
      (acc, x) =>
        when(exists(acc, e => e.getField("w") === x.getField("w")),
          transform(acc, e =>
            when(e.getField("w") === x.getField("w"),
              struct(e.getField("w").as("w"),
                e.getField("m").bitwiseOR(x.getField("m")).as("m")))
              .otherwise(e)))
          .otherwise(array_append(acc, x)))
  }

  // ---- Sharded filters: past MaxBits, shard the KEY SET ----

  /** Hard ceiling on shard count: 64 shards × MaxBits = 2^32 bits
    * (512 MiB of words) — beyond any sane plan literal. The sharded
    * family exists to hold the fp envelope through the 10^7–10^8-key
    * range, not to replace the confirm join above it. */
  val MaxShards: Int = 64

  /** Size governor for the LITERAL sharded family: total bits above
    * this (2^29 = 64 MiB of words) stop being a sane plan literal or
    * driver collect — the filter would be embedded into every task's
    * serialized plan and re-shipped per query. [[buildSharded]] and
    * [[mightContainSharded]] fail fast at the bound with the routed
    * escape: [[buildShardedIndex]] + [[maybeKeys]], the Y4-style
    * DISTRIBUTED index relation (never collected, never a literal —
    * probes reach it through a (shard, word)-keyed equi-join), which
    * holds the identical membership contract at any size
    * (spec-pinned parity in BloomSetSpec). */
  val MaxLiteralBits: Long = 1L << 29

  private def literalRouteMsg(totalBits: Long): String =
    s"sharded bloom filter of $totalBits bits exceeds the " +
      s"$MaxLiteralBits-bit plan-literal governor; build the " +
      "distributed index instead (BloomSet.buildShardedIndex + " +
      "maybeKeys — same membership contract, no literal)"

  /** Seed of the shard-selector hash — outside the position-lane
    * family ([[laneSeed]] of a negative index), so shard choice and
    * in-shard positions stay decorrelated. */
  private val ShardSeed: Long = laneSeed(-1)

  /** A key-sharded filter: key k lives ONLY in shard
    * `pmod(fnv1a_seeded(ShardSeed, k), nShards)`, each shard its own
    * ≤ MaxBits bitset over ~n/nShards keys — so total capacity scales
    * linearly in shards while per-shard fp math is unchanged. */
  final case class ShardedFilter(shards: Array[Array[Long]],
      numBitsPerShard: Long, k: Int) {
    def nShards: Int = shards.length
    def totalBits: Long = numBitsPerShard * nShards
    def bitDensity: Double =
      shards.map(_.map(java.lang.Long.bitCount(_).toLong).sum).sum
        .toDouble / totalBits
  }

  /** The shard a key belongs to, in [0, nShards). */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(fnv1a_seeded(ShardSeed, key), lit(nShards.toLong))

  /** [[build]] for key sets past the single-filter envelope: one pass,
    * one (shard, word)-keyed aggregation — at most
    * nShards·numBitsPerShard/64 groups whatever the key count — and
    * nShards word arrays on the driver. Same plan shape as [[build]];
    * only the aggregate key gains the shard column. */
  def buildSharded(keys: DataFrame, key: Column, nShards: Int,
      numBitsPerShard: Long, k: Int): ShardedFilter = {
    require(nShards >= 1 && nShards <= MaxShards,
      s"nShards must be in [1,$MaxShards], got $nShards")
    require(numBitsPerShard > 0 && numBitsPerShard % 64 == 0 &&
      numBitsPerShard <= MaxBits,
      s"numBitsPerShard must be a positive multiple of 64 <= $MaxBits, " +
        s"got $numBitsPerShard")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(nShards.toLong * numBitsPerShard <= MaxLiteralBits,
      literalRouteMsg(nShards.toLong * numBitsPerShard))
    val pos = explode(array(positions(key, numBitsPerShard, k): _*)).as("pos")
    val rows = keys.where(key.isNotNull)
      .select(shardOf(key, nShards).as("shard"), pos)
      .select(col("shard"), shr(col("pos"), lit(6)).as("w"),
        shl(lit(1L), pmod(col("pos"), lit(64L))).as("m"))
      .groupBy(col("shard"), col("w")).agg(bit_or(col("m")).as("bits"))
      .collect()
    val words = Array.fill(nShards)(new Array[Long]((numBitsPerShard / 64).toInt))
    rows.foreach(r => words(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
    ShardedFilter(words, numBitsPerShard, k)
  }

  /** Membership probe against a sharded filter — still one pure
    * codegen'd predicate, no join, no shuffle: the shard hash indexes
    * an array-of-arrays literal (strictly better than OR-ing per-shard
    * predicates: O(k) bit tests regardless of shard count), then the
    * k bit-tests run against that shard's words. Same one-sided
    * contract as [[mightContain]]. */
  def mightContainSharded(key: Column, f: ShardedFilter): Column = {
    require(f.totalBits <= MaxLiteralBits, literalRouteMsg(f.totalBits))
    val shardsLit = typedlit(f.shards.map(_.toSeq).toSeq)
    val shardWords = element_at(shardsLit,
      (shardOf(key, f.nShards) + lit(1)).cast("int"))
    wordTests(key, shardWords, f.numBitsPerShard, f.k)
  }

  /** The routed escape past [[MaxLiteralBits]]: the sharded filter as
    * a DISTRIBUTED relation — one row per (shard, w, bits), exactly
    * [[buildGroupedIndex]] with the shard hash as the group. Nothing
    * is collected to the driver and nothing becomes a plan literal at
    * any key count; bit-identical content to [[buildSharded]]'s words
    * at the same parameters (the same positions/bit_or pipeline).
    * Persist it partitioned by `shard` like any Y4 index. */
  def buildShardedIndex(keys: DataFrame, key: Column, nShards: Int,
      numBitsPerShard: Long, k: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    buildGroupedIndex(keys.where(key.isNotNull)
        .select(key.as("__bk"), shardOf(key, nShards).as("shard")),
      Seq(col("shard")), col("__bk"), numBitsPerShard, k)
  }

  /** DISTINCT probe keys the sharded index says are "maybe present"
    * (the same one-sided contract as [[mightContainSharded]]): a key
    * is maybe-present iff EVERY required word mask matches its
    * shard's index rows. Callers left-semi join their relation on
    * the returned `__k` column — the corpus never ships the index and
    * the index never ships the corpus; the only shuffle is the
    * (shard, w)-keyed probe join, sized by distinct probe keys × k.
    *
    * The index is first re-aggregated with `bit_or` per (shard, w):
    * an index maintained by APPENDING a second [[buildShardedIndex]]
    * output (the BandIndex/InvertedIndex maintenance precedent) holds
    * duplicate (shard, w) rows whose words must be OR-merged — a raw
    * join would count a present key's matches twice and silently drop
    * it (a false negative, violating the one-sided contract). The
    * re-agg makes append-maintenance a supported layout, costs one
    * (shard, w)-keyed exchange bounded by index words, and is a no-op
    * on a freshly-built index. */
  def maybeKeys(probes: DataFrame, key: Column, index: DataFrame,
      nShards: Int, numBitsPerShard: Long, k: Int): DataFrame = {
    val pk = probes.where(key.isNotNull).select(key.as("__k")).distinct()
      .select(col("__k"), shardOf(col("__k"), nShards).as("shard"),
        explode(probeWordMasks(col("__k"), numBitsPerShard, k)).as("pm"))
      .select(col("__k"), col("shard"),
        col("pm.w").as("w"), col("pm.m").as("m"))
    val need = pk.groupBy(col("__k")).agg(count(lit(1)).as("__need"))
    val merged = index.groupBy(col("shard"), col("w"))
      .agg(bit_or(col("bits")).as("bits"))
    pk.join(merged, Seq("shard", "w"))
      .filter(col("bits").bitwiseAND(col("m")) === col("m"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__ok"))
      .join(need, Seq("__k"))
      .filter(col("__ok") === col("__need"))
      .select(col("__k"))
  }
}
