package graft

import graft.operators.BloomSet
import org.apache.spark.sql.functions._

/** Bloom-filter contracts: membership is one-sided (NO false
  * negatives, bounded false positives), NULL probes stay NULL, the
  * probe is a pure filter (no join/shuffle on the corpus side), and
  * the bloom_decontaminate composition equals the plain exact
  * anti-join it accelerates. */
class BloomSetSpec extends SparkSuite {
  import spark.implicits._

  private lazy val keys = (0 until 500).map(i => s"key-$i")
  private lazy val filter =
    BloomSet.build(keys.toDF("k"), $"k", numBits = 1L << 13, k = 5)

  test("no false negatives: every inserted key probes true") {
    val misses = keys.toDF("k")
      .filter(!BloomSet.mightContain($"k", filter))
      .count()
    assert(misses == 0L)
  }

  test("false positives are rare and pruning is real") {
    val probes = (0 until 2000).map(i => s"other-$i").toDF("k")
    val hits = probes.filter(BloomSet.mightContain($"k", filter)).count()
    // m/n = 16.4 bits/key, k=5 → theoretical fp ~ 0.5%; allow 5x slack
    assert(hits <= 50, s"$hits of 2000 absent keys probed true")
    assert(hits < 2000, "filter prunes nothing")
  }

  test("the documented envelope boundary: 10^7 keys at the MaxBits cap") {
    // the scaladoc's pinned point: n=10^7, m=2^26, k=4 → density
    // ≈ 1 - e^{-kn/m} ≈ 0.45, no-confirm fp ≈ density^4 ≈ 4%. Past
    // this key count the filter is a pre-prune, not an answer.
    val n = 10000000L
    val f = BloomSet.build(
      spark.range(n).select($"id".cast("string").as("k")),
      $"k", numBits = BloomSet.MaxBits, k = 4)
    val density = f.bitDensity
    assert(density > 0.40 && density < 0.50,
      s"expected fill ≈ 0.45 at the envelope boundary, got $density")
    // measured fp on 20k absent keys: ≈ density^4 ≈ 4%; generous band
    val probes = spark.range(20000)
      .select(concat(lit("absent-"), $"id").as("k"))
    val fp = probes.filter(BloomSet.mightContain($"k", f)).count()
    assert(fp >= 200 && fp <= 2000,
      s"fp rate off the documented envelope: $fp of 20000")
  }

  test("sharded build holds the fp envelope past the MaxBits cap") {
    // 2x10^7 keys — DOUBLE the single-filter envelope boundary, where
    // one MaxBits filter saturates (density ~0.70, no-confirm fp
    // ~24%). Four shards give 4x the bits: ~5x10^6 keys per 2^26-bit
    // shard → density ≈ 1 - e^{-4n/m} ≈ 0.258, fp ≈ density^4 ≈ 0.4%.
    // The probe stays one pure codegen'd predicate (shard hash indexes
    // an array-of-arrays literal; no join, no shuffle).
    val n = 20000000L
    val f = BloomSet.buildSharded(
      spark.range(n).select($"id".cast("string").as("k")),
      $"k", nShards = 4, numBitsPerShard = BloomSet.MaxBits, k = 4)
    assert(f.totalBits == BloomSet.MaxBits * 4)
    val density = f.bitDensity
    assert(density > 0.20 && density < 0.32,
      s"expected fill ~0.26 with 4 shards at 2x10^7 keys, got $density")
    // no false negatives on a slice of the inserted keys
    val present = spark.range(0, n, 1000) // 20k inserted keys
      .select($"id".cast("string").as("k"))
    assert(present.filter(!BloomSet.mightContainSharded($"k", f)).count() == 0L)
    // measured fp on 20k absent keys ≈ 0.4%; generous band, and far
    // below the ~24% a saturated single filter would read
    val probes = spark.range(20000)
      .select(concat(lit("absent-"), $"id").as("k"))
    val fp = probes.filter(BloomSet.mightContainSharded($"k", f)).count()
    assert(fp <= 400, s"fp rate off the sharded envelope: $fp of 20000")
    // shards partition the key space: shardOf is total and in-range
    val shards = spark.range(1000).select($"id".cast("string").as("k"))
      .select(BloomSet.shardOf($"k", 4).as("s"))
      .agg(min($"s"), max($"s")).head()
    assert(shards.getLong(0) >= 0L && shards.getLong(1) <= 3L)
  }

  test("sharded build rejects bad parameters") {
    intercept[IllegalArgumentException] {
      BloomSet.buildSharded(keys.toDF("k"), $"k", 0, 1L << 13, 4)
    }
    intercept[IllegalArgumentException] {
      BloomSet.buildSharded(keys.toDF("k"), $"k",
        BloomSet.MaxShards + 1, 1L << 13, 4)
    }
    intercept[IllegalArgumentException] {
      BloomSet.buildSharded(keys.toDF("k"), $"k", 2, BloomSet.MaxBits * 2, 4)
    }
  }

  test("plan-literal governor: oversized sharded filters fail fast " +
      "with the distributed-index route") {
    // build-time: 64 shards x MaxBits = 2^32 bits — rejected before
    // any job runs
    val eb = intercept[IllegalArgumentException] {
      BloomSet.buildSharded(keys.toDF("k"), $"k",
        BloomSet.MaxShards, BloomSet.MaxBits, 4)
    }
    assert(eb.getMessage.contains("plan-literal governor") &&
      eb.getMessage.contains("buildShardedIndex"))
    // probe-time: a filter whose DECLARED geometry is past the bound
    // (tiny placeholder arrays — the require must fire on totalBits
    // before the arrays are ever touched)
    val fake = BloomSet.ShardedFilter(
      Array.fill(64)(Array(0L)), BloomSet.MaxBits, 4)
    val ep = intercept[IllegalArgumentException] {
      BloomSet.mightContainSharded($"k", fake)
    }
    assert(ep.getMessage.contains("plan-literal governor"))
    // and the spec'd-envelope literal (4 x MaxBits = 2^28) stays
    // under the governor — the boundary is above the proven envelope
    assert(4L * BloomSet.MaxBits <= BloomSet.MaxLiteralBits)
  }

  test("distributed sharded index answers exactly like the literal " +
      "sharded filter") {
    val nShards = 4
    val bits = 1L << 13
    val kk = 4
    val keySet = spark.range(5000).select($"id".cast("string").as("k"))
    val f = BloomSet.buildSharded(keySet, $"k", nShards, bits, kk)
    val index = BloomSet.buildShardedIndex(keySet, $"k", nShards, bits, kk)
    // index content == collected words (same positions/bit_or lane)
    val idxWords = index.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    f.shards.zipWithIndex.foreach { case (ws, s) =>
      ws.zipWithIndex.foreach { case (bitsWord, w) =>
        if (bitsWord != 0L)
          assert(idxWords((s.toLong, w.toLong)) == bitsWord,
            s"shard $s word $w differs")
      }
    }
    // membership parity on present + absent probes
    val probes = spark.range(0, 10000, 7)
      .select($"id".cast("string").as("k"))
      .unionAll(spark.range(3000)
        .select(concat(lit("absent-"), $"id").as("k")))
    val viaLiteral = probes
      .filter(BloomSet.mightContainSharded($"k", f))
      .as[String].collect().toSet
    val viaIndex = BloomSet
      .maybeKeys(probes, $"k", index, nShards, bits, kk)
      .as[String].collect().toSet
    assert(viaLiteral == viaIndex,
      s"literal vs index disagree on ${(viaLiteral diff viaIndex) ++
        (viaIndex diff viaLiteral)}")
    // one-sided contract sanity: every inserted probe is maybe
    assert(spark.range(0, 10000, 7).filter($"id" < 5000).count() ==
      viaIndex.count(k => !k.startsWith("absent-") && k.toLong < 5000))

    // APPEND-MAINTAINED index: a second buildShardedIndex output
    // unioned in (duplicate (shard, w) rows) must answer identically —
    // maybeKeys OR-merges per (shard, w) before the mask test, so a
    // present key never sees a doubled match count (the false-negative
    // trap of deciding membership by exact count equality)
    val half1 = spark.range(2500).select($"id".cast("string").as("k"))
    val half2 = spark.range(2500, 5000)
      .select($"id".cast("string").as("k"))
    val appended = BloomSet
      .buildShardedIndex(half1, $"k", nShards, bits, kk)
      .unionByName(BloomSet
        .buildShardedIndex(half2, $"k", nShards, bits, kk))
    val viaAppended = BloomSet
      .maybeKeys(probes, $"k", appended, nShards, bits, kk)
      .as[String].collect().toSet
    // same one-sided contract: every truly-present probe survives
    val present = spark.range(0, 10000, 7).filter($"id" < 5000)
      .select($"id".cast("string").as("k")).as[String].collect().toSet
    assert(present.subsetOf(viaAppended),
      s"append-maintained index dropped present keys: ${
        (present diff viaAppended).take(5)}")
  }

  test("NULL probe stays NULL; NULL build keys are skipped") {
    val f = BloomSet.build(
      Seq(Some("a"), None, Some("b")).toDF("k"), $"k", 64 * 8, 3)
    val r = Seq(Some("a"), None).toDF("k")
      .select(BloomSet.mightContain($"k", f).as("m"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getBoolean(0))
    assert(r(0) == true && r(1) == null)
  }

  test("build rejects bad parameters") {
    intercept[IllegalArgumentException] {
      BloomSet.build(keys.toDF("k"), $"k", 100, 5) // not a multiple of 64
    }
    intercept[IllegalArgumentException] {
      BloomSet.build(keys.toDF("k"), $"k", BloomSet.MaxBits * 2, 5)
    }
    intercept[IllegalArgumentException] {
      BloomSet.build(keys.toDF("k"), $"k", 1L << 13, 0)
    }
  }

  test("bit density matches the expected fill") {
    // n=500, k=5, m=8192 → density 1 - e^{-kn/m} ≈ 0.263
    assert(filter.bitDensity > 0.15 && filter.bitDensity < 0.40,
      s"density ${filter.bitDensity}")
  }

  test("bloom_decontaminate equals the plain exact anti-join") {
    val got = SparkEntry.queries("bloom_decontaminate")(spark, sf)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val base = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source")
    val probes = base.filter($"doc_id" % 13 === 0 && $"doc_id" % 2 === 1)
      .select((-$"doc_id").as("doc_id"), $"text", $"lang", $"source")
    val want = base.unionByName(probes)
      .join(base.filter($"doc_id" % 13 === 0).select($"text").distinct(),
        Seq("text"), "left_anti")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("sum_ids"))
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("the corpus side never shuffles: all joins broadcast") {
    val p = SparkEntry.queries("bloom_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled through a sort-merge join:\n${p.take(1500)}")
    assert(p.contains("fnv1a("),
      "bloom probe expression missing from the plan")
  }

  test("grouped index: zero false negatives per group, real skipping") {
    import graft.operators.BloomSet
    val rnd = new scala.util.Random(61)
    // 40 groups x ~30 keys each from a 2000-key domain: any single
    // group holds a SELECTIVE subset, so a correct index must skip
    val rows = (0 until 40).flatMap(g =>
      Seq.fill(30)((g.toLong, rnd.nextInt(2000).toLong)))
    val df = rows.toDF("g", "key")
    val index = BloomSet.buildGroupedIndex(df, Seq($"g"), $"key", 1024L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val membership = rows.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    // probe every distinct key against every group via the mask math
    val probeKeys = rows.map(_._2).distinct
    val masks = probeKeys.toDF("key")
      .select($"key", BloomSet.probeWordMasks($"key", 1024L, 4).as("pm"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1))))
    var maybeCount = 0L
    masks.foreach { case (key, wm) =>
      (0L until 40L).foreach { g =>
        val maybe = wm.forall { case (w, m) =>
          (index.getOrElse((g, w), 0L) & m) == m }
        if (maybe) maybeCount += 1
        if (membership(key)(g))
          assert(maybe, s"false negative: key $key group $g")
      }
    }
    val trueCount = membership.values.map(_.size.toLong).sum
    assert(maybeCount >= trueCount)
    assert(maybeCount < probeKeys.size * 40L / 2,
      "the index must actually skip most (key, group) pairs")
  }
}
