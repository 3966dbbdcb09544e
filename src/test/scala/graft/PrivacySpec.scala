package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** Mechanism-level evidence for the DP release family — the fixture
  * oracle proves engine parity; these prove the MECHANISM properties
  * the privacy story depends on (release-once determinism, the budget
  * knob, two-sided noise, clipping, known-domain coverage, and the
  * sign-safe floor rounding). */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"source", $"n_chars")

  test("the release is deterministic per (key, seed): re-running " +
      "republishes byte-identical values (release-once semantics)") {
    val a = Privacy.dpCounts(docs, "source", 0.5, "secret:a:")
      .orderBy($"source").collect().toSeq
    val b = Privacy.dpCounts(docs, "source", 0.5, "secret:a:")
      .orderBy($"source").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("rotating the seed redraws the noise — a new release spends " +
      "fresh budget instead of republishing the old draw") {
    def noise(seed: String) =
      Privacy.dpCounts(docs, "source", 0.5, seed)
        .select($"source", $"noise_micro")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val a = noise("secret:a:")
    val b = noise("secret:b:")
    assert(a.keySet == b.keySet && a != b)
  }

  test("a larger epsilon shrinks every key's noise magnitude — the " +
      "budget knob acts per key, monotonically (same uniform, " +
      "smaller scale)") {
    def noise(eps: Double) =
      Privacy.dpCounts(docs, "source", eps, "secret:a:")
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
    val ns = Privacy.dpCounts(docs, "source", 0.5, "secret:a:")
      .select($"noise_micro").as[Long].collect()
    assert(ns.exists(_ > 0L) && ns.exists(_ < 0L), ns.toSeq.toString)
  }

  test("release rounding is a true floor at every sign: at tiny " +
      "epsilon (huge noise) released − n_true == floor((noise_micro " +
      "+ 5e5)/1e6) computed independently — the truncate-toward-zero " +
      "DIV would be off by one on large negative draws") {
    // eps = 0.001 → scale 1000: |noise_micro| reaches past the
    // −1.0005e9 point where the old positive-shift DIV trick stopped
    // matching floor
    val rows = Privacy.dpCounts(docs, "source", 0.001, "secret:a:")
      .select($"n_true", $"noise_micro", $"released").collect()
    assert(rows.exists(_.getLong(1) < -1000500000L),
      "fixture must exercise the below-shift region: " +
        rows.map(_.getLong(1)).sorted.take(3).toSeq.toString)
    rows.foreach { r =>
      val expected = r.getLong(0) +
        math.floor((r.getLong(1) + 500000.0) / 1000000.0).toLong
      assert(r.getLong(2) == expected,
        s"n=${r.getLong(0)} noise=${r.getLong(1)}: " +
          s"released ${r.getLong(2)} != floor $expected")
    }
  }

  test("a non-positive epsilon is refused; so is a non-positive clip") {
    intercept[IllegalArgumentException](
      Privacy.dpCounts(docs, "source", 0.0, "secret:a:"))
    intercept[IllegalArgumentException](
      Privacy.dpSum(docs, "source", "n_chars", 0.5, 0L, "secret:a:"))
  }

  test("known-domain release: output keys == the public domain " +
      "exactly — absent keys release pure noise (n_true 0, released " +
      "== the rounded draw), extra data keys outside the domain are " +
      "dropped (releasing them reintroduces the presence leak)") {
    val domain = (Seq("zz-absent") ++
      docs.select($"source").distinct().as[String].collect().toSeq
        .sorted.drop(1)) // drop one REAL key from the domain too
      .toDF("source")
    val domSet = domain.as[String].collect().toSet
    val out = Privacy.dpCounts(docs, "source", 0.5, "secret:a:", domain)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == domSet)
    val (nTrue, noise, released) = out("zz-absent")
    assert(nTrue == 0L)
    assert(released ==
      math.floor((noise + 500000.0) / 1000000.0).toLong)
    assert(noise != 0L, "an absent key must still carry a draw")
  }

  test("dpSum clips each contribution BEFORE the sum: the clipped " +
      "release differs from the unclipped truth where the bound " +
      "binds, and equals the independently clipped-and-summed value") {
    val out = Privacy.dpSum(docs, "source", "n_chars", 0.5, 400L,
      "secret:a:").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val truth = docs.groupBy($"source").agg(
      sum(greatest(least($"n_chars".cast("long"), lit(400L)),
        lit(-400L))).as("s"),
      sum($"n_chars".cast("long")).as("raw"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == truth.keySet && out.nonEmpty)
    assert(truth.exists { case (_, (s, raw)) => s != raw },
      "fixture must make the clip bound bind (n_chars max > 400)")
    out.foreach { case (k, (sumClipped, noise, released)) =>
      assert(sumClipped == truth(k)._1)
      assert(released == sumClipped +
        math.floor((noise + 500000.0) / 1000000.0).toLong)
    }
  }

  test("dpMedian (exponential mechanism): a peaked group releases its " +
      "exact median (the 2^20 peak dominates the truncated tail), and " +
      "the engine's draw equals an independent from-first-principles " +
      "replay of the mechanism") {
    import graft.operators.{Privacy, Sampling}
    // a degenerate group: every value equal → only the median's grid
    // point carries weight (k = 0 there, k = n elsewhere; n > 20
    // truncates the rest to zero) — released == the true value for
    // EVERY seed
    val peaked = Seq.fill(30)(("p", 77L)).toDF("source", "n_chars")
    val rp = Privacy.dpMedian(peaked, "source", "n_chars", 600L,
      "secret:q:").collect()
    assert(rp.length == 1 && rp.head.getLong(1) == 30L &&
      rp.head.getLong(2) == 77L)
    // the real fixture: replay the mechanism independently in Scala
    // (grid walk + power-of-two weights + the keyed draw) and assert
    // the engine released exactly that value per key
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    val released = Privacy.dpMedian(docs, "source", "n_chars", 600L,
      "secret:q:").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val vals = docs.select($"source", $"n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(v => math.min(math.max(v._2, 0L), 600L)).sorted }
    val u32s = docs.select($"source",
      Sampling.keyHash32($"source", "secret:q:")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    vals.foreach { case (k, xs) =>
      val n = xs.length.toLong
      val kDists = (0L to 600L).map { v =>
        val le = xs.count(_ <= v).toLong
        val c = xs.count(_ == v).toLong
        math.abs(2L * le - c - n)
      }
      // the per-group min shift (shift-invariance of the mechanism;
      // guarantees the peak always carries weight)
      val minK = kDists.min
      val weights = kDists.map { kd =>
        val kHat = kd - minK
        if (kHat <= 20L) 1L << (20L - kHat).toInt else 0L
      }
      val tot = weights.sum
      val target = u32s(k) * tot / 4294967296L
      var cum = 0L
      val drawn = (0L to 600L).find { v =>
        cum += weights(v.toInt); cum > target }.get
      assert(released(k) == ((n, drawn)),
        s"key $k: engine ${released(k)} vs replay ($n, $drawn)")
    }
  }

  test("dpMedian's min-shift closes the vanishing-group leak: a group " +
      "whose best grid point has raw rank distance > 20 still " +
      "releases (its peak carries the full 2^20 weight)") {
    import graft.operators.Privacy
    // 25 rows at 10 and 25 at 11: every grid point has raw
    // k >= 25 (at v=10: |2*25-25-50| = 25; at v=11: same), so the
    // UN-shifted truncation zeroed every weight and the group
    // silently vanished — output support depended on the private data
    val adversarial = (Seq.fill(25)(("a", 10L)) ++
      Seq.fill(25)(("a", 11L))).toDF("source", "n_chars")
    val out = Privacy.dpMedian(adversarial, "source", "n_chars", 600L,
      "secret:v:").collect()
    assert(out.length == 1, "the group must not vanish from the release")
    assert(out.head.getLong(1) == 50L)
    // the shift leaves only v=10 and v=11 weighted (k̂ = 0 at both,
    // everything else k̂ ≥ 25) — the release is one of the two
    assert(Set(10L, 11L).contains(out.head.getLong(2)), out.head.toString)
    // and the same holds at general ε
    val outEps = Privacy.dpMedian(adversarial, "source", "n_chars",
      600L, 0.5, "secret:v:").collect()
    assert(outEps.length == 1 &&
      Set(10L, 11L).contains(outEps.head.getLong(2)))
  }

  test("general-ε dpMedian: the quantized weight table is exact longs " +
      "with no engine-side exp(), degenerates to the fixed-ε release " +
      "on a peaked group, and replays from first principles") {
    import graft.operators.{Privacy, Sampling}
    // table sanity: ε = 2·ln 2 reproduces the exact powers of two on
    // the non-truncated range (floor(2^20·2^-k + 0.5) = 2^(20-k))
    val t2ln2 = Privacy.medianWeightTable(2.0 * math.log(2.0))
    (0 to 20).foreach(k => assert(t2ln2(k) == (1L << (20 - k)), s"k=$k"))
    // ε = 0.5: monotone decreasing, peak 2^20, finite truncation
    val t = Privacy.medianWeightTable(0.5)
    assert(t.head == 1048576L && t.last > 0L && t.length < 100)
    assert(t.zip(t.tail).forall { case (a, b) => a >= b })
    // peaked group: the 2^20 peak dominates at any ε — exact median
    val peaked = Seq.fill(30)(("p", 77L)).toDF("source", "n_chars")
    val rp = Privacy.dpMedian(peaked, "source", "n_chars", 600L, 0.5,
      "secret:e:").collect()
    assert(rp.length == 1 && rp.head.getLong(2) == 77L)
    // first-principles replay over the real fixture at ε = 0.5
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    val released = Privacy.dpMedian(docs, "source", "n_chars", 600L,
      0.5, "secret:e:").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val vals = docs.select($"source", $"n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(v => math.min(math.max(v._2, 0L), 600L)).sorted }
    val u32s = docs.select($"source",
      Sampling.keyHash32($"source", "secret:e:")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    vals.foreach { case (k, xs) =>
      val n = xs.length.toLong
      val kDists = (0L to 600L).map { v =>
        val le = xs.count(_ <= v).toLong
        val c = xs.count(_ == v).toLong
        math.abs(2L * le - c - n)
      }
      val minK = kDists.min
      val weights = kDists.map { kd =>
        val kHat = (kd - minK).toInt
        if (kHat < t.length) t(kHat) else 0L
      }
      val tot = weights.sum
      val target = u32s(k) * tot / 4294967296L
      var cum = 0L
      val drawn = (0L to 600L).find { v =>
        cum += weights(v.toInt); cum > target }.get
      assert(released(k) == ((n, drawn)),
        s"key $k: engine ${released(k)} vs replay ($n, $drawn)")
    }
  }

  test("dpQuantile (arbitrary rational quantile): the sensitivity-" +
      "normalized weight table replays from first principles, a " +
      "peaked group releases its exact value, and the 1/2 case " +
      "degenerates to the general-ε median") {
    import graft.operators.{Privacy, Sampling}
    // a peaked group at a budget where the peak dominates: at
    // ε/Δ = 2 the off-peak weight w(30) = 2^20·e^−30 quantizes to 0,
    // so only the true value carries mass — exact for every seed.
    // (At small ε the 600 tail points legitimately share real mass —
    // that noise IS the privacy, not a bug.)
    val peaked = Seq.fill(30)(("p", 77L)).toDF("source", "n_chars")
    val rp = Privacy.dpQuantile(peaked, "source", "n_chars", 600L,
      1, 4, 6.0, "secret:u:").collect()
    assert(rp.length == 1 && rp.head.getLong(2) == 77L)
    // q = 1/2 at matching ε IS the general-ε median (utility
    // |1·lt − 1·gt| = |lt − gt|, Δ = 1 — same table, same draw)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    val viaHalf = Privacy.dpQuantile(docs, "source", "n_chars", 600L,
      1, 2, 0.5, "secret:e:").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val viaMedian = Privacy.dpMedian(docs, "source", "n_chars", 600L,
      0.5, "secret:e:").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(viaHalf == viaMedian && viaHalf.nonEmpty)
    // first-principles replay at q = 1/4, ε = 0.5 (Δ = 3)
    val t = Privacy.medianWeightTable(0.5 / 3.0)
    val released = Privacy.dpQuantile(docs, "source", "n_chars",
      600L, 1, 4, 0.5, "secret:u:").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val vals = docs.select($"source", $"n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(v => math.min(math.max(v._2, 0L), 600L)).sorted }
    val u32s = docs.select($"source",
      Sampling.keyHash32($"source", "secret:u:")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    vals.foreach { case (k, xs) =>
      val n = xs.length.toLong
      val kDists = (0L to 600L).map { v =>
        val lt = xs.count(_ < v).toLong
        val gt = xs.count(_ > v).toLong
        math.abs(3L * lt - gt)
      }
      val minK = kDists.min
      val weights = kDists.map { kd =>
        val kHat = (kd - minK).toInt
        if (kHat < t.length) t(kHat) else 0L
      }
      val tot = weights.sum
      val target = u32s(k) * tot / 4294967296L
      var cum = 0L
      val drawn = (0L to 600L).find { v =>
        cum += weights(v.toInt); cum > target }.get
      assert(released(k) == ((n, drawn)),
        s"key $k: engine ${released(k)} vs replay ($n, $drawn)")
    }
    // improper fractions refuse
    intercept[IllegalArgumentException](Privacy.dpQuantile(docs,
      "source", "n_chars", 600L, 3, 2, 0.5, "secret:u:"))
  }

  test("release ledger: records idempotently by release id, stores a " +
      "seed FINGERPRINT (never the seed), audits as an exact fold, " +
      "and survives compaction with replayed ids still no-ops") {
    import graft.operators.{Privacy, TxBatch}
    val p = "/tmp/graft_privacy_ledger/ledger"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    assert(Privacy.recordRelease(spark, p, 1L, "ds", "counts", "k",
      500000L, 20L, "topsecret:1:", "2026-01-01"))
    assert(Privacy.recordRelease(spark, p, 2L, "ds", "sum", "k",
      250000L, 20L, "topsecret:2:", "2026-01-02"))
    assert(Privacy.recordRelease(spark, p, 3L, "other", "median", "k",
      1386294L, 7L, "topsecret:3:", "2026-01-03"))
    // a retried release pipeline re-records a settled id: no-op
    assert(!Privacy.recordRelease(spark, p, 2L, "ds", "sum", "k",
      250000L, 20L, "topsecret:2:", "2026-01-02"))
    val rows = Privacy.readLedger(spark, p).collect()
    assert(rows.length == 3)
    // the seed itself never lands on disk — only its fingerprint
    rows.foreach(r => assert(!r.toSeq.map(String.valueOf)
      .exists(_.contains("topsecret")), r.toString))
    assert(rows.map(_.getAs[String]("seed_fp")).toSet ==
      Set("topsecret:1:", "topsecret:2:", "topsecret:3:")
        .map(Privacy.seedFingerprint))
    def auditMap() = Privacy.budgetAudit(spark, p).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val audit = auditMap()
    // the audit equals an independent fold of the release plan
    assert(audit == Map(
      "ds" -> ((2L, 750000L, 40L)),
      "other" -> ((1L, 1386294L, 7L))), audit.toString)
    // the ledger is an ordinary TxBatch layout: it compacts (baseless
    // at gen 0 — explicit schema), the audit is unchanged, and a
    // pre-compaction release id replays as a no-op via the folded set
    assert(TxBatch.compact(spark, p, "bucket",
      schema = Some(Privacy.LedgerSchema)))
    assert(auditMap() == audit)
    assert(!Privacy.recordRelease(spark, p, 1L, "ds", "counts", "k",
      500000L, 20L, "topsecret:1:", "2026-01-01"))
    assert(auditMap() == audit)
    // the enforceable gate: 'ds' has spent 750000 micro-ε — a cap of
    // 1000000 admits a 250000 release and then REFUSES the next one;
    // a settled id retried at cap stays a no-op (already counted)
    assert(Privacy.recordReleaseWithinBudget(spark, p, 4L, "ds",
      "histogram", "k", 250000L, 20L, "topsecret:4:", "2026-01-04",
      capMicro = 1000000L))
    val e = intercept[IllegalStateException](
      Privacy.recordReleaseWithinBudget(spark, p, 5L, "ds", "sum",
        "k", 1L, 20L, "topsecret:5:", "2026-01-05",
        capMicro = 1000000L))
    assert(e.getMessage.contains("budget exceeded"), e.getMessage)
    assert(!Privacy.recordReleaseWithinBudget(spark, p, 4L, "ds",
      "histogram", "k", 250000L, 20L, "topsecret:4:", "2026-01-04",
      capMicro = 1000000L))
    assert(auditMap()("ds") == ((3L, 1000000L, 60L)), auditMap())
  }

  test("dpMean's two halves are independent PRF draws from one seed: " +
      "the count noise equals a dpCounts draw at eps/2 under " +
      "seed+'count:', and the released mean is the q6 quotient of " +
      "the noised pair") {
    val eps = 0.5
    val mean = Privacy.dpMean(docs, "source", "n_chars", eps, 400L,
      "secret:m:").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val countHalf = Privacy.dpCounts(docs, "source", eps / 2.0,
      "secret:m:count:").collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(mean.keySet == countHalf.keySet && mean.nonEmpty)
    mean.foreach { case (k, (rc, rs, rm)) =>
      assert(rc == countHalf(k),
        s"key $k: mean's count half $rc != dpCounts at eps/2 " +
          s"${countHalf(k)}")
      val q6 = math.floor(rs.toDouble / math.max(rc, 1L).toDouble *
        1000000.0 + 0.5) / 1000000.0
      assert(rm == q6, s"key $k: mean $rm != q6 quotient $q6")
    }
  }

  test("dpTopK is pure post-processing of the known-domain count " +
      "release: the winners are exactly the k largest RELEASED " +
      "counts (never the true ranking), ties break by key, absent " +
      "domain keys compete on pure noise, and re-running republishes " +
      "the identical selection") {
    import org.apache.spark.sql.functions.{col => c}
    val eps = 0.5
    val domain = (0 to 24).map(i => s"src$i").toDF("source")
    val rel = Privacy.dpCounts(docs, "source", eps, "secret:t:", domain)
      .select(c("source"), c("released")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = rel.sortBy { case (k, v) => (-v, k) }.take(5)
      .zipWithIndex.map { case ((k, v), i) => (k, v, i + 1L) }
    val got = Privacy.dpTopK(docs, "source", eps, "secret:t:",
      domain, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq, s"${got.toSeq} vs ${expect.toSeq}")
    // release-once: the identical draw, selection and ranks
    val again = Privacy.dpTopK(docs, "source", eps, "secret:t:",
      domain, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
    // k past the domain returns the whole ranked domain, no padding
    assert(Privacy.dpTopK(docs, "source", eps, "secret:t:",
      domain, 100).count() == 25L)
    intercept[IllegalArgumentException](
      Privacy.dpTopK(docs, "source", eps, "secret:t:", domain, 0))
  }

  test("dpCrosstab releases the whole public cell domain under ONE " +
      "epsilon: every row lands in exactly one cell (the true counts " +
      "fold back to the in-domain row count), absent cells release " +
      "pure noise, out-of-domain cells are dropped, and the release " +
      "is deterministic per (cell, seed)") {
    import org.apache.spark.sql.functions.{col => c, expr => e}
    val eps = 0.5
    // sf0.001 buckets span [0, 5] — domain [0, 3] leaves real
    // out-of-domain cells to pin the drop rule
    val domain = (for { i <- 0 to 24; b <- 0L to 3L }
      yield (s"src$i", b)).toDF("source", "len_bucket")
    val cells = docs.select(c("source"),
      e("n_chars DIV 100").as("len_bucket"))
    val rel = Privacy.dpCrosstab(cells, "source", "len_bucket",
      eps, "secret:x:", domain)
    val rows = rel.collect().map(r => ((r.getString(0), r.getLong(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // one row per domain cell, never more
    assert(rows.size == 25 * 4)
    // sensitivity-1 accounting: in-domain true counts fold to the
    // in-domain row count (each row in exactly one cell)
    val inDomain = cells.filter(c("len_bucket").between(0L, 3L))
      .count()
    assert(rows.values.map(_._1).sum == inDomain && inDomain > 0)
    // absent cells release pure noise around zero
    val absent = rows.filter(_._2._1 == 0L)
    assert(absent.nonEmpty)
    absent.foreach { case (k, (_, noise, released)) =>
      assert(released == math.floorDiv(noise + 500000L, 1000000L), s"$k")
    }
    // out-of-domain buckets exist in the data but not in the output
    assert(cells.filter(c("len_bucket") > 3L).count() > 0)
    assert(!rows.keySet.exists(_._2 > 3L))
    // release-once determinism
    val again = Privacy.dpCrosstab(cells, "source", "len_bucket",
      eps, "secret:x:", domain).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again == rows)
    // a one-column domain is refused
    intercept[IllegalArgumentException](Privacy.dpCrosstab(cells,
      "source", "len_bucket", eps, "s", domain.select(c("source"))))
  }

  test("the ledger writer lease: two CONCURRENT near-cap release " +
      "pipelines never BOTH land under the cap — the loser runs its " +
      "check AFTER the winner's row is visible and refuses; the " +
      "lease is released on the success and refusal paths alike") {
    for (round <- 1 to 3) {
      val p = s"/tmp/graft_privacy_lease/r$round"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      // cap 600000 admits ONE 500000 release: pre-lease, both
      // pipelines read spent=0 concurrently and both landed (the
      // documented r15 gap); under the lease the loser's check runs
      // after the winner's record and refuses
      val results =
        scala.collection.concurrent.TrieMap.empty[Long, Either[Throwable, Boolean]]
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq(10L, 11L).map { id =>
        val t = new Thread(() => {
          start.await()
          val r =
            try Right(Privacy.recordReleaseWithinBudget(spark, p, id,
              "ds", "counts", "k", 500000L, 5L, s"s:$id:",
              "2026-08-16", capMicro = 600000L))
            catch { case e: Throwable => Left(e) }
          results.put(id, r)
          ()
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(180000L))
      val rs = Seq(10L, 11L).flatMap(results.get)
      assert(rs.length == 2, s"round $round: a pipeline hung: $results")
      val wins = rs.count(_ == Right(true))
      val refusals = rs.count {
        case Left(e) => e.getMessage != null &&
          e.getMessage.contains("budget exceeded")
        case _ => false
      }
      assert(wins == 1 && refusals == 1,
        s"round $round: expected exactly one winner and one refusal, " +
          s"got $rs")
      assert(Privacy.readLedger(spark, p).count() == 1L,
        s"round $round: the cap admitted both releases")
      // both paths released the lease
      assert(!new java.io.File(s"$p/${Privacy.LeaseFile}").exists(),
        s"round $round: the lease leaked")
    }
  }

  test("a stale lease left by a dead holder is broken by mtime and " +
      "the pipeline proceeds; the audit row still lands exactly once") {
    val p = "/tmp/graft_privacy_lease/stale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val leaseDir = new java.io.File(s"$p/${Privacy.LeaseFile}")
    assert(leaseDir.mkdirs())
    val marker = new java.io.File(leaseDir, "owner")
    java.nio.file.Files.write(marker.toPath, "dead".getBytes("UTF-8"))
    // two minutes old — past the 60 s staleness horizon (the MARKER
    // carries the holder's age; contenders refresh the dir's mtime)
    assert(marker.setLastModified(
      System.currentTimeMillis() - 120000L))
    assert(Privacy.recordReleaseWithinBudget(spark, p, 1L, "ds",
      "counts", "k", 100000L, 5L, "s:1:", "2026-08-16",
      capMicro = 600000L))
    assert(Privacy.readLedger(spark, p).count() == 1L)
    assert(!leaseDir.exists(), "the broken-then-acquired lease leaked")
  }

  test("M26 fencing generation: a LIVE holder paused past staleMs " +
      "whose lease is stale-broken must NOT land its record after " +
      "the break — the fencing check refuses it, the thief's record " +
      "stands alone, and the ledger never overshoots the cap") {
    val p = "/tmp/graft_privacy_lease/fenced"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    // pipeline A passes its budget check (cap 600000 admits one
    // 500000 release), then pauses INSIDE the lease — long past the
    // break's staleness horizon. Pipeline B breaks the stale lease,
    // passes the same check (A recorded nothing yet), and records.
    // A then wakes: without fencing its record would land too
    // (1000000 > cap — the overshoot); the generation check refuses.
    val aStalled = new java.util.concurrent.CountDownLatch(1)
    val bDone = new java.util.concurrent.CountDownLatch(1)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Privacy.recordFailpoint = () =>
      if (fired.compareAndSet(false, true)) {
        aStalled.countDown()
        assert(bDone.await(120,
          java.util.concurrent.TimeUnit.SECONDS), "B never finished")
      }
    try {
      val aResult = new java.util.concurrent.atomic
        .AtomicReference[Either[Throwable, Boolean]]()
      val a = new Thread(() => {
        aResult.set(
          try Right(Privacy.recordReleaseWithinBudget(spark, p, 1L,
            "ds", "counts", "k", 500000L, 5L, "s:1:", "2026-08-16",
            capMicro = 600000L))
          catch { case e: Throwable => Left(e) })
        ()
      })
      a.start()
      assert(aStalled.await(120,
        java.util.concurrent.TimeUnit.SECONDS), "A never stalled")
      Thread.sleep(900L) // push A's marker past B's staleness horizon
      assert(Privacy.recordReleaseWithinBudget(spark, p, 2L, "ds",
        "counts", "k", 500000L, 5L, "s:2:", "2026-08-16",
        capMicro = 600000L, staleMs = 500L),
        "B (the breaker) must record")
      bDone.countDown()
      a.join(180000L)
      aResult.get() match {
        case Left(e: IllegalStateException) =>
          assert(e.getMessage.contains("BROKEN") &&
            e.getMessage.contains("fencing"), e.getMessage)
        case other => fail(
          s"A must be refused by the fencing check, got $other")
      }
      // exactly the thief's row — the cap was never overshot
      val rows = Privacy.readLedger(spark, p).collect()
      assert(rows.length == 1 &&
        rows.head.getAs[Long]("release_id") == 2L, rows.toSeq.toString)
      // A's ownership-checked release left B's world alone; nothing
      // holds the lease now
      assert(!new java.io.File(s"$p/${Privacy.LeaseFile}").exists())
    } finally Privacy.recordFailpoint = () => ()
  }
}
