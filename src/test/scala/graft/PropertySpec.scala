package graft

import graft.functions.{Fnv1aCore, GraftFunctions => F}

/** SURVEY.md §5.2 property tests (fixed-seed generated cases — the
  * scalatest/scalacheck bridge artifact is not on the offline
  * classpath, so cases are generated with a seeded PRNG):
  *  - hash: determinism, chaining == concatenation of LE byte images
  *    (fnv1a.rs:9-11, 68-79), seed sensitivity;
  *  - ordered retrieval: the floor/successor query shape against a
  *    10-line in-memory oracle on randomly generated sorted data —
  *    mirroring search.rs semantics minus its P3 underflow bug,
  *    including the below-min / duplicate-key cases the reference's
  *    own tests omit.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("hash determinism and seed sensitivity over random inputs") {
    (1 to 200).foreach { _ =>
      val xs = List.fill(rnd.nextInt(8))(rnd.nextLong())
      val h1 = xs.foldLeft(Fnv1aCore.OffsetBasis)((s, x) => Fnv1aCore.hashLong(x, s))
      val h2 = xs.foldLeft(Fnv1aCore.OffsetBasis)((s, x) => Fnv1aCore.hashLong(x, s))
      assert(h1 == h2)
      if (xs.nonEmpty) {
        val seeded = xs.foldLeft(Fnv1aCore.OffsetBasis ^ 1L)((s, x) =>
          Fnv1aCore.hashLong(x, s))
        assert(seeded != h1, s"seed must perturb the hash for $xs")
      }
    }
  }

  test("chaining equals concatenation of little-endian byte images") {
    (1 to 200).foreach { _ =>
      val xs = List.fill(1 + rnd.nextInt(4))(rnd.nextLong())
      val chained = xs.foldLeft(Fnv1aCore.OffsetBasis)((s, x) =>
        Fnv1aCore.hashLong(x, s))
      val bytes = xs.flatMap { x =>
        (0 until 8).map(i => ((x >>> (8 * i)) & 0xff).toByte)
      }.toArray
      assert(Fnv1aCore.hashBytes(bytes, Fnv1aCore.OffsetBasis) == chained)
    }
  }

  test("expression chaining equals core chaining (multi-column hash)") {
    val data = Seq((1337L, "deadbeef"), (0L, ""), (-1L, "x"))
    val got = data.toDF("a", "b")
      .select(F.fnv1a($"a", $"b")).collect().map(_.getLong(0))
    val want = data.map { case (a, b) =>
      Fnv1aCore.hashBytes(b.getBytes("UTF-8"),
        Fnv1aCore.hashLong(a, Fnv1aCore.OffsetBasis))
    }
    assert(got.toSeq == want)
  }

  /** The 10-line oracle: floor = greatest element <= probe, successor =
    * least element > probe (None when absent) — search.rs:51-124
    * semantics. */
  private def floorOracle(sorted: Vector[Long], p: Long): Option[Long] =
    sorted.takeWhile(_ <= p).lastOption
  private def succOracle(sorted: Vector[Long], p: Long): Option[Long] =
    sorted.find(_ > p)

  test("floor/successor query shape matches the in-memory oracle") {
    (1 to 25).foreach { _ =>
      // duplicates likely (range -20..20), probes straddle below-min/above-max
      val sorted = Vector.fill(1 + rnd.nextInt(30))(
        (rnd.nextInt(41) - 20).toLong).sorted
      val p = (rnd.nextInt(61) - 30).toLong
      val df = sorted.toDF("k")
      val floorGot = df.filter($"k" <= p).orderBy($"k".desc).limit(1)
        .collect().headOption.map(_.getLong(0))
      val succGot = df.filter($"k" > p).orderBy($"k".asc).limit(1)
        .collect().headOption.map(_.getLong(0))
      assert(floorGot == floorOracle(sorted, p), s"floor($sorted, $p)")
      assert(succGot == succOracle(sorted, p), s"succ($sorted, $p)")
    }
  }

  test("dotd matches a driver-side left fold and is exactly symmetric") {
    import org.apache.spark.sql.functions.col
    val vecs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(17)(rnd.nextDouble() * 4 - 2))
    }
    val df = vecs.toDF("id", "v")
    val got = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        F.dotd(col("a.v"), col("b.v")).as("ab"),
        F.dotd(col("b.v"), col("a.v")).as("ba"))
      .collect()
    val byId = vecs.toMap
    got.foreach { r =>
      val want = byId(r.getLong(0)).zip(byId(r.getLong(1)))
        .foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(want))
      // x*y == y*x per element and the fold order is positional, so
      // symmetry holds EXACTLY, not just approximately
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("embed near-dup finds randomly planted duplicates, nothing else") {
    import org.apache.spark.sql.functions.col
    // 150 random 64-dim vectors (pairwise cosine far below tau with
    // overwhelming probability), plus 5 planted near-copies.
    val base = (0 until 150).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val dupOf = (0 until 5).map(_ => rnd.nextInt(150)).distinct
    val planted = dupOf.zipWithIndex.map { case (src, j) =>
      val v = base(src)._2
      val k = rnd.nextInt(64)
      ((1000 + j).toLong,
        v.zipWithIndex.map { case (x, i) => if (i == k) x * 1.0005 else x })
    }
    val df = (base ++ planted).toDF("vec_id", "v")
    val got = graft.queries.Pipeline.embedNearDupPairs(df, 0.99)
      .select(col("va"), col("vb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = dupOf.zipWithIndex
      .map { case (src, j) => (src.toLong, (1000 + j).toLong) }.toSet
    assert(got == want, s"got $got, want $want")
  }

  test("three as-of spellings agree on random keyed time series") {
    import graft.operators.AsOfJoin
    import org.apache.spark.sql.functions.{col, max => fmax}
    (1 to 5).foreach { trial =>
      // Small key domain forces duplicate keys; small ts domain forces
      // equal/straddling timestamps including before-first probes.
      def rows(n: Int) = Seq.fill(n)(
        (rnd.nextInt(6).toLong, rnd.nextInt(40), rnd.nextInt(1000)))
      val probe = rows(60 + rnd.nextInt(60)).toDF("k", "ts", "pv")
      // determinism contract: build unique per (key, ts)
      val build = rows(40 + rnd.nextInt(40)).toDF("bk", "bts", "bv")
        .groupBy($"bk", $"bts").agg(fmax($"bv").as("bv"))
      def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) = {
        f(probe, build).select(col("k"), col("ts"), col("pv"), col("bv"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
            if (r.isNullAt(3)) None else Some(r.getInt(3)))).sorted
      }
      val window = run((p, b) => AsOfJoin.asof(p, b,
        p("k"), b("bk"), p("ts"), b("bts"), Seq("bv")))
      // asofMerge, not asofNative: Auto would broadcast these tiny
      // frames and the merge exec would silently leave the 3-way check
      val merge = run((p, b) => AsOfJoin.asofMerge(p, b,
        p("k"), b("bk"), p("ts"), b("bts"), Seq("bv")))
      val bcast = run((p, b) => AsOfJoin.asofBroadcast(p, b,
        p("k"), b("bk"), p("ts"), b("bts"), Seq("bv")))
      assert(merge.toSeq == window.toSeq, s"trial $trial merge != window")
      assert(bcast.toSeq == window.toSeq, s"trial $trial broadcast != window")
    }
  }

  test("winnowing shared-run guarantee on random token sequences") {
    val vocabA = (0 until 400).map(i => s"a$i")
    val vocabB = (0 until 400).map(i => s"b$i")
    (1 to 10).foreach { trial =>
      val runLen = 6 + rnd.nextInt(10)
      val run = (0 until runLen).map(i => s"shared${trial}_$i")
      def doc(vocab: IndexedSeq[String]) = {
        val pre = Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        val post = Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        (pre ++ run ++ post).mkString(" ")
      }
      val docs = Seq((1L, doc(vocabA)), (2L, doc(vocabB)))
        .toDF("doc_id", "text")
      val fps = graft.queries.Pipeline.winnowFingerprints(docs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert((fps(1L) & fps(2L)).nonEmpty,
        s"trial $trial: ${runLen}-token shared run must share a fingerprint")
    }
  }
}
