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
}
