package graft

import graft.operators.SetSimJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SetSimJoinSpec extends SparkSuite {

  /** Deterministic synthetic sets over a small universe: set i holds
    * elements derived from a seeded FNV walk, sizes 3..12 — enough
    * collisions that many pairs land near the τ boundary. */
  private def fixture(n: Int): Seq[(Long, Seq[Long])] =
    (0 until n).map { i =>
      def mix(x: Long): Long = {
        val z = x * 6364136223846793005L + 1442695040888963407L
        (z ^ (z >>> 31)) & Long.MaxValue
      }
      val sz = 3 + (mix(i.toLong * 7 + 1) % 10).toInt
      val elems = (0 until sz).map(j => mix(i.toLong * 31 + j) % 40)
        .distinct
      (i.toLong, elems)
    }

  private def brute(sets: Seq[(Long, Seq[Long])], num: Int, den: Int) =
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = sa.toSet.intersect(sb.toSet).size
      if inter.toLong * (den + num) >= (sa.size + sb.size).toLong * num
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter.toLong)).toSet

  private def run(sets: Seq[(Long, Seq[Long])], num: Int, den: Int,
      cap: Int = 1024) = {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", ArrayType(LongType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sets.map { case (i, e) => Row(i, e) }, 3),
      schema)
    SetSimJoin.selfJoin(df, "id", "s", num, den, cap)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_inter"))).toSet
  }

  test("exact parity with the quadratic brute force at several taus") {
    val sets = fixture(60)
    for ((num, den) <- Seq((1, 2), (1, 3), (3, 4)))
      assert(run(sets, num, den) === brute(sets, num, den),
        s"tau=$num/$den")
  }

  test("boundary pairs exactly at tau are kept, just below are dropped") {
    // |a|=|b|=4, inter=2: J = 2/6 = 1/3 — kept at tau=1/3, dropped at 2/5
    val sets = Seq(
      (1L, Seq(1L, 2L, 3L, 4L)),
      (2L, Seq(1L, 2L, 5L, 6L)))
    assert(run(sets, 1, 3) === Set((1L, 2L, 4L, 4L, 2L)))
    assert(run(sets, 2, 5) === Set.empty)
  }

  test("identical and disjoint sets") {
    val sets = Seq(
      (1L, Seq(7L, 8L, 9L)),
      (2L, Seq(7L, 8L, 9L)),
      (3L, Seq(20L, 21L, 22L)))
    assert(run(sets, 9, 10) === Set((1L, 2L, 3L, 3L, 3L)))
  }

  test("hot shared-prefix bucket: tiny cap loses no pairs (chunk path)") {
    // 30 sets all sharing rare element 999 in their prefix; cap=4
    // forces CandidatePairs' hash-chunked hot path
    val sets = (0 until 30).map { i =>
      (i.toLong, Seq(999L, 1000L + i, 2000L + i))
    }
    // J(a,b) = 1/5 for any pair (share only 999 of 3+3 elements)
    assert(run(sets, 1, 5, cap = 4) === brute(sets, 1, 5))
    assert(run(sets, 1, 5, cap = 4).size === 30 * 29 / 2)
  }

  test("recall is complete vs an LSH-free ground truth on clustered data") {
    // clusters of near-identical sets: every intra-cluster pair must
    // be found (the exact-join contract MinHash cannot give)
    val base = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val sets = (0 until 12).map { i =>
      (i.toLong, base.map(_ + (i / 4) * 100L) ++ Seq(10000L + i))
    }
    val got = run(sets, 1, 2)
    val want = brute(sets, 1, 2)
    assert(got === want)
    assert(want.size === 3 * (4 * 3 / 2)) // 3 clusters x C(4,2)
  }
}
