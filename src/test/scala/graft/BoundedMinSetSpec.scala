package graft

import graft.functions.{BoundedMinSetBuffer, GraftFunctions => F}
import org.apache.spark.sql.functions._

/** The bounded membership aggregate under CandidatePairs: exact counts,
  * exact k-smallest sets, and survival of partial/merge plumbing
  * (serialize → shuffle → merge) under forced multi-partition input. */
class BoundedMinSetSpec extends SparkSuite {
  import spark.implicits._

  test("complete membership and exact count for groups under the cap") {
    val rows = Seq((1, 30L), (1, 10L), (1, 20L), (2, 5L), (2, 5L), (3, 7L))
    val got = rows.toDF("g", "id")
      .repartition(8) // force partial buffers + merges across tasks
      .groupBy($"g").agg(F.bounded_min_set($"id", 16).as("s"))
      .select($"g", $"s.cnt", $"s.ids")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(got == Set((1, 3L, Seq(10L, 20L, 30L)), (2, 2L, Seq(5L, 5L)),
      (3, 1L, Seq(7L))))
  }

  test("k smallest + exact count for a group far over the cap") {
    val n = 10000
    val cap = 32
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(n)(rnd.nextLong())
    val got = vals.map(v => (0, v)).toDF("g", "id")
      .repartition(16)
      .groupBy($"g").agg(F.bounded_min_set($"id", cap).as("s"))
      .select($"s.cnt", $"s.ids").head()
    assert(got.getLong(0) == n.toLong)
    assert(got.getSeq[Long](1) == vals.sorted.take(cap))
  }

  test("nulls are not counted and not kept") {
    val got = Seq(Some(3L), None, Some(1L), None, Some(2L))
      .toDF("id").select(lit(0).as("g"), $"id")
      .groupBy($"g").agg(F.bounded_min_set($"id", 8).as("s"))
      .select($"s.cnt", $"s.ids").head()
    assert(got.getLong(0) == 3L)
    assert(got.getSeq[Long](1) == Seq(1L, 2L, 3L))
  }

  test("buffer round-trips through serialize/deserialize") {
    val buf = new BoundedMinSetBuffer(4)
    Seq(9L, 1L, 8L, 2L, 7L, 3L).foreach(buf.add)
    val back = BoundedMinSetBuffer.deserialize(4, buf.serialized())
    assert(back.count == 6L)
    assert(back.sortedKept().toSeq == Seq(1L, 2L, 3L, 7L))
    val other = new BoundedMinSetBuffer(4)
    Seq(0L, 5L).foreach(other.add)
    back.mergeFrom(other)
    assert(back.count == 8L)
    assert(back.sortedKept().toSeq == Seq(0L, 1L, 2L, 3L))
  }
}
