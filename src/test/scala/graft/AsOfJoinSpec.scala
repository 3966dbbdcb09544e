package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Edge-case matrix for the as-of join, mirroring the reference's
  * positional tests for `greatest_not_exceeding`
  * (/root/reference/src/algo/search.rs:214-292): probe below the first
  * build row (None ⇒ null payload, search.rs:66-68), at an exact match
  * (inclusive), between rows (floor), at/after the last row — plus the
  * multi-key and duplicate-probe cases the reference omits. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  // build: key "a" has ts 10, 20, 30; key "b" has ts 15. payload v=ts*10.
  private lazy val build = Seq(
    ("a", 10L, 100L), ("a", 20L, 200L), ("a", 30L, 300L), ("b", 15L, 150L)
  ).toDF("k", "bts", "v")

  private def run(probes: Seq[(String, Long)]): Map[(String, Long), Option[Long]] = {
    val probe = probes.toDF("k", "ts")
    val res = AsOfJoin.asof(probe, build,
      probe("k"), build("k"), probe("ts"), build("bts"), Seq("v"))
    res.collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap
  }

  test("floor semantics across the positional matrix") {
    val out = run(Seq(
      ("a", 5L),   // below first  -> None      (search.rs:66-68)
      ("a", 10L),  // exact first  -> inclusive
      ("a", 25L),  // between      -> floor 20
      ("a", 30L),  // exact last   -> 30
      ("a", 99L),  // after last   -> 30
      ("b", 14L),  // other key, below its only row -> None
      ("b", 15L),  // other key, exact -> 150
      ("c", 50L)   // key with no build rows at all -> None
    ))
    assert(out(("a", 5L)).isEmpty)
    assert(out(("a", 10L)).contains(100L))
    assert(out(("a", 25L)).contains(200L))
    assert(out(("a", 30L)).contains(300L))
    assert(out(("a", 99L)).contains(300L))
    assert(out(("b", 14L)).isEmpty)
    assert(out(("b", 15L)).contains(150L))
    assert(out(("c", 50L)).isEmpty)
  }

  test("every probe row is preserved exactly once (left semantics)") {
    val probes = Seq(("a", 25L), ("a", 25L), ("z", 1L))
    val probe = probes.toDF("k", "ts")
    val res = AsOfJoin.asof(probe, build,
      probe("k"), build("k"), probe("ts"), build("bts"), Seq("v"))
    assert(res.count() == 3)
  }
}
