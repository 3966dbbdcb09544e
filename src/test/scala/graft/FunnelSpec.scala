package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** windowFunnel must count only IN-ORDER stage chains inside the
  * window, advance on strictly-later events only, and agree with the
  * funnel query's per-stage counts. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private val stages = Seq("a", "b", "c", "d")

  private def run(events: Seq[(Long, java.sql.Timestamp, String)],
      window: String = "INTERVAL 1 HOUR"): Map[Long, Int] =
    Funnel.windowFunnel(events.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages, window)
      .select($"user_id", $"level").as[(Long, Int)].collect().toMap

  test("a 4-stage in-order chain reaches level 4; prefixes stop early") {
    val events = Seq(
      // user 1: full chain
      (1L, ts(0), "a"), (1L, ts(1), "b"), (1L, ts(2), "c"), (1L, ts(3), "d"),
      // user 2: a then c (skips b) -> level 1
      (2L, ts(0), "a"), (2L, ts(1), "c"),
      // user 3: out of order (b before its a) -> level 1
      (3L, ts(5), "a"), (3L, ts(1), "b"),
      // user 4: never enters (no stage-1 event) -> absent
      (4L, ts(0), "b"), (4L, ts(1), "c"))
    val got = run(events)
    assert(got == Map(1L -> 4, 2L -> 1, 3L -> 1), got.toString)
  }

  test("the window bounds the WHOLE chain from the entry event") {
    val events = Seq(
      (1L, ts(0), "a"), (1L, ts(20), "b"), (1L, ts(40), "c"),
      // user 2: b lands outside the 45m window -> level 1, and the
      // later a must not restart the clock
      (2L, ts(0), "a"), (2L, ts(59), "b"), (2L, ts(55), "a"))
    val got = run(events, "INTERVAL 45 MINUTES")
    assert(got(1L) == 3, s"within-window chain: $got")
    // user 2's earliest a is t0; the b at t59 exceeds t0+45m, and the
    // LATER a never re-anchors the funnel (entry = first stage-1)
    assert(got(2L) == 1, s"window must anchor at the first entry: $got")
  }

  test("equal timestamps do not advance a stage (strictly-after)") {
    val events = Seq((1L, ts(0), "a"), (1L, ts(0), "b"), (1L, ts(1), "b"))
    val got = run(events)
    assert(got(1L) == 2, "the same-instant b must not count; the later one does")
    val only = Seq((2L, ts(0), "a"), (2L, ts(0), "b"))
    assert(run(only)(2L) == 1)
  }

  test("level times: t_entry is the first stage-1 event, t_level its stage") {
    val events = Seq(
      (1L, ts(2), "a"), (1L, ts(0), "a"), (1L, ts(5), "b"))
    val row = Funnel.windowFunnel(events.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages, "INTERVAL 1 HOUR")
      .head()
    assert(row.getAs[java.sql.Timestamp]("t_entry") == ts(0))
    assert(row.getAs[Int]("level") == 2)
    assert(row.getAs[java.sql.Timestamp]("t_level") == ts(5))
  }

  test("the funnel query equals the operator's level counts") {
    val lv = Funnel.windowFunnel(
      Tables.events(spark, sf).select($"user_id", $"ts", $"event_type"),
      "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
    val byLevel = lv.groupBy($"level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val q = SparkEntry.queries("funnel")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def atLeast(i: Int) = byLevel.filter(_._1 >= i).values.sum
    assert(q("1_view") == atLeast(1))
    assert(q("2_click") == atLeast(2))
    assert(q("3_purchase") == atLeast(3))
    assert(q("1_view") >= q("2_click") && q("2_click") >= q("3_purchase"))
    assert(q("1_view") > 0)
  }
}
