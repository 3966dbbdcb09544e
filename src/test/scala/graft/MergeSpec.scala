package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** CDC semantics of [[graft.operators.Merge]]: latest-wins per key,
  * delete removes, insert-on-existing and update-on-absent both land
  * the row (idempotent at-least-once replay), untouched snapshot rows
  * pass through; SCD2 intervals tile each key's timeline. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "v")

  test("applyChangelog: upsert, delete, insert, latest-wins, pass-through") {
    val changes = Seq(
      (2L, "b", 21.0, "U", 1L),  // superseded update …
      (2L, "b", 22.0, "U", 2L),  // … latest wins
      (3L, "c", 30.0, "D", 1L),  // delete
      (5L, "e", 50.0, "I", 1L),  // fresh insert
      (4L, "d2", 41.0, "I", 1L), // insert on existing key = upsert
      (6L, "f", 60.0, "U", 1L))  // update on absent key = upsert
      .toDF("k", "name", "v", "op", "seq")
    val out = Merge.applyChangelog(snap, changes, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 10.0),   // untouched
      (2L, "b", 22.0),   // latest update
      (4L, "d2", 41.0),  // upserted via I
      (5L, "e", 50.0),   // inserted
      (6L, "f", 60.0)))  // upserted via U; 3 deleted
  }

  test("applyChangelog: delete then later re-insert resurrects the key") {
    val changes = Seq(
      (1L, "a", 10.0, "D", 1L),
      (1L, "a2", 11.0, "I", 2L))
      .toDF("k", "name", "v", "op", "seq")
    val out = Merge.applyChangelog(snap, changes, Seq("k"), "seq", "op")
      .filter($"k" === 1L).as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a2", 11.0)))
  }

  test("applyChangelog: empty changelog is identity") {
    val changes = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "name", "v", "op", "seq")
    val out = Merge.applyChangelog(snap, changes, Seq("k"), "seq", "op")
    assert(out.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      snap.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("scd2: intervals tile the timeline, exactly one current per key") {
    val ch = Seq(
      (1L, 10L, "s0"), (1L, 20L, "s1"), (1L, 30L, "s2"),
      (2L, 15L, "t0"))
      .toDF("k", "seq", "state")
    val out = Merge.scd2(ch, Seq("k"), "seq")
      .select($"k", $"seq", $"state", $"valid_from", $"valid_to",
        $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 10L, "s0", 10L, Some(20L), false),
      (1L, 20L, "s1", 20L, Some(30L), false),
      (1L, 30L, "s2", 30L, None, true),
      (2L, 15L, "t0", 15L, None, true)))
  }

  test("applyChangelog composes: per-batch folds == one combined fold") {
    // the property that makes the operator a valid foreachBatch CDC
    // sink: applying the log in arrival-order batches equals applying
    // it all at once (seq is global, so a later batch's change still
    // supersedes an earlier batch's)
    val batch1 = Seq(
      (2L, "b1", 21.0, "U", 1L), (3L, "c", 30.0, "D", 2L),
      (5L, "e", 50.0, "I", 3L))
      .toDF("k", "name", "v", "op", "seq")
    val batch2 = Seq(
      (2L, "b2", 22.0, "U", 4L), (5L, "e", 50.0, "D", 5L),
      (3L, "c2", 31.0, "I", 6L))
      .toDF("k", "name", "v", "op", "seq")
    val stepped = Merge.applyChangelog(
      Merge.applyChangelog(snap, batch1, Seq("k"), "seq", "op"),
      batch2, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val oneShot = Merge.applyChangelog(
      snap, batch1.unionByName(batch2), Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(stepped == oneShot)
    assert(stepped == Seq((1L, "a", 10.0), (2L, "b2", 22.0),
      (3L, "c2", 31.0), (4L, "d", 40.0)))
  }

  test("merge_upsert plan: no snapshot window, log-only shuffle profile") {
    // the snapshot side must reach the output through joins/filters
    // only — a Window over the snapshot would mean the big side is
    // being sorted. The single Window in the plan belongs to the
    // changelog (row_number over keys).
    val df = SparkEntry.queries("merge_upsert")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert("(?s)Window".r.findAllIn(p).size >= 1)
    assert(!p.contains("CartesianProduct"))
    // correctness cross-check vs a driver-side fold at toy scale
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .as[(Long, Double)].collect().toMap
    val merged = df.select($"o_orderkey", $"o_totalprice")
      .as[(Long, Double)].collect().toMap
    orders.keys.foreach { k =>
      if (k % 7 == 5) assert(!merged.contains(k), s"key $k not deleted")
      else if (k % 14 == 3)
        assert(merged(k) == orders(k) + 100.0, s"key $k missed re-update")
      else if (k % 7 == 3)
        assert(merged(k) == orders(k) + 50.0, s"key $k missed update")
      else assert(merged(k) == orders(k), s"key $k should be untouched")
      if (k % 11 == 2) assert(merged(-k) == orders(k), s"key $k not inserted")
    }
  }

  test("scd2_pit: facts get the state valid AT their timestamp") {
    // The query's semantics on a hand-checkable slice: every enriched
    // fact must carry the latest state change at-or-before its ts,
    // NULL before the first change — the driver-side floor scan is
    // the ground truth.
    val df = SparkEntry.queries("scd2_pit")(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2), Option(r.getString(3)),
      Option(r.getTimestamp(4)))).toSeq
    assert(got.nonEmpty)
    val changes = Tables.events(spark, sf)
      .filter($"user_id" % 5 === 0 &&
        $"event_type".isin("signup", "purchase"))
      .groupBy($"user_id", $"ts").agg(min($"event_type").as("state"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2.getTime).toSeq }
    val withState = got.count(_._4.isDefined)
    assert(withState > 0, "no fact found any state")
    assert(got.exists(_._4.isEmpty), "fixture should have pre-state facts")
    got.foreach { case (eid, uid, ts, state, since) =>
      val floor = changes
        .getOrElse(uid, Seq.empty[(Long, java.sql.Timestamp, String)])
        .filter(_._2.getTime <= ts.getTime).lastOption
      assert(state == floor.map(_._3), s"event $eid state mismatch")
      assert(since == floor.map(_._2), s"event $eid since mismatch")
    }
  }

  test("scd2_snapshot_at agrees with the per-user floor at the instant") {
    // M5 must be M4 evaluated at one fixed t: for every user with a
    // version covering t, the snapshot row carries the floor state;
    // users whose first version is after t are absent.
    val t = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val snap = SparkEntry.queries("scd2_snapshot_at")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Tables.events(spark, sf)
      .filter($"user_id" % 5 === 0 &&
        $"event_type".isin("signup", "purchase"))
      .groupBy($"user_id", $"ts").agg(min($"event_type").as("state"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .groupBy(_._1).flatMap { case (uid, vs) =>
        vs.sortBy(_._2.getTime).filter(_._2.getTime <= t.getTime)
          .lastOption.map(v => uid -> v._3)
      }
    assert(snap == expected)
    assert(snap.nonEmpty)
  }
}
