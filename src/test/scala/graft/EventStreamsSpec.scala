package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Drives the streaming operators through MemoryStream micro-batches
  * and checks them against the batch twin on the same rows — the
  * batch/stream equivalence that makes the DuckDB oracle meaningful
  * for T1–T5. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class EventStreamsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val sample: Seq[Ev] =
    Tables.events(spark, sf).orderBy($"event_id").limit(300)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].collect().toSeq

  test("streaming tumbling counts equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(sample)
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("t_tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("t_tumbling")
      .select($"window_start", $"event_type", $"n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStreams.tumblingCounts(sample.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows equal the batch twin (T3)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(sample)
    val q = EventStreams.sessionize(input.toDF())
      .writeStream.format("memory").queryName("t_session")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_session")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = EventStreams.sessionize(sample.toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops re-delivered events (T5, append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val dupped = sample.take(50) ++ sample.take(25) // 25 redeliveries
    input.addData(dupped)
    val q = EventStreams.dedup(input.toDF())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("t_dedup").count() == 50)
    assert(spark.table("t_dedup").select($"event_id").distinct().count() == 50)
  }

  test("dedup state is EVICTED once the watermark passes (bounded state)") {
    // The 100 TB/day contract: dropDuplicatesWithinWatermark keeps an
    // id's state only within the watermark horizon. Timeline (1h delay):
    //   b1: id=1 @ T0            -> emitted, state created
    //   b2: id=1 @ T0+10min      -> in-horizon re-delivery, dropped
    //   b3: id=3 @ T0+3h         -> watermark advances to T0+2h;
    //                               id=1 state (T0 + 1h < wm) evicted
    //   b4: id=1 @ T0+2h30min    -> state gone, emitted AGAIN
    // The second emission is exactly what proves eviction happened.
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000L)
    val input = MemoryStream[Ev]
    val q = EventStreams.dedup(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("t_evict")
      .outputMode("append").start()
    try {
      input.addData(Ev(1L, at(0), 7L, "c", 1.0)); q.processAllAvailable()
      input.addData(Ev(1L, at(10), 7L, "c", 1.0)); q.processAllAvailable()
      input.addData(Ev(3L, at(180), 7L, "c", 1.0)); q.processAllAvailable()
      input.addData(Ev(1L, at(150), 7L, "c", 1.0)); q.processAllAvailable()
    } finally q.stop()
    val byId = spark.table("t_evict").groupBy($"event_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(3L) == 1L)
    assert(byId(1L) == 2L,
      "id=1 must be re-emitted after its state is watermark-evicted " +
        "(1 emission = state never evicted; unbounded state)")
  }

  test("update output mode re-emits only changed windows (T9)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // watermark wide enough that no row in the unordered sample is late
    val q = EventStreams.tumblingCounts(input.toDF(), watermark = "40 days")
      .writeStream.format("memory").queryName("t_update")
      .outputMode("update").start()
    try {
      val (b1, b2) = sample.splitAt(150)
      input.addData(b1); q.processAllAvailable()
      val afterFirst = spark.table("t_update").count()
      input.addData(b2); q.processAllAvailable()
      val afterSecond = spark.table("t_update").count()
      assert(afterFirst > 0)
      assert(afterSecond > afterFirst, "second batch must emit updated windows")
      // final state per (window, type) = the LAST update row, which must
      // match the batch twin computed over all rows
      val lastUpdates = spark.table("t_update")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      val batch = EventStreams.tumblingCounts(sample.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(lastUpdates == batch)
    } finally q.stop()
  }

  test("streamed event transitions equal the batch lead window (T14)") {
    implicit val sqlCtx = spark.sqlContext
    // fixture slice, fed in (ts, event_id) order across micro-batches
    val evs = Tables.events(spark, sf)
      .filter($"user_id" < 10)
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("ts"), $"event_type")
      .as[EventStreams.TypedEvent].collect()
      .sortBy(e => (e.ts, e.event_id)).toSeq
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.transitionStream(input.toDS())
      .writeStream.format("memory").queryName("t_trans")
      .outputMode("append").start()
    try {
      evs.grouped(200).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_trans")
      .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    // batch twin over the same slice
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = evs.toDF()
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming first-touch counts equal the batch twin (T19)") {
    implicit val sqlCtx = spark.sqlContext
    // event-time-ordered feed (the documented contract: first arrival
    // = first touch) across several micro-batches
    val ordered = sample.sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Ev]
    val q = EventStreams.firstTouchCounts(input.toDF())
      .writeStream.format("memory").queryName("t_firsttouch")
      .outputMode("complete").start()
    try {
      ordered.grouped(100).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_firsttouch")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val batch = sample.toDF()
      .groupBy($"user_id").agg(min(date_trunc("day", $"ts")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("bounded first-touch (withinWatermark) equals the batch twin on an in-horizon feed") {
    implicit val sqlCtx = spark.sqlContext
    // while every event sits inside one watermark horizon the bounded
    // variant must agree with the exact one (divergence only begins
    // when a user RETURNS after a full watermark gap — re-activation)
    val ordered = sample.sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Ev]
    val q = EventStreams.firstTouchCountsBounded(
        input.toDF(), watermark = "10 days")
      .writeStream.format("memory").queryName("t_firsttouch_b")
      .outputMode("complete").start()
    try {
      ordered.grouped(100).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_firsttouch_b")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val batch = sample.toDF()
      .groupBy($"user_id").agg(min(date_trunc("day", $"ts")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stateful running totals accumulate across micro-batches (T6)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("t_totals")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        EventStreams.UserEvent(1L, 7L, 2.0),
        EventStreams.UserEvent(2L, 7L, 3.0)))
      q.processAllAvailable()
      input.addData(Seq(EventStreams.UserEvent(3L, 7L, 5.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_totals").filter($"user_id" === 7L)
      .orderBy($"n_events").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 3L))
    assert(rows.last.getDouble(2) == 10.0)
  }

  test("file stream source -> parquet streaming sink round trip (S9/S10)") {
    val out = "/tmp/graft_stream_sink/out"
    val ckpt = "/tmp/graft_stream_sink/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft_stream_sink"))
    // the file stream source requires a directory of files
    val srcDir = new java.io.File("/tmp/graft_stream_sink/src")
    srcDir.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val src = EventStreams.fileSource(spark, srcDir.toString)
    val q = EventStreams.tumblingCounts(src)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // Append mode only emits windows finalized by the watermark:
    // window_end <= max(event ts) - 1h delay.
    val batch = EventStreams.tumblingCounts(Tables.events(spark, sf))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val maxTs = Tables.events(spark, sf)
      .agg(max($"ts")).collect().head.getTimestamp(0).getTime
    val hourMs = 3600 * 1000L
    val expected = batch.filter(_._1.getTime + hourMs <= maxTs - hourMs).toSet
    val sunk = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(sunk == expected)
    assert(sunk.nonEmpty)
  }

  test("checkpoint recovery restores flatMapGroupsWithState state: " +
      "transitions spanning the restart boundary are emitted") {
    val base = "/tmp/graft_state_recover"
    val (srcDir, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    new java.io.File(srcDir).mkdirs()
    val typed = Tables.events(spark, sf)
      .select($"event_id", $"user_id", expr("unix_micros(ts)").as("ts"),
        $"event_type")
    val mid = typed.agg(percentile_approx($"ts", lit(0.5), lit(100000))
      .cast("long")).collect().head.getLong(0)
    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
    }
    deliver(typed.filter($"ts" <= mid).orderBy($"ts", $"event_id"), "b1")
    def run(): Unit = {
      val src = spark.readStream
        .schema("event_id LONG, user_id LONG, ts LONG, event_type STRING")
        .parquet(srcDir)
        .as[EventStreams.TypedEvent]
      val q = EventStreams.transitionStream(src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run() // processes the first half, persists each user's last event
    deliver(typed.filter($"ts" > mid).orderBy($"ts", $"event_id"), "b2")
    run() // restart: state restored from the checkpoint
    val streamed = spark.read.parquet(out)
      .groupBy($"user_id", $"from_type", $"to_type")
      .count().as[(Long, String, String, Long)].collect().toSeq.sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = typed
      .withColumn("from_type", lag($"event_type", 1).over(w))
      .filter($"from_type".isNotNull)
      .groupBy($"user_id", $"from_type", $"event_type".as("to_type"))
      .count().as[(Long, String, String, Long)].collect().toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch)
    // the cross-boundary pairs exist at all only because each user's
    // last pre-restart event was restored from the state store
    val straddlers = typed.filter($"ts" > mid)
      .select($"user_id").distinct().as[Long].collect().toSet intersect
      typed.filter($"ts" <= mid)
        .select($"user_id").distinct().as[Long].collect().toSet
    assert(straddlers.nonEmpty, "fixture must straddle the boundary")
  }

  test("checkpoint recovery: restart resumes exactly-once, no re-emission") {
    val base = "/tmp/graft_stream_recover"
    val (srcDir, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    new java.io.File(srcDir).mkdirs()
    // Two halves of events, delivered across a stop/restart boundary.
    // Split the RAW file (whatever physical ts type this fixture
    // generation carries) so the halves match the schema fileSource
    // probes from the footer.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val rawTs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => $"ts"
      case _ => unix_micros($"ts".cast("timestamp"))
    }
    val mid = raw.agg(percentile_approx(rawTs, lit(0.5), lit(100000))
      .cast("long")).collect().head.getLong(0)
    val all = Tables.events(spark, sf)
    // the file source lists plain files (no subdir recursion) — land
    // each delivery as a single parquet file in the watched dir
    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
    }
    deliver(raw.filter(rawTs <= mid), "batch1")
    def run(): Unit = {
      val src = EventStreams.fileSource(spark, srcDir)
      val q = EventStreams.tumblingCounts(src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run() // first run processes batch1, then stops
    deliver(raw.filter(rawTs > mid), "batch2")
    run() // restart from the checkpoint picks up ONLY batch2
    // Exactly-once across the restart: the union of emissions equals
    // the single-run batch twin (same watermark finalization rule),
    // with no window emitted twice.
    val sunk = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(sunk.length == sunk.toSet.size, "a window was re-emitted")
    val batch = EventStreams.tumblingCounts(all)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val maxTs = all.agg(max($"ts")).collect().head.getTimestamp(0).getTime
    val hourMs = 3600 * 1000L
    val expected = batch.filter(_._1.getTime + hourMs <= maxTs - hourMs).toSet
    assert(sunk.toSet == expected)
  }

  test("streaming as-of enrichment via the custom broadcast operator") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val half = sample.length / 2
    // static dimension: per-user "rate" changes at known times
    val build = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, Timestamp.valueOf("2024-06-01 00:00:00"), 2.0),
      (2L, Timestamp.valueOf("2024-03-01 00:00:00"), 5.0))
      .toDF("bk", "bts", "rate")
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[Double])]
    val q = EventStreams.asofEnrichEachBatch(
      stream.toDF(), build, "user_id", "bk", "ts", "bts", Seq("rate")) {
      out =>
        collected.synchronized {
          collected ++= out.select($"event_id", $"rate").collect()
            .map(r => (r.getLong(0),
              if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        }
    }.outputMode("append").start()
    stream.addData(sample.take(half))
    q.processAllAvailable()
    stream.addData(sample.drop(half))
    q.processAllAvailable()
    q.stop()
    // batch twin over the same rows through the same operator
    val probeDf = sample.toDF()
    val expected = graft.operators.AsOfJoin.asofBroadcast(
        probeDf, build,
        probeDf("user_id"), build("bk"), probeDf("ts"), build("bts"), Seq("rate"))
      .select($"event_id", $"rate").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(collected.size == sample.size, "every event enriched exactly once")
    assert(collected.toSet == expected)
  }

  test("stream-stream interval self-join matches the batch pairing (T8)") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[Ev]
    val right = MemoryStream[Ev]
    left.addData(sample)
    right.addData(sample)
    val q = EventStreams.followWithin5Min(left.toDF(), right.toDF())
      .writeStream.format("memory").queryName("t_follow")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_follow").count()
    val df = sample.toDF()
    val batch = df.as("l").join(df.as("r"), org.apache.spark.sql.functions.expr(
      """l.user_id = r.user_id AND
        |r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTES""".stripMargin)).count()
    assert(streamed == batch)
  }

  test("stream-static enrichment joins the dimension (T7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(sample.take(20))
    val dim = Seq((7L, "gold"), (3L, "silver")).toDF("user_id", "tier")
    val q = EventStreams.enrichStatic(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("t_enrich")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("t_enrich")
    assert(out.count() == 20)
    assert(out.columns.contains("tier"))
  }

  /** The full fixture as event-time-ordered typed rows — the arrival
    * contract of the per-user stage-state twins (intra-batch order is
    * restored by the operators' local sort; cross-batch order is the
    * feed's contract, as in the transitions test). */
  private lazy val ordered: Seq[EventStreams.TypedEvent] =
    Tables.events(spark, sf)
      .select(expr("unix_micros(ts)").as("ts"), $"event_id",
        $"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .as[EventStreams.TypedEvent].collect().toSeq

  test("streaming windowFunnel equals the batch funnel across " +
      "micro-batch splits (T10)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.funnelStream(input.toDS(),
        Seq("view", "click", "purchase"), 86400000000L)
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("append").start()
    try {
      ordered.grouped(700).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_funnel")
      .groupBy($"user_id").agg(max($"level").as("level"))
      .as[(Long, Int)].collect().toMap
    val batch = graft.operators.Funnel.windowFunnel(
        Tables.events(spark, sf)
          .select($"user_id", $"ts", $"event_type"),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
      .select($"user_id", $"level")
      .as[(Long, Int)].collect().toMap
    assert(streamed == batch && streamed.nonEmpty)
    // and therefore the query row's stage counts
    val counts = SparkEntry.queries("funnel")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(counts("1_view") == streamed.count(_._2 >= 1))
    assert(counts("2_click") == streamed.count(_._2 >= 2))
    assert(counts("3_purchase") == streamed.count(_._2 >= 3))
  }

  test("streaming session paths equal the batch session_window " +
      "sessionization across micro-batch splits (T12)") {
    implicit val sqlCtx = spark.sqlContext
    // a far-future sentinel per user closes every real session; the
    // sentinel's own one-event session stays open in state and is
    // never emitted, so emitted paths cover EXACTLY the real sessions
    val maxTs = ordered.map(_.ts).max
    val sentinels = ordered.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => EventStreams.TypedEvent(-1L - i, u,
        maxTs + 86400000000L, "__flush")
    }
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.pathsStream(input.toDS())
      .writeStream.format("memory").queryName("t_paths")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(800).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_paths")
      .select($"user_id", $"session_start", $"path")
      .as[(Long, Long, String)].collect().toSeq.sorted
    val batch = Tables.events(spark, sf)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(array_join(transform(
        sort_array(collect_list(struct($"ts", $"event_id", $"event_type"))),
        e => e.getField("event_type")), ">").as("path"))
      .select($"user_id", expr("unix_micros(w.start)"), $"path")
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch)
    assert(!streamed.exists(_._3.contains("__flush")))
  }

  test("streaming anomaly flags equal the batch rolling_anomaly " +
      "across micro-batch splits (T22)") {
    implicit val sqlCtx = spark.sqlContext
    // one far-future sentinel per event type closes each type's last
    // real day; the sentinel's own day stays open in state, so no
    // sentinel row is ever emitted
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("t_anomaly")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(750).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_anomaly")
      .select($"event_type", $"day", $"n_events", $"base_sum",
        $"is_anomaly")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    val batch = SparkEntry.queries("rolling_anomaly")(spark, sf)
      .select($"event_type", $"day", $"n_events", $"base_sum",
        $"is_anomaly")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming cohort cells equal the batch cohort_retention " +
      "across micro-batch splits (T11)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.cohortStream(input.toDS())
      .writeStream.format("memory").queryName("t_cohort")
      .outputMode("append").start()
    try {
      ordered.grouped(900).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    // cells are emitted exactly once per (user, active week)
    val cells = spark.table("t_cohort")
    assert(cells.count() == cells.distinct().count())
    val streamed = cells
      .groupBy($"cohort_week_day", $"week_no")
      .agg(count_distinct($"user_id").as("n_active"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("cohort_retention")(spark, sf)
      .select(expr("unix_micros(cohort_week) div 86400000000")
        .as("cwd"), $"week_no", $"n_active")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  private lazy val valuedOrdered: Seq[EventStreams.ValuedEvent] =
    Tables.events(spark, sf)
      .select($"event_id", $"user_id", expr("unix_micros(ts)").as("ts"),
        $"event_type",
        floor($"value" * lit(10000.0) + lit(0.5)).cast("long")
          .as("v_micro"))
      .orderBy($"ts", $"event_id")
      .as[EventStreams.ValuedEvent].collect().toSeq

  private lazy val cutMicros: Long =
    spark.sql("SELECT unix_micros(TIMESTAMP '2024-01-16')")
      .as[Long].head()

  test("streaming PSI equals the batch psi_drift across micro-batch " +
      "splits (L86 live)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams.psiStream(input.toDS(), cutMicros)
      .writeStream.format("memory").queryName("t_psi")
      .outputMode("append").start()
    try {
      valuedOrdered.grouped(800).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val latest = spark.table("t_psi")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"seq".desc)))
      .filter($"rn" === 1)
      .select($"event_type", $"n_bins", $"skipped_bins", $"na", $"nb",
        $"psi")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("psi_drift")(spark, sf)
      .select($"event_type", $"n_bins", $"skipped_bins", $"na", $"nb",
        $"psi")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(latest == batch && latest.nonEmpty)
    // the stream emitted LIVE interim verdicts, not one final dump
    assert(spark.table("t_psi").count() > latest.size)
  }

  test("streaming binned KS equals the batch KS over the same bins " +
      "across micro-batch splits (G26 live, windowed variant)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams.ksStreamBinned(input.toDS(), cutMicros)
      .writeStream.format("memory").queryName("t_ks")
      .outputMode("append").start()
    try {
      valuedOrdered.grouped(900).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val latest = spark.table("t_ks")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"seq".desc)))
      .filter($"rn" === 1)
      .select($"event_type", $"n1", $"n2", $"d_num", $"ks_stat",
        $"crit_05", $"reject_05")
      .as[(String, Long, Long, Long, Double, Double, Long)]
      .collect().toSet
    // the batch twin: the ks_drift spelling verbatim, per event type,
    // over the SAME fixed-width bins (the windowed variant's contract)
    import graft.queries.QueryUtil.q6
    val cutTs = lit("2024-01-16 00:00:00").cast("timestamp")
    val byBin = Tables.events(spark, sf)
      .select($"event_type", ($"ts" < cutTs).as("inA"),
        floor($"value" / lit(25.0)).cast("long").as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(sum(when($"inA", 1L).otherwise(0L)).as("c1"),
        sum(when(!$"inA", 1L).otherwise(0L)).as("c2"))
    val w = Window.partitionBy($"event_type").orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = byBin
      .withColumn("cum1", sum($"c1").over(w))
      .withColumn("cum2", sum($"c2").over(w))
    val tot = byBin.groupBy($"event_type")
      .agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    val batch = cums.join(tot, "event_type")
      .select($"event_type", $"n1", $"n2",
        abs($"cum1" * $"n2" - $"cum2" * $"n1").as("gap"))
      .groupBy($"event_type", $"n1", $"n2")
      .agg(max($"gap").as("d_num"))
      .select($"event_type", $"n1", $"n2", $"d_num",
        q6($"d_num".cast("double") /
          ($"n1".cast("double") * $"n2".cast("double"))).as("ks_stat"),
        q6(lit(1.358) * sqrt(($"n1" + $"n2").cast("double") /
          ($"n1".cast("double") * $"n2".cast("double")))).as("crit_05"))
      .withColumn("reject_05",
        when($"ks_stat" > $"crit_05", 1L).otherwise(0L))
      .as[(String, Long, Long, Long, Double, Double, Long)]
      .collect().toSet
    assert(latest == batch && latest.nonEmpty)
  }

  test("streaming CUSUM equals the batch cusum_changepoints across " +
      "micro-batch splits (T26 live, calibrated reference)") {
    implicit val sqlCtx = spark.sqlContext
    // the calibrated reference: per-type Σx, Σx², day count — computed
    // batch-side once (the deployment shape: the live fold monitors
    // against a frozen baseline)
    val ref = Tables.events(spark, sf)
      .groupBy($"event_type",
        datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(sum($"n").as("sn"), sum($"n" * $"n").as("sq"),
        count(lit(1)).as("nd"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (t, sn, sq, nd) =>
        t -> EventStreams.CusumRef(sn, sq, nd) }.toMap
    // sentinels close each type's final real day (their own day stays
    // open in state and is never emitted)
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.cusumStream(input.toDS(), ref)
      .writeStream.format("memory").queryName("t_cusum")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(700).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_cusum")
      .select($"event_type", $"day", $"n_events", $"v_scaled",
        $"is_change")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    val batch = SparkEntry.queries("cusum_changepoints")(spark, sf)
      .select($"event_type", $"day", $"n_events", $"v_scaled",
        $"is_change")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming EWMA control equals the batch ewma_control across " +
      "micro-batch splits (T33 live, calibrated reference)") {
    implicit val sqlCtx = spark.sqlContext
    // calibrated reference: per-type Σx, Σx², day count over the
    // reference window (the control-chart deployment shape)
    val ref = Tables.events(spark, sf)
      .groupBy($"event_type",
        datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(sum($"n").as("sn"), sum($"n" * $"n").as("sq"),
        count(lit(1)).as("nd"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (t, sn, sq, nd) =>
        t -> EventStreams.EwmaRef(sn, sq, nd) }.toMap
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.ewmaStream(input.toDS(), ref)
      .writeStream.format("memory").queryName("t_ewma")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(750).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_ewma")
      .select($"event_type", $"day", $"n_events", $"ewma", $"z",
        $"is_ooc")
      .as[(String, Long, Long, Double, Double, Long)]
      .collect().toSeq.sorted
    val batch = SparkEntry.queries("ewma_control")(spark, sf)
      .select($"event_type", $"day", $"n_events", $"ewma", $"z",
        $"is_ooc")
      .as[(String, Long, Long, Double, Double, Long)]
      .collect().toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming Mann-Kendall and Theil-Sen: the latest verdict per " +
      "type equals the batch rows across micro-batch splits (T31/T35 " +
      "live)") {
    implicit val sqlCtx = spark.sqlContext
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val inMk = MemoryStream[EventStreams.TypedEvent]
    val inTs = MemoryStream[EventStreams.TypedEvent]
    val qMk = EventStreams.mkStream(inMk.toDS())
      .writeStream.format("memory").queryName("t_mk")
      .outputMode("append").start()
    val qTs = EventStreams.tsStream(inTs.toDS())
      .writeStream.format("memory").queryName("t_ts")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(650).foreach { b =>
        inMk.addData(b); qMk.processAllAvailable()
        inTs.addData(b); qTs.processAllAvailable()
      }
    } finally { qMk.stop(); qTs.stop() }
    import org.apache.spark.sql.expressions.Window
    val wLatest = Window.partitionBy($"event_type")
      .orderBy($"n_days".desc)
    val mkLatest = spark.table("t_mk")
      .withColumn("rn", row_number().over(wLatest)).filter($"rn" === 1)
      .select($"event_type", $"n_days", $"s_stat", $"tie_term",
        $"var18", $"z", $"is_trend")
      .as[(String, Long, Long, Long, Long, Double, Long)]
      .collect().toSet
    val mkBatch = SparkEntry.queries("mann_kendall_trend")(spark, sf)
      .select($"event_type", $"n_days", $"s_stat", $"tie_term",
        $"var18", $"z", $"is_trend")
      .as[(String, Long, Long, Long, Long, Double, Long)]
      .collect().toSet
    assert(mkLatest == mkBatch && mkLatest.nonEmpty)
    val tsLatest = spark.table("t_ts")
      .withColumn("rn", row_number().over(wLatest)).filter($"rn" === 1)
      .select($"event_type", $"n_days", $"n_pairs", $"sen_slope")
      .as[(String, Long, Long, Double)].collect().toSet
    val tsBatch = SparkEntry.queries("theil_sen")(spark, sf)
      .select($"event_type", $"n_days", $"n_pairs", $"sen_slope")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(tsLatest == tsBatch && tsLatest.nonEmpty)
    // live interim verdicts were emitted, not one final dump
    assert(spark.table("t_mk").count() > mkLatest.size)
    assert(spark.table("t_ts").count() > tsLatest.size)
  }

  test("streaming ACF: the latest verdict per (type, lag) equals the " +
      "batch autocorr_daily rows across micro-batch splits (T37 live)") {
    implicit val sqlCtx = spark.sqlContext
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.acfStream(input.toDS())
      .writeStream.format("memory").queryName("t_acf")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(700).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val wLatest = Window.partitionBy($"event_type", $"lag")
      .orderBy($"n_days".desc)
    val latest = spark.table("t_acf")
      .withColumn("rn", row_number().over(wLatest)).filter($"rn" === 1)
      .select($"event_type", $"lag", $"n_days", $"n_pairs", $"r")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("autocorr_daily")(spark, sf)
      .select($"event_type", $"lag", $"n_days", $"n_pairs", $"r")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(latest == batch && latest.nonEmpty)
    // live interim verdicts were emitted, not one final dump
    assert(spark.table("t_acf").count() > latest.size)
  }

  test("streaming seasonal strength and Spearman: the latest verdict " +
      "per type equals the batch rows across micro-batch splits " +
      "(T39/G31 live)") {
    implicit val sqlCtx = spark.sqlContext
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val vSentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.ValuedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t, 0L)
    }
    val inSs = MemoryStream[EventStreams.TypedEvent]
    val inSp = MemoryStream[EventStreams.ValuedEvent]
    val qSs = EventStreams.seasonalStrengthStream(inSs.toDS())
      .writeStream.format("memory").queryName("t_ss")
      .outputMode("append").start()
    val qSp = EventStreams.spearmanStream(inSp.toDS())
      .writeStream.format("memory").queryName("t_spear")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(650).foreach { b =>
        inSs.addData(b); qSs.processAllAvailable()
      }
      (valuedOrdered ++ vSentinels).grouped(650).foreach { b =>
        inSp.addData(b); qSp.processAllAvailable()
      }
    } finally { qSs.stop(); qSp.stop() }
    import org.apache.spark.sql.expressions.Window
    val wLatest = Window.partitionBy($"event_type")
      .orderBy($"n_days".desc)
    val ssLatest = spark.table("t_ss")
      .withColumn("rn", row_number().over(wLatest)).filter($"rn" === 1)
      .select($"event_type", $"n_days", $"ss_resid_c2",
        $"ss_total_c2", $"strength")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val ssBatch = SparkEntry.queries("seasonal_strength")(spark, sf)
      .select($"event_type", $"n_days", $"ss_resid_c2",
        $"ss_total_c2", $"strength")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(ssLatest == ssBatch && ssLatest.nonEmpty)
    val spLatest = spark.table("t_spear")
      .withColumn("rn", row_number().over(wLatest)).filter($"rn" === 1)
      .select($"event_type", $"n_days", $"rho")
      .as[(String, Long, Double)].collect().toSet
    val spBatch = SparkEntry.queries("spearman_corr")(spark, sf)
      .select($"event_type", $"n_days", $"rho")
      .as[(String, Long, Double)].collect().toSet
    assert(spLatest == spBatch && spLatest.nonEmpty)
    // live interim verdicts were emitted, not one final dump
    assert(spark.table("t_ss").count() > ssLatest.size)
    assert(spark.table("t_spear").count() > spLatest.size)
  }

  test("psiStream state stays bounded under an adversarial wide-range " +
      "feed: bins clamp into the overflow end bins") {
    implicit val sqlCtx = spark.sqlContext
    // values spanning ~10¹⁵ micro-units — unbounded feeds grew the old
    // histogram without limit; the clamp caps it at binCeil−binFloor+1
    val hostile = (0 until 2000).map { i =>
      EventStreams.ValuedEvent(i.toLong, 1L,
        if (i % 2 == 0) 0L else 10L, "t",
        (i.toLong - 1000L) * 1000000000000L)
    }
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams.psiStream(input.toDS(), cutMicros = 5L)
      .writeStream.format("memory").queryName("t_psi_hostile")
      .outputMode("append").start()
    try {
      hostile.grouped(500).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val nBins = spark.table("t_psi_hostile")
      .agg(max($"n_bins")).as[Long].head()
    assert(nBins <= 512L, s"state must clamp at 512 bins, got $nBins")
    // counts are conserved into the overflow bins, not dropped
    val last = spark.table("t_psi_hostile")
      .orderBy($"seq".desc).select($"na", $"nb")
      .as[(Long, Long)].head()
    assert(last._1 + last._2 == 2000L, s"clamp must not drop rows: $last")
  }

  test("cusumStream refuses out-of-order days across micro-batches " +
      "instead of silently reopening a closed day") {
    implicit val sqlCtx = spark.sqlContext
    val d0 = 19723L * 86400000000L
    val input = MemoryStream[EventStreams.TypedEvent]
    val ref = Map("t" -> EventStreams.CusumRef(10L, 40L, 3L))
    val q = EventStreams.cusumStream(input.toDS(), ref)
      .writeStream.format("memory").queryName("t_cusum_ooo")
      .outputMode("append").start()
    try {
      // open day 2 (late in the day, so the one-day watermark horizon
      // still admits a day-1 row — the refusal must fire, not the
      // engine's late filter)
      input.addData(Seq(EventStreams.TypedEvent(1L, 1L,
        d0 + 2L * 86400000000L + 82800000000L, "t")))
      q.processAllAvailable()
      input.addData(Seq(EventStreams.TypedEvent(2L, 1L,
        d0 + 1L * 86400000000L + 84600000000L, "t")))
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("day-monotone")), e.getMessage)
    } finally q.stop()
  }

  test("event-time flush: the final open day closes WITHOUT a " +
      "sentinel — watermark progress from ANOTHER type's later event " +
      "(one day past the open day) emits the verdict; rows more than " +
      "a day stale drop as late data, not state corruption") {
    implicit val sqlCtx = spark.sqlContext
    val d0 = 19723L * 86400000000L
    def ev(id: Long, day: Long, hourMicros: Long, t: String) =
      EventStreams.TypedEvent(id, 1L, d0 + day * 86400000000L +
        hourMicros, t)
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.mkStream(input.toDS())
      .writeStream.format("memory").queryName("t_mk_flush")
      .outputMode("append").start()
    try {
      // type a: days 0..2 (counts 1, 2, 1); nothing later for a
      input.addData(Seq(ev(1L, 0L, 0L, "a"), ev(2L, 1L, 0L, "a"),
        ev(3L, 1L, 1L, "a"), ev(4L, 2L, 0L, "a")))
      q.processAllAvailable()
      // a's day 2 is still open: the watermark has not passed its end
      assert(spark.table("t_mk_flush")
        .filter($"event_type" === "a").count() == 2L)
      // type b lands on day 4 — one day PAST a's open-day end, so the
      // global watermark (1-day delay) reaches day 3 and a's final
      // day flushes via the event-time timeout, no sentinel anywhere
      input.addData(Seq(ev(9L, 4L, 3600000000L, "b")))
      q.processAllAvailable()
      val aRows = spark.table("t_mk_flush")
        .filter($"event_type" === "a")
        .select($"n_days", $"s_stat").as[(Long, Long)]
        .collect().toSet
      // the flushed verdict covers all 3 closed days: x = 1, 2, 1 →
      // S = (1<2) + (1=1 ties 0) + (2>1 → −1) = 0
      assert(aRows.contains((3L, 0L)), aRows.toString)
      // a stale row for a's watermark-closed day drops as LATE data
      // (standard watermark semantics) — no exception, no state
      // corruption, no new emission
      val before = spark.table("t_mk_flush").count()
      input.addData(Seq(ev(10L, 2L, 1L, "a")))
      q.processAllAvailable()
      assert(spark.table("t_mk_flush").count() == before)
    } finally q.stop()
  }

  test("drift-monitor idle-type eviction (psiStream opt-in): a quiet " +
      "type's histogram retires after the idle horizon and a " +
      "reappearing type restarts a fresh histogram (seq resets); " +
      "the default keeps NoTimeout semantics") {
    implicit val sqlCtx = spark.sqlContext
    val d0 = 19723L * 86400000000L
    val cut = d0 + 86400000000L // A window = day 0, B = later
    def ev(id: Long, day: Long, hourMicros: Long, t: String,
        vMicro: Long) = EventStreams.ValuedEvent(id, 1L,
      d0 + day * 86400000000L + hourMicros, t, vMicro)
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams.psiStream(input.toDS(), cut,
        evictAfterDays = 2)
      .writeStream.format("memory").queryName("t_psi_evict")
      .outputMode("append").start()
    def stateRows(): Long = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).last
    try {
      // type a: the SAME bin populated in both windows → it emits
      input.addData(Seq(ev(1L, 0L, 0L, "a", 100L),
        ev(2L, 1L, 0L, "a", 100L), ev(3L, 1L, 0L, "wm", 0L)))
      q.processAllAvailable()
      val aRows = spark.table("t_psi_evict")
        .filter($"event_type" === "a").count()
      assert(aRows >= 1L)
      assert(stateRows() == 2L, s"a and wm: ${stateRows()}")
      // a goes quiet; wm advances the watermark past a's idle
      // horizon (last a event day 1 + 2 days) → a's histogram retires
      input.addData(Seq(ev(4L, 5L, 3600000000L, "wm", 0L)))
      q.processAllAvailable()
      input.addData(Seq(ev(5L, 6L, 3600000000L, "wm", 0L)))
      q.processAllAvailable()
      assert(stateRows() == 1L,
        s"quiet type must retire its histogram: ${stateRows()}")
      // a reappears on the B side only: a FRESH histogram has no
      // A-window mass, so nothing emits (the surviving pre-eviction
      // histogram HAD A-window mass in this bin and would have
      // emitted another verdict) — and the type holds state again
      input.addData(Seq(ev(6L, 6L, 7200000000L, "a", 100L)))
      q.processAllAvailable()
      assert(spark.table("t_psi_evict")
        .filter($"event_type" === "a").count() == aRows,
        "a fresh histogram must not emit off one-sided mass")
      assert(stateRows() == 2L, stateRows().toString)
    } finally q.stop()
  }

  test("drift-monitor eviction never fires BETWEEN the micro-batches " +
      "of an actively-feeding type, even one lagging the global " +
      "watermark: the timeout is re-armed with a full quiet horizon " +
      "(never clamped to watermark+1), so its A-window histogram " +
      "keeps emitting while a genuinely idle type still retires") {
    implicit val sqlCtx = spark.sqlContext
    val d0 = 19723L * 86400000000L
    val cut = d0 + 86400000000L // A window = day 0, B = later
    def ev(id: Long, dayMicros: Long, t: String, vMicro: Long) =
      EventStreams.ValuedEvent(id, 1L, d0 + dayMicros, t, vMicro)
    val day = 86400000000L
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams.psiStream(input.toDS(), cut,
        evictAfterDays = 1)
      .writeStream.format("memory").queryName("t_psi_lag")
      .outputMode("append").start()
    try {
      // lag: A-window mass + first B-window point; idle: same shape
      input.addData(Seq(ev(1L, 0L, "lag", 100L),
        ev(2L, day + day / 2L, "lag", 100L),
        ev(3L, 0L, "idle", 100L),
        ev(4L, day + day / 2L, "idle", 100L)))
      q.processAllAvailable()
      def emitted(t: String): Long = spark.table("t_psi_lag")
        .filter($"event_type" === t).count()
      val lag0 = emitted("lag")
      assert(lag0 >= 1L && emitted("idle") >= 1L)
      // the watermark sprints ahead via a third type while `lag`
      // keeps feeding every batch just above it — under the old
      // wm+1 clamp, `lag` could be evicted BETWEEN its own batches
      // once its event-time horizon fell behind the watermark;
      // `idle` stops feeding and must still retire
      var wmTs = day + day / 2L
      (1 to 5).foreach { i =>
        wmTs += day + day / 2L // watermark driver: +1.5 days per batch
        // lag trails the driver by half a day — always admitted
        // (above the 1-day-late cutoff), always behind the front
        input.addData(Seq(ev(100L + i, wmTs, "wm", 0L),
          ev(200L + i, wmTs - day / 2L, "lag", 100L)))
        q.processAllAvailable()
      }
      val lagN = emitted("lag")
      assert(lagN >= lag0 + 5L,
        s"an actively-feeding lagging type was evicted mid-stream: " +
          s"only $lagN emissions after 5 more fed batches (had $lag0); " +
          "its A-window histogram was discarded")
      // idle's histogram retired long ago (quiet past the horizon)
      val stateRows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).last
      assert(stateRows == 2L,
        s"expected only lag+wm to hold state, got $stateRows")
    } finally q.stop()
  }

  test("SPC idle-type eviction: a type that stops emitting is " +
      "flushed then REMOVED after evictAfterDays quiet days (the " +
      "state count drops), and a reappearing type restarts as a " +
      "FRESH series — the control-chart restart") {
    implicit val sqlCtx = spark.sqlContext
    val d0 = 19723L * 86400000000L
    def ev(id: Long, day: Long, hourMicros: Long, t: String) =
      EventStreams.TypedEvent(id, 1L, d0 + day * 86400000000L +
        hourMicros, t)
    val input = MemoryStream[EventStreams.TypedEvent]
    val q = EventStreams.mkStream(input.toDS(), evictAfterDays = 2)
      .writeStream.format("memory").queryName("t_mk_evict")
      .outputMode("append").start()
    def stateRows(): Long = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).last
    try {
      input.addData(Seq(ev(1L, 0L, 0L, "a"), ev(2L, 0L, 0L, "b")))
      q.processAllAvailable()
      // b's day-2 event pushes the watermark past a's day-0 end:
      // a's final day flushes, its state lingers pending eviction
      input.addData(Seq(ev(3L, 2L, 3600000000L, "b")))
      q.processAllAvailable()
      assert(spark.table("t_mk_evict")
        .filter($"event_type" === "a").count() == 1L)
      assert(stateRows() == 2L,
        s"both types hold state pre-eviction: ${stateRows()}")
      // two quiet days past a's closed day: the eviction timer fires
      // and a's state is REMOVED — b (still active) remains
      input.addData(Seq(ev(4L, 4L, 3600000000L, "b")))
      q.processAllAvailable()
      assert(stateRows() == 1L,
        s"idle type must evict after the quiet horizon: ${stateRows()}")
      // a reappears two days later: a FRESH series — its next close
      // reports n_days = 1 (surviving state would have carried the
      // pre-eviction day and reported 2)
      input.addData(Seq(ev(5L, 5L, 0L, "a")))
      q.processAllAvailable()
      input.addData(Seq(ev(6L, 7L, 3600000000L, "b")))
      q.processAllAvailable()
      val aDays = spark.table("t_mk_evict")
        .filter($"event_type" === "a")
        .select($"n_days").as[Long].collect().toSeq
      assert(aDays.length == 2 && aDays.forall(_ == 1L),
        s"reappearance must restart fresh: $aDays")
    } finally q.stop()
  }

  test("streaming runs test and turning points: the latest verdict " +
      "per type equals the batch rows across micro-batch splits " +
      "(T32/T40 live)") {
    implicit val sqlCtx = spark.sqlContext
    val types = ordered.map(_.event_type).distinct
    val maxTs = ordered.map(_.ts).max
    val sentinels = types.zipWithIndex.map { case (t, i) =>
      EventStreams.TypedEvent(-1L - i, -1L,
        maxTs + 30L * 86400000000L, t)
    }
    val inRuns = MemoryStream[EventStreams.TypedEvent]
    val inTurn = MemoryStream[EventStreams.TypedEvent]
    val qRuns = EventStreams.runsStream(inRuns.toDS())
      .writeStream.format("memory").queryName("t_runs")
      .outputMode("append").start()
    val qTurn = EventStreams.turningStream(inTurn.toDS())
      .writeStream.format("memory").queryName("t_turn")
      .outputMode("append").start()
    try {
      (ordered ++ sentinels).grouped(650).foreach { b =>
        inRuns.addData(b); qRuns.processAllAvailable()
        inTurn.addData(b); qTurn.processAllAvailable()
      }
    } finally { qRuns.stop(); qTurn.stop() }
    import org.apache.spark.sql.expressions.Window
    val wRuns = Window.partitionBy($"event_type")
      .orderBy(($"n1" + $"n2").desc)
    val runsLatest = spark.table("t_runs")
      .withColumn("rn", row_number().over(wRuns)).filter($"rn" === 1)
      .select($"event_type", $"n1", $"n2", $"runs", $"z",
        $"is_nonrandom")
      .as[(String, Long, Long, Long, Double, Long)].collect().toSet
    val runsBatch = SparkEntry.queries("runs_test_drift")(spark, sf)
      .select($"event_type", $"n1", $"n2", $"runs", $"z",
        $"is_nonrandom")
      .as[(String, Long, Long, Long, Double, Long)].collect().toSet
    assert(runsLatest == runsBatch && runsLatest.nonEmpty)
    val wLatest = Window.partitionBy($"event_type")
      .orderBy($"n_days".desc)
    val turnLatest = spark.table("t_turn")
      .withColumn("rn", row_number().over(wLatest)).filter($"rn" === 1)
      .select($"event_type", $"n_days", $"t_stat", $"z",
        $"is_nonrandom")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    val turnBatch = SparkEntry.queries("turning_points")(spark, sf)
      .select($"event_type", $"n_days", $"t_stat", $"z",
        $"is_nonrandom")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(turnLatest == turnBatch && turnLatest.nonEmpty)
    // live interim verdicts were emitted, not one final dump
    assert(spark.table("t_runs").count() > runsLatest.size)
    assert(spark.table("t_turn").count() > turnLatest.size)
  }

  test("streaming touch attribution equals the batch query across " +
      "micro-batch splits (T24)") {
    implicit val sqlCtx = spark.sqlContext
    val valued = Tables.events(spark, sf)
      .select($"event_id", $"user_id", expr("unix_micros(ts)").as("ts"),
        $"event_type",
        floor($"value" * lit(10000.0) + lit(0.5)).cast("long")
          .as("v_micro"))
      .orderBy($"ts", $"event_id")
      .as[EventStreams.ValuedEvent].collect().toSeq
    val input = MemoryStream[EventStreams.ValuedEvent]
    val q = EventStreams.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("t_attr")
      .outputMode("append").start()
    try {
      valued.grouped(800).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamedRows = spark.table("t_attr")
      .groupBy($"event_type", $"touch_position")
      .agg(count(lit(1)).as("n_touches"),
        (sum($"credit_micro").cast("double") / 10000.0).as("credit"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("touch_attribution")(spark, sf)
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamedRows == batch && streamedRows.nonEmpty)
  }
}
