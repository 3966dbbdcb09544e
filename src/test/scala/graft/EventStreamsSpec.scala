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
}
