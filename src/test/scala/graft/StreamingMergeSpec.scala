package graft

import graft.operators.Merge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming face of the M-family: a CDC changelog arriving over
  * micro-batches, applied to a running snapshot with foreachBatch —
  * the standard "CDC topic → lakehouse table" loop. Folding each
  * batch in arrival order must reach exactly the state of one-shot
  * application of the full log (batches deliver in seq order — the
  * topic-partition contract), including a delete-then-reinsert chain
  * that spans the batch boundary. */
case class CdcRow(k: Long, v: Double, op: String, seq: Long)

class StreamingMergeSpec extends SparkSuite {
  import spark.implicits._

  test("foreachBatch CDC apply across micro-batches equals one-shot apply") {
    implicit val sqlCtx = spark.sqlContext
    val snap0 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val batch1 = Seq(
      CdcRow(2L, 25.0, "U", 1L), // update existing
      CdcRow(4L, 40.0, "I", 1L), // insert new
      CdcRow(1L, 0.0, "D", 2L))  // delete existing
    val batch2 = Seq(
      CdcRow(1L, 11.0, "I", 3L), // reinsert after cross-batch delete
      CdcRow(4L, 45.0, "U", 3L), // update the batch-1 insert
      CdcRow(3L, 0.0, "D", 3L))

    var state = snap0
    val input = MemoryStream[CdcRow]
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          // localCheckpoint: the running snapshot must not chain
          // lineage across an unbounded number of batches
          state = Merge.applyChangelog(state, b, Seq("k"), "seq", "op")
            .localCheckpoint()
        }
      }
      .outputMode("append").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    val streamed = state.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oneShot = Merge.applyChangelog(snap0,
        (batch1 ++ batch2).toDF(), Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == oneShot)
    assert(streamed == Map(1L -> 11.0, 2L -> 25.0, 4L -> 45.0))
  }
}
