package graft

import graft.operators.{Chunking, TextCleanup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation projections are STATELESS — no watermark, no state
  * store — so the same operators that clean a 100 TB batch corpus run
  * unchanged over a document stream (the ingest-time shape: redact
  * and chunk as crawl output arrives, not in a nightly batch). These
  * tests pin that batch/stream equivalence the way EventStreamsSpec
  * does for the windowed operators. */
case class Doc(doc_id: Long, text: String)

class StreamingCurationSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "mail me at a@b.co or call 555-123-4567 about spark rows"),
    Doc(2L, "server 10.0.0.1 emits " + (1 to 40).map("tok" + _).mkString(" ")),
    Doc(3L, "clean text with no pii at all"))

  test("PII redaction over a stream equals the batch projection") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    input.addData(docs)
    val q = input.toDF()
      .select($"doc_id" +:
        TextCleanup.redactPii($"text").as("clean_text") +:
        TextCleanup.piiCounts($"text"): _*)
      .writeStream.format("memory").queryName("s_redact")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("s_redact").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = docs.toDF()
      .select($"doc_id" +:
        TextCleanup.redactPii($"text").as("clean_text") +:
        TextCleanup.piiCounts($"text"): _*)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._2.contains("[EMAIL]")))
  }

  test("chunking over a stream equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    input.addData(docs)
    val q = Chunking.chunkDocs(input.toDF(), maxTokens = 8, overlap = 2)
      .writeStream.format("memory").queryName("s_chunks")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("s_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val batch = Chunking.chunkDocs(docs.toDF(), maxTokens = 8, overlap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.count(_._1 == 2L) > 1, "long doc must chunk in-stream")
  }
}
