package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking: the coverage and overlap
  * contracts behind the `doc_chunks` oracle row. */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def toksOf(s: String) = s.split(" ", -1).toSeq

  test("chunks cover every token and consecutive chunks share overlap") {
    val text = (1 to 29).map(i => s"t$i").mkString(" ")
    val out = Chunking.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"),
        maxTokens = 8, overlap = 3)
      .orderBy($"chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // stride 5, n 29 -> ceil(26/5) = 6 chunks
    assert(out.length == 6)
    // full reconstruction: stride-prefix of each chunk + tail of last
    val rebuilt = out.dropRight(1).map(_._2.split(" ").take(5).mkString(" "))
      .mkString(" ") + " " + out.last._2
    assert(rebuilt == text, "stride prefixes must reconstruct the doc")
    // consecutive chunks share exactly `overlap` tokens
    out.sliding(2).foreach { case Array((_, a, _), (_, b, _)) =>
      assert(toksOf(a).takeRight(3) == toksOf(b).take(3),
        s"overlap mismatch between '$a' and '$b'")
    }
    // n_tokens matches the actual chunk
    out.foreach { case (_, t, n) => assert(toksOf(t).length == n) }
  }

  test("short docs pass through as a single whole chunk") {
    val out = Chunking.chunkDocs(
        Seq((1L, "just five tokens right here"), (2L, "one"))
          .toDF("doc_id", "text"),
        maxTokens = 16, overlap = 4)
      .orderBy($"doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getString(2) == "just five tokens right here")
    assert(out(0).getLong(3) == 5L)
    assert(out(1).getString(2) == "one" && out(1).getLong(3) == 1L)
  }

  test("boundary shapes: exact multiple, one-past, zero overlap") {
    def chunkCount(n: Int, maxT: Int, ov: Int): Long =
      Chunking.chunkDocs(
        Seq((1L, (1 to n).map("t" + _).mkString(" "))).toDF("doc_id", "text"),
        maxT, ov).count()
    assert(chunkCount(16, 16, 4) == 1, "exactly maxTokens -> one chunk")
    assert(chunkCount(17, 16, 4) == 2, "one past -> two chunks")
    assert(chunkCount(24, 12, 0) == 2, "zero overlap tiles exactly")
    assert(chunkCount(25, 12, 0) == 3)
  }

  test("null text chunks as empty (no phantom maxTokens chunk)") {
    val out = Chunking.chunkDocs(
        Seq((1L, null: String), (2L, "")).toDF("doc_id", "text"), 16, 4)
      .orderBy($"doc_id").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getString(2) == "" && r.getLong(3) == 1L,
        s"null/empty doc must yield one empty chunk, got $r")
    }
  }

  test("minTokens gates without tokenizing the corpus twice") {
    val docs = Seq((1L, "one two three"), (2L, "just two")).toDF("doc_id", "text")
    val out = Chunking.chunkDocs(docs, 16, 4, minTokens = 3)
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L))
    // the gate is a scalar space-count predicate, so exactly ONE
    // split survives in the plan (a size(split(...)) gate gets
    // pushdown-inlined below the projection and splits twice);
    // assert on a real scan — a literal fixture constant-folds it
    val plan = Chunking.chunkDocs(
        Tables.documents(spark, sf).select($"doc_id", $"text"),
        16, 4, minTokens = 3)
      .queryExecution.optimizedPlan.toString
    assert("split\\(".r.findAllIn(plan).length == 1,
      s"text must be tokenized exactly once:\n${plan.take(1500)}")
  }

  test("chunking plans with no shuffle") {
    val df = Chunking.chunkDocs(
      Tables.documents(spark, sf).select($"doc_id", $"text"), 16, 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must be shuffle-free:\n${plan.take(1500)}")
    // every token of every doc lands in >= 1 chunk (sum of stride
    // coverage): total chunk tokens >= total doc tokens
    val docToks = Tables.documents(spark, sf)
      .agg(sum(size(split($"text", " ")))).as[Long].head()
    val chunkToks = df.agg(sum($"n_tokens")).as[Long].head()
    assert(chunkToks >= docToks, s"$chunkToks < $docToks")
  }
}
