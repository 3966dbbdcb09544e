package graft

import graft.operators.{Chunking, Packing}
import org.apache.spark.sql.functions._

/** Offset sequence packing: the bounded-overflow, exactly-once,
  * order-preserving contracts behind the `pack_sequences` oracle row. */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val chunks = Chunking.chunkDocs(
      Tables.documents(spark, sf).select($"doc_id", $"text"), 16, 4)
    .select($"doc_id", $"chunk_id", $"n_tokens")

  test("every chunk packs exactly once; totals are conserved") {
    val packed = Packing.packChunks(chunks, budget = 64, nBuckets = 8)
    val (seqChunks, seqTokens) = packed
      .agg(sum($"n_chunks"), sum($"n_tokens"))
      .as[(Long, Long)].head()
    val (inChunks, inTokens) = chunks
      .agg(count(lit(1)), sum($"n_tokens")).as[(Long, Long)].head()
    assert(seqChunks == inChunks && seqTokens == inTokens)
  }

  test("bounded overflow: no sequence exceeds budget + maxChunk - 1") {
    val maxChunk = chunks.agg(max($"n_tokens")).as[Long].head()
    val over = Packing.packChunks(chunks, budget = 64, nBuckets = 8)
      .filter($"n_tokens" > 64 + maxChunk - 1)
    assert(over.count() == 0)
    // and the packing is non-degenerate: a non-tail sequence spans a
    // full 64-token offset window, so it holds at least
    // budget - (maxChunk - 1) tokens; only bucket tails may be shorter
    val packed = Packing.packChunks(chunks, budget = 64, nBuckets = 8)
    val under = packed.filter($"n_tokens" < 64 - (maxChunk - 1)).count()
    assert(under <= 8, s"only bucket tails may be under the floor: $under")
  }

  test("deterministic and insensitive to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packChunks(df, budget = 64, nBuckets = 8)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(run(chunks) == run(chunks.repartition(13)))
  }

  test("sequences are consecutive runs: first marker is the running min") {
    val packed = Packing.packChunks(chunks, budget = 64, nBuckets = 4)
      .orderBy($"bucket", $"seq_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val firsts = rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(firsts == firsts.sorted,
        "per bucket, sequence first-chunks must advance in chunk order")
    }
  }
}
