package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Row shapes for the streaming packing twin. */
case class PackChunkRow(doc_id: Long, chunk_id: Long, n_tokens: Long,
    bucket: Int)
case class PackAssignment(bucket: Int, doc_id: Long, chunk_id: Long,
    n_tokens: Long, seq_id: Long)
private[operators] case class PackBucketState(before: Long)

/** Sequence packing — grouping chunk rows into fixed-token-budget
  * training sequences, the last step between a chunked corpus and a
  * dataloader.
  *
  * True first-fit greedy packing is a sequential recurrence (each
  * decision depends on the running remainder), which is exactly the
  * kind of single-scan state a 100 TB operator must not have. This
  * operator instead implements OFFSET packing, which is fully
  * window-expressible and therefore distributed and deterministic:
  * chunks are ordered `(doc_id, chunk_id)` within a deterministic
  * hash bucket, and a chunk whose preceding-token cumulative sum is
  * `c` lands in sequence `c div budget`. Sequences are consecutive
  * chunks; a document's chunks stay in order; every chunk is packed
  * exactly once. The trade: a sequence can overrun the budget by at
  * most its last chunk minus one token (`n_tokens ≤ budget +
  * max_chunk − 1`) — the bounded-overflow contract dataloaders handle
  * by truncation, vs the unbounded padding waste of one-doc-per-row.
  *
  * Scale shape: the only wide operation is ONE window (sort + running
  * sum) partitioned by the hash bucket — `nBuckets` independent
  * packers, each seeing ~1/nBuckets of the corpus; the bucket hash is
  * the cross-engine md5 key ([[Sampling.keyHash32]]), so the oracle
  * replicates the assignment byte-for-byte. No global order, no
  * driver state.
  */
object Packing {

  /** @param chunks   (doc_id, chunk_id, n_tokens) relation
    *                  ([[Chunking.chunkDocs]] output shape)
    * @param budget   target tokens per sequence (overflow bounded by
    *                 the last chunk, see class doc)
    * @param nBuckets independent packers; a sequence never crosses a
    *                 bucket
    * @param salt     decorrelates the bucket hash from other
    *                 md5-keyed decisions (samples, splits) */
  def packChunks(chunks: DataFrame, budget: Int, nBuckets: Int = 64,
      salt: String = "pack:v1:"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("doc_id"), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("bucket",
        pmod(Sampling.keyHash32(col("doc_id"), salt), lit(nBuckets.toLong))
          .cast("int"))
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__before DIV CAST($budget AS BIGINT)"))
      .groupBy(col("bucket"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        min(struct(col("doc_id"), col("chunk_id"))).as("__first"))
      .select(col("bucket"), col("seq_id"), col("n_chunks"), col("n_tokens"),
        col("__first.doc_id").as("first_doc"),
        col("__first.chunk_id").as("first_chunk"))
  }

  /** The STREAMING twin of [[packChunks]]: per-chunk sequence
    * assignments over an unbounded chunk stream. Offset packing is a
    * per-bucket running recurrence, which is exactly what
    * `flatMapGroupsWithState` distributes: each bucket's state is ONE
    * long (its cumulative token count), each arriving chunk is
    * assigned `before div budget` and advances the state — so the
    * assignment stream equals the batch window's, provided chunks
    * arrive in `(doc_id, chunk_id)` order per bucket (the ingest
    * contract; intra-micro-batch order is restored by a local sort of
    * the group's rows). The streamable unit is the ASSIGNMENT — a
    * sequence is only complete once its bucket's offset passes the
    * next budget boundary, so per-sequence aggregates remain a batch
    * (or windowed downstream) concern. StreamingCurationSpec pins
    * stream-vs-batch parity.
    */
  def packChunksStream(chunks: DataFrame, budget: Int, nBuckets: Int = 64,
      salt: String = "pack:v1:"): Dataset[PackAssignment] = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val s = chunks.sparkSession
    import s.implicits._
    chunks
      .withColumn("bucket",
        pmod(Sampling.keyHash32(col("doc_id"), salt), lit(nBuckets.toLong))
          .cast("int"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("bucket"))
      .as[PackChunkRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[PackBucketState, PackAssignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket, rows, state) =>
          var before = state.getOption.map(_.before).getOrElse(0L)
          val out = rows.toArray.sortBy(r => (r.doc_id, r.chunk_id)).map { r =>
            val seq = before / budget
            before += r.n_tokens
            PackAssignment(bucket, r.doc_id, r.chunk_id, r.n_tokens, seq)
          }
          state.update(PackBucketState(before))
          out.iterator
      }
  }
}
