package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the step that turns a curated corpus into
  * model-ready training rows: each document becomes overlapping
  * windows of at most `maxTokens` whitespace tokens, consecutive
  * windows sharing `overlap` tokens so no span of context is lost at
  * a chunk boundary.
  *
  * Window math (integer-exact, both engines): `stride = maxTokens −
  * overlap`; chunk `i` covers tokens `[i·stride, i·stride +
  * maxTokens)`; the chunk count is `max(⌈(n − overlap) / stride⌉, 1)`
  * — the smallest number of windows whose union covers all `n`
  * tokens, computed as `(n − overlap + stride − 1) div stride` so no
  * doubles are involved. Every document yields at least one chunk
  * (short docs pass through whole), and every token appears in at
  * least one chunk (coverage is spec-pinned).
  *
  * Scale shape: explode + per-row array slicing — a narrow Generate
  * with NO shuffle at all; output rows inherit the input partitioning
  * and the amplification factor is bounded by `n / stride + 1` per
  * doc. The `documents`-sized relation never moves.
  *
  * Null policy: a NULL text chunks as the empty string (one chunk,
  * one empty token — same as an empty doc). Without the coalesce,
  * Spark's null-SKIPPING `greatest`/`least` would emit a phantom
  * chunk claiming `maxTokens` tokens of null text, silently
  * corrupting any token accounting downstream.
  */
object Chunking {

  /** @param docs      (doc_id, text) relation
    * @param maxTokens window size in whitespace tokens
    * @param overlap   tokens shared by consecutive windows
    * @param minTokens drop docs with fewer whitespace tokens BEFORE
    *                  chunking — the curation length gate. Expressed
    *                  as a separator COUNT (`length − length(sans
    *                  spaces) + 1`), not a second `split`: token
    *                  count equals spaces+1 identically, the scalar
    *                  predicate pushes to the scan, and the corpus is
    *                  tokenized exactly once in the projection above
    *                  it (a `size(split(...))` gate looks cheaper but
    *                  predicate pushdown inlines it below the toks
    *                  projection and every surviving row splits
    *                  twice — spec-pinned) */
  def chunkDocs(docs: DataFrame, maxTokens: Int, overlap: Int,
      minTokens: Int = 1): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val text = coalesce(col("text"), lit(""))
    val gated = if (minTokens <= 1) docs else docs.filter(
      length(text) - length(translate(text, " ", "")) + 1 >= minTokens)
    gated
      .select(col("doc_id"), split(text, " ").as("toks"))
      .withColumn("__n", size(col("toks")))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          greatest(
            expr(s"(__n - $overlap + $stride - 1) DIV $stride"),
            lit(1L)) - 1L)))
      .select(col("doc_id"), col("chunk_id"),
        array_join(
          slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
            lit(maxTokens)),
          " ").as("chunk_text"),
        least(col("chunk_id") * stride + maxTokens, col("__n").cast("long"))
          .minus(col("chunk_id") * stride).as("n_tokens"))
  }
}
