package graft.operators

import graft.functions.Fnv1aCore
import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index layout for keyword search — the scale path behind
  * `bm25_search`: the brute query scores the whole corpus every time;
  * a term-partitioned postings layout answers a query by READING only
  * the query terms' slice of the index, pruned at file-listing time
  * (the same layout-key contract [[IvfIndex.writeCellLayout]] proves
  * for vectors, applied to terms).
  *
  * Layout key: `bucket = pmod(fnv1a(term), nBuckets)` — NOT the term
  * itself. Partitioning by raw term would create one directory per
  * distinct token (millions of tiny directories and files at corpus
  * scale — a metadata DoS on the file listing); hashing into a fixed
  * bucket count keeps directories bounded and near-uniform while a
  * term lookup still prunes to `|terms| / nBuckets` of the index. The
  * residual in-bucket filter is an ordinary pushed-down predicate on
  * the `term` column (parquet min/max + dictionary pages carry it).
  *
  * Postings carry `(term, bucket, doc_id, tf, dl)` — tf and the doc
  * length dl are precomputed at build time, so a BM25 query needs NO
  * join back to the corpus: score = f(tf, dl, df, corpus stats), and
  * df comes from the pruned postings themselves. Corpus stats (N,
  * total length) are one tiny side relation written next to the index.
  */
object InvertedIndex {

  /** Term bucket of `termCol` — engine side. */
  def bucketCol(termCol: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(F.fnv1a(termCol), lit(nBuckets.toLong))

  /** Term bucket — driver side, bit-identical to [[bucketCol]]. */
  def bucketOf(term: String, nBuckets: Int): Long =
    math.floorMod(
      Fnv1aCore.hashBytes(
        term.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        Fnv1aCore.OffsetBasis),
      nBuckets.toLong)

  /** `(term, bucket, doc_id, tf, dl)` postings of a
    * `(doc_id, text)` corpus: one shuffle, keyed by (doc, term) for
    * the map-side-combinable tf count. */
  def buildPostings(docs: DataFrame, nBuckets: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("dl"),
        explode(split($"text", " ")).as("term"))
      .groupBy($"term", $"doc_id", $"dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketCol($"term", nBuckets))
  }

  /** Materialize postings partitioned by bucket, plus the one-row
    * corpus stats relation (`n_docs`, `sum_dl`) at `<path>.stats`. */
  def writeTermLayout(postings: DataFrame, corpusStats: DataFrame,
      path: String): Unit = {
    require(postings.columns.contains("bucket"),
      "writeTermLayout needs a `bucket` column (see buildPostings)")
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    corpusStats.write.mode("overwrite").parquet(path + ".stats")
  }

  /** Append a NEW batch's postings into an existing term layout — the
    * index-maintenance path of a continuously-fed corpus: bucket
    * directories gain files, nothing is rewritten, and the stats
    * relation gains one row (merged at read time by [[bm25]]).
    * Caller contract: the batch is already deduplicated against the
    * indexed corpus (the `incremental_dedup` stage) — re-appending a
    * doc double-counts it, exactly as in any postings-merge index.
    * Stream usage: `events.writeStream.foreachBatch((b, _) =>
    * appendPostings(b, path, n))`. */
  def appendPostings(docs: DataFrame, path: String, nBuckets: Int): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    buildPostings(docs, nBuckets)
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(path)
    docs.select(size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
      .write.mode(SaveMode.Append).parquet(path + ".stats")
  }

  /** [[appendPostings]] made idempotent by batch id — the retry-safe
    * face the streaming loop needs: Spark re-delivers a micro-batch
    * (same `batchId`) whenever the sink committed but the query's own
    * checkpoint did not (every restart replays the last batch), and a
    * bare append would double-count the re-delivery. A per-batch
    * marker file (`_batch-<id>`, underscore-hidden from every reader)
    * is checked first and committed after the append, so re-delivered
    * batches are no-ops. Returns whether the batch was applied.
    * Stream usage:
    * `writeStream.foreachBatch((b, id) =>
    *   appendPostingsIdempotent(b, path, n, id))`.
    *
    * Envelope (the marker-protocol contract every non-transactional
    * sink shares): a crash INSIDE the append—marker window can leave
    * a half-applied batch that the retry re-appends; closing that
    * window needs an atomic data commit (the [[ArtifactStore]]
    * staged-rename pattern over per-batch layouts). */
  def appendPostingsIdempotent(docs: DataFrame, path: String,
      nBuckets: Int, batchId: Long): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(path, s"_batch-$batchId")
    val fs = marker.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      appendPostings(docs, path, nBuckets)
      fs.create(marker, true).close()
      true
    }
  }

  /** Postings of exactly `terms`, reading ONLY their buckets: the
    * literal bucket IN-filter prunes unprobed directories at listing
    * time; the term IN-filter is pushed to the parquet scan inside
    * the listed buckets. */
  def lookupTerms(spark: SparkSession, path: String, terms: Seq[String],
      nBuckets: Int): DataFrame = {
    val buckets = terms.map(bucketOf(_, nBuckets)).distinct
    spark.read.parquet(path)
      .filter(col("bucket").cast("long").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
  }

  /** [[lookupTerms]] through the DSv2 connector
    * ([[graft.sources.PostingsSource]]): the term IN-predicate is
    * pushed into the scan, which derives the bucket set with the
    * layout's own hash and prunes unprobed directories at
    * file-listing time — index-native pruning visible in the scan
    * node itself, no helper-side path math. Results are identical to
    * [[lookupTerms]] (spec-pinned). */
  def lookupTermsV2(spark: SparkSession, path: String,
      terms: Seq[String], nBuckets: Int): DataFrame =
    spark.read.format("graft.sources.PostingsSource")
      .option("path", path).option("nBuckets", nBuckets.toString)
      .load()
      .filter(col("term").isin(terms: _*))

  /** BM25 top-k per query over the pruned postings — the indexed twin
    * of the brute `bm25_search` query (identical expression shape, so
    * the two agree row-for-row; spec-pinned in InvertedIndexSpec).
    * `queries` is `(query_id, term)`. */
  def bm25(spark: SparkSession, path: String,
      queries: Seq[(Long, String)], nBuckets: Int, k: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // reads ride the DSv2 connector: term→bucket pruning happens in
    // the scan node (see lookupTermsV2)
    val posts = lookupTermsV2(spark, path,
      queries.map(_._2).distinct, nBuckets)
    // stats rows accumulate one per append — merge at read time
    val stats = broadcast(spark.read.parquet(path + ".stats")
      .agg(sum($"n_docs").as("n_docs"), sum($"sum_dl").as("sum_dl")))
    val dfreq = posts.groupBy($"term").agg(count(lit(1)).as("df"))
    val idf = log(($"n_docs".cast("double") - $"df".cast("double") +
      lit(0.5)) / ($"df".cast("double") + lit(0.5)) + lit(1.0))
    val tfn = ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
        ($"dl".cast("double") /
          ($"sum_dl".cast("double") / $"n_docs".cast("double")))))
    val w = Window.partitionBy($"query_id").orderBy($"sq".desc, $"doc_id")
    posts
      .join(broadcast(dfreq), "term")
      .crossJoin(stats)
      .join(broadcast(queries.toDF("query_id", "term")), "term")
      .select($"query_id", $"doc_id",
        floor(idf * tfn * lit(10000.0) + lit(0.5)).as("qs"))
      .groupBy($"query_id", $"doc_id").agg(sum($"qs").as("sq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"doc_id",
        ($"sq".cast("double") / lit(10000.0)).as("score"))
  }
}
