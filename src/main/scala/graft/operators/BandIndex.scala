package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash LSH band index — the at-rest layout behind
  * continuous-ingestion near-dedup. `incremental_neardup` proves the
  * probe SHAPE (batch bands semi-join the corpus band index, so work
  * scales with the increment); this operator gives that index the
  * same maintenance story [[InvertedIndex]] gives term postings:
  * build once, then every arriving batch [[appendBands]] its keys in
  * place — bucket directories gain files, nothing is rewritten, and
  * the next batch probes yesterday's corpus ∪ every appended batch.
  *
  * Rows are `(doc_id, band_no, band_hash)` — 16 bytes + a band id per
  * row, text stays at rest — partitioned by `bucket =
  * pmod(band_hash, nBuckets)`: band hashes are uniform by
  * construction, so a fixed bucket count keeps directories bounded
  * and near-uniform (the [[InvertedIndex]] directory-count contract —
  * partitioning by raw band key would mint one directory per distinct
  * band value, a metadata DoS at corpus scale). A probe prunes to its
  * batch's bucket set at FILE-LISTING time (literal IN over ≤
  * nBuckets values), then the in-bucket (band_no, band_hash)
  * semi-join is an ordinary pushed-down equi-join.
  *
  * Caller contract (the [[InvertedIndex.appendPostings]] precedent):
  * a batch is appended once — re-appending a doc duplicates its band
  * keys, exactly as in any postings-merge index.
  */
object BandIndex {

  /** Layout bucket of a band hash. */
  def bucketCol(bandHash: org.apache.spark.sql.Column,
      nBuckets: Int): org.apache.spark.sql.Column =
    pmod(bandHash, lit(nBuckets.toLong))

  /** `(doc_id, band_no, band_hash, bucket)` band keys of a
    * (doc_id, text) relation at threshold `tau` — identical banding
    * spelling to the in-query LSH passes
    * ([[graft.queries.Pipeline.minhashBandsOf]]). */
  def buildBands(docs: DataFrame, tau: Double, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val bands = graft.queries.Pipeline.minhashBandsOf(docs, tau)
    bands.withColumn("bucket", bucketCol(col("band_hash"), nBuckets))
  }

  /** Materialize a band index partitioned by bucket. */
  def writeBandLayout(bands: DataFrame, path: String): Unit = {
    require(bands.columns.contains("bucket"),
      "writeBandLayout needs a `bucket` column (see buildBands)")
    bands.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
  }

  /** Append a NEW batch's band keys into an existing layout — the
    * index-maintenance path: bucket directories gain files, nothing
    * is rewritten. Stream usage mirrors appendPostings:
    * `writeStream.foreachBatch((b, _) => appendBands(b, path, τ, n))`.
    */
  def appendBands(docs: DataFrame, path: String, tau: Double,
      nBuckets: Int): Unit =
    buildBands(docs, tau, nBuckets)
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(path)

  /** Candidate (batch_doc, corpus_doc) pairs of a new batch against
    * the persisted index — the `incremental_neardup` probe over the
    * at-rest layout. Only the batch's own buckets are LISTED (literal
    * IN prune over ≤ nBuckets values, collected from the batch's
    * bands — a bounded driver value), only co-bucketed index rows
    * enter pair generation (semi-join on the band key), and pair
    * generation rides the skew-proof [[CandidatePairs]] path (batch
    * ids sign-flipped so cross pairs are exactly the a<0≤b rows).
    * Candidates are one-sided — the caller's exact verify (string
    * Jaccard over the candidate texts) decides membership. */
  def probeCandidates(batch: DataFrame, path: String, tau: Double,
      nBuckets: Int, bucketCap: Int = 1024): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    // one banding pass feeds the bucket list AND the join side
    val batchBands = buildBands(batch, tau, nBuckets)
      .select((-col("doc_id") - lit(1L)).as("doc_id"),
        col("band_no"), col("band_hash"), col("bucket"))
      .localCheckpoint()
    val buckets = batchBands.select(col("bucket").cast("long"))
      .distinct().as[Long].collect().toSeq
    val idx = s.read.parquet(path)
      .filter(col("bucket").cast("long").isin(buckets: _*))
      .join(batchBands.select(col("band_no"), col("band_hash")),
        Seq("band_no", "band_hash"), "left_semi")
    val cand = CandidatePairs.fromBuckets(
      batchBands.select(col("doc_id"), col("band_no"), col("band_hash"))
        .unionByName(
          idx.select(col("doc_id"), col("band_no"), col("band_hash"))),
      Seq("band_no", "band_hash"), "doc_id", "doc_a", "doc_b", bucketCap)
    cand.filter(col("doc_a") < 0 && col("doc_b") >= 0)
      .select((-col("doc_a") - lit(1L)).as("batch_doc"),
        col("doc_b").as("corpus_doc"))
  }
}
