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
case class IngestDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
case class LangDoc(doc_id: Long, lang: String, text: String)

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

  test("incremental ingestion dedup runs live: stream vs static corpus fps") {
    // the incremental_dedup query's streaming twin: new docs arrive as
    // a stream, the existing corpus contributes ONLY its 16-byte
    // fingerprint set (static side). In-stream dups are dropped by
    // watermark-bounded state (dropDuplicatesWithinWatermark — the
    // 100 TB/day-honest spelling); corpus dups by a stream-static
    // left-anti join. The in-stream winner is first-arrival (the
    // streaming contract) where the batch query uses smallest-id.
    import graft.functions.{Fnv1aCore, GraftFunctions => F}
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val existingFps = Seq(Doc(100L, "existing corpus doc")).toDF()
      .select(F.fnv1a($"text").as("fp1"),
        F.fnv1a_seeded(Fnv1aCore.Lane2Seed, $"text").as("fp2"))
    val input = MemoryStream[IngestDoc]
    input.addData(Seq(
      IngestDoc(1L, "existing corpus doc", t0), // corpus dup -> dropped
      IngestDoc(2L, "fresh doc alpha", t0),     // in-stream pair:
      IngestDoc(3L, "fresh doc alpha", t0),     //   one survives
      IngestDoc(4L, "fresh doc beta", t0)))     // unique -> kept
    val q = input.toDF()
      .withColumn("fp1", F.fnv1a($"text"))
      .withColumn("fp2", F.fnv1a_seeded(Fnv1aCore.Lane2Seed, $"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp1", "fp2")
      .join(existingFps, Seq("fp1", "fp2"), "left_anti")
      .select($"doc_id")
      .writeStream.format("memory").queryName("s_ingest")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s_ingest").as[Long].collect().toSet
    assert(!got.contains(1L), s"corpus dup must be dropped: $got")
    assert(got.contains(4L), s"unique doc must survive: $got")
    assert((got & Set(2L, 3L)).size == 1,
      s"exactly one of the in-stream pair survives: $got")
    assert(got.size == 2)
  }

  test("mixture resampling over a stream equals the batch operator") {
    // resampleMixture is a keyed-hash projection + Generate — no
    // state, no watermark — so the ingest-time shape (reweight the
    // mixture as crawl output arrives) is the SAME operator. Rates
    // cover every branch: drop (0), downsample (0.5), integer
    // upsample (2.0), fractional (1.3), default (unmapped lang).
    implicit val sqlCtx = spark.sqlContext
    val rates = Map("en" -> 0.5, "es" -> 2.0, "de" -> 1.3, "fr" -> 0.0)
    val mixDocs = (0L until 40L).map { i =>
      LangDoc(i, Seq("en", "es", "de", "fr", "zh")(i.toInt % 5), s"doc $i body")
    }
    val input = MemoryStream[LangDoc]
    input.addData(mixDocs)
    val q = graft.operators.Sampling.resampleMixture(
        input.toDF(), $"lang", $"doc_id", rates)
      .select($"doc_id", $"lang", $"copy_no")
      .writeStream.format("memory").queryName("s_mix")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("s_mix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.Sampling.resampleMixture(
        mixDocs.toDF(), $"lang", $"doc_id", rates)
      .select($"doc_id", $"lang", $"copy_no")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(!streamed.exists(_._2 == "fr"), "rate-0 stratum must drop")
    assert(streamed.exists(_._3 == 1L), "an upsampled copy must appear")
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

  test("offset packing over a stream equals the batch window packer") {
    // packChunksStream carries ONE long of state per bucket; feeding
    // the chunk relation in (doc_id, chunk_id) order across THREE
    // micro-batches must reproduce the batch window assignment
    // exactly — including sequences that straddle micro-batch
    // boundaries mid-fill.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val chunkRows = (0L until 60L).flatMap { d =>
      (0L until (1 + rnd.nextInt(4)).toLong).map(c =>
        (d, c, (3 + rnd.nextInt(9)).toLong))
    }
    val input = MemoryStream[(Long, Long, Long)]
    val q = graft.operators.Packing.packChunksStream(
        input.toDF().toDF("doc_id", "chunk_id", "n_tokens"),
        budget = 16, nBuckets = 4)
      .writeStream.format("memory").queryName("s_pack")
      .outputMode("append").start()
    try {
      chunkRows.grouped(25).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("s_pack")
      .groupBy($"bucket", $"seq_id")
      .agg(count(lit(1)).as("n_chunks"), sum($"n_tokens").as("n_tokens"),
        min(struct($"doc_id", $"chunk_id")).as("f"))
      .select($"bucket", $"seq_id", $"n_chunks", $"n_tokens",
        $"f.doc_id", $"f.chunk_id")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.Packing.packChunks(
        chunkRows.toDF("doc_id", "chunk_id", "n_tokens"),
        budget = 16, nBuckets = 4)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // state really straddled batches: some sequence's chunks arrived
    // in different micro-batches — guaranteed if any bucket has more
    // chunks than fit one sequence
    assert(streamed.exists(_._3 > 1), "no multi-chunk sequences formed")
  }

  test("count-min sketch cells maintain incrementally over a stream") {
    // the G16 sketch is a plain (row, bucket) count relation, so the
    // streaming build is just groupBy(r, b).count in complete mode —
    // no custom state. Two micro-batches prove the merge: the final
    // streamed cells must equal the one-shot batch sketch over the
    // union (CMS mergeability = counter addition).
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 300).map(i => (i % 37).toLong)
    val input = MemoryStream[Long]
    val q = input.toDF()
      .select(graft.queries.Aggregates.cmsCellArr($"value").as("cell"))
      .groupBy($"cell.r".as("r"), $"cell.b".as("b")).count()
      .writeStream.format("memory").queryName("s_cms")
      .outputMode("complete").start()
    try {
      input.addData(keys.take(150))
      q.processAllAvailable()
      input.addData(keys.drop(150))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("s_cms").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = keys.toDF("value")
      .select(graft.queries.Aggregates.cmsCellArr($"value").as("cell"))
      .groupBy($"cell.r".as("r"), $"cell.b".as("b")).count()
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("KMV sketch maintains incrementally over a stream (min-merge)") {
    // the G20 sketch is bounded_min_set over hashes — an ordinary
    // streaming-aggregable typed aggregate, so incremental
    // maintenance is just groupBy(key).agg(...) in complete mode.
    // Two micro-batches prove mergeability: the streamed sketch must
    // equal the one-shot batch sketch over the union (min-merge).
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val rows = (1 to 200).map(i => ((i % 3).toLong, i.toLong * 7919L))
    val input = MemoryStream[(Long, Long)]
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .select($"_1".as("g"),
        graft.functions.GraftFunctions.fnv1a($"_2")
          .bitwiseXOR(lit(Long.MinValue)).as("h"))
      .groupBy($"g")
      .agg(graft.functions.GraftFunctions.bounded_min_set($"h", k).as("sk"))
      .select($"g", $"sk.cnt".as("cnt"), $"sk.ids".as("ids"))
    val q = agg(input.toDF())
      .writeStream.format("memory").queryName("s_kmv")
      .outputMode("complete").start()
    try {
      input.addData(rows.take(100))
      q.processAllAvailable()
      input.addData(rows.drop(100))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("s_kmv").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    val batch = agg(rows.toDF()).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.values.forall(_._2.length == k))
  }

  test("Gram matrix maintains incrementally over a stream (partial merge)") {
    // two micro-batches prove GramMatrixAgg's mergeability: the
    // streamed X^T X must equal the one-shot batch over the union —
    // the property that lets covariance track a live embedding feed
    implicit val sqlCtx = spark.sqlContext
    val vecs = (1 to 60).map(i =>
      (i % 2, Seq(i.toFloat / 7f, (i * 3 % 11).toFloat, -i.toFloat / 13f)))
    val input = MemoryStream[(Int, Seq[Float])]
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy($"_1".as("g"))
      .agg(graft.functions.GraftFunctions.gram_matrix($"_2", 3).as("gm"))
      .select($"g", $"gm.cnt".as("cnt"), $"gm.cells".as("cells"))
    val q = agg(input.toDF())
      .writeStream.format("memory").queryName("s_gram")
      .outputMode("complete").start()
    try {
      input.addData(vecs.take(25))
      q.processAllAvailable()
      input.addData(vecs.drop(25))
      q.processAllAvailable()
    } finally q.stop()
    def slurp(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    val streamed = slurp(spark.table("s_gram").collect())
    val batch = slurp(agg(vecs.toDF()).collect())
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.values.forall(_._2.length == 6))
  }

  test("live incremental near-dup: the BandStreams consumer tailing " +
      "the band layout's appends equals the incremental_neardup batch " +
      "row across micro-batch splits") {
    import graft.operators.BandIndex
    import graft.queries.{Pipeline, QueryUtil}
    import graft.streaming.BandStreams
    val NB = 16
    val Tau = 0.5 // == PipelineCore.MinHashJaccardTau, the L40 geometry
    val p = "/tmp/graft_bands_live/layout"
    val pairsP = "/tmp/graft_bands_live/pairs"
    val ckpt = "/tmp/graft_bands_live/ckpt"
    Seq(p, pairsP, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    // the incremental_neardup fixture, verbatim: corpus vs a batch of
    // fresh docs plus appended-token near-twins of corpus docs
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val corpus = base.filter($"doc_id" % 10 =!= 0)
    val batch = base.filter($"doc_id" % 10 === 0)
      .unionAll(corpus.filter($"doc_id" % 23 === 3)
        .select(($"doc_id" + 10000000L).as("doc_id"),
          concat($"text", lit(" incrementalprobe")).as("text")))
    val texts = corpus.unionByName(batch)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(corpus, Tau, NB), p, Tau, NB)
    // split the batch across two triggers — the cadence-invariance pin
    val b1 = batch.filter($"doc_id" % 2 === 0)
    val b2 = batch.filter($"doc_id" % 2 === 1)
    def verify(cand: org.apache.spark.sql.DataFrame) =
      cand.join(texts.select($"doc_id".as("batch_doc"),
          $"text".as("text_a")), "batch_doc")
        .join(texts.select($"doc_id".as("corpus_doc"),
          $"text".as("text_b")), "corpus_doc")
        .select($"batch_doc", $"corpus_doc",
          QueryUtil.q6(size(array_intersect(
            Pipeline.shingles($"text_a"), Pipeline.shingles($"text_b")))
            .cast("double") /
            size(array_union(
              Pipeline.shingles($"text_a"), Pipeline.shingles($"text_b"))))
            .as("jaccard"))
        .filter($"jaccard" >= Tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    // compositional expectation, probed BEFORE each append lands
    val exp1 = verify(BandIndex.probeCandidates(b1, p, Tau, NB))
    val q = BandStreams.liveNearDup(spark, p, texts, pairsP, ckpt)
    try {
      q.processAllAvailable()
      // first trigger = the base layout: corpus side empty, no pairs
      assert(BandStreams.readPairs(spark, pairsP).count() == 0L)
      assert(BandIndex.appendBandsIdempotent(b1, p, Tau, NB, 1L))
      q.processAllAvailable()
      val exp2 = verify(BandIndex.probeCandidates(b2, p, Tau, NB))
      assert(BandIndex.appendBandsIdempotent(b2, p, Tau, NB, 2L))
      q.processAllAvailable()
      val streamed = BandStreams.readPairs(spark, pairsP)
        .select($"batch_doc", $"corpus_doc", $"jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // trigger-by-trigger: streamed == (b1 × corpus) ∪ (b2 × corpus∪b1)
      assert(streamed == (exp1 ++ exp2),
        s"streamed ${streamed.size} vs expected ${(exp1 ++ exp2).size}")
      // and the batch×corpus portion equals the L40 batch row exactly
      val row = SparkEntry.queries("incremental_neardup")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val batchVsCorpus = streamed.filter { case (_, c, _) =>
        c % 10 != 0 && c < 10000000L }
      assert(batchVsCorpus == row && row.nonEmpty,
        s"stream ${batchVsCorpus.size} vs batch row ${row.size}")
      // the per-trigger probe rides the CandidatePairs skew guard (a
      // raw band self-join regression loses the chunk role columns)
      val probePlan = BandStreams.probeArrivals(
        spark.read.format("graft.sources.BandsSource")
          .option("path", p).load(),
        p, texts, Tau, 1024)
        .queryExecution.executedPlan.toString
      assert(probePlan.contains("__cl") && probePlan.contains("__cr"),
        s"probeArrivals must route through CandidatePairs:\n" +
          probePlan.take(1200))
    } finally q.stop()
  }

  test("live semantic near-dup: the CellStreams consumer tailing the " +
      "IVF cell layout's appends equals the per-increment batch probe " +
      "across micro-batch splits, and a retried batch publishes once") {
    import graft.operators.{IvfIndex, SemDedup}
    import graft.streaming.CellStreams
    val K = 8
    val Tau = 0.40 // == the semdedup row's duplication threshold
    val p = "/tmp/graft_cells_live/layout"
    val pairsP = "/tmp/graft_cells_live/pairs"
    val ckpt = "/tmp/graft_cells_live/ckpt"
    Seq(p, pairsP, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    // the batch: fresh vectors plus EXACT COPIES of corpus vectors
    // under new ids — cosine-1 "paraphrases" the semantic lane must
    // catch (identical embedding ⇒ identical cell, so the within-cell
    // verify is guaranteed to see them)
    val batch = emb.filter($"vec_id" % 10 === 0)
      .unionAll(corpus.filter($"vec_id" % 17 === 3)
        .select(($"vec_id" + 10000000L).as("vec_id"), $"v"))
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents), p,
      K, cents.head.length)
    // split the batch across two triggers — the cadence-invariance pin
    val b1 = IvfIndex.assignCells(batch.filter($"vec_id" % 2 === 0), cents)
    val b2 = IvfIndex.assignCells(batch.filter($"vec_id" % 2 === 1), cents)
    // expected per increment: exact q6 cosine over co-celled cross
    // pairs vs the PRE-append state (the brute spelling, cells from
    // the same centroids the layout stores)
    def cross(b: org.apache.spark.sql.DataFrame,
        pre: org.apache.spark.sql.DataFrame) =
      b.select($"cell", $"vec_id".as("batch_vec"), $"v".as("va"))
        .join(IvfIndex.assignCells(pre, cents)
          .select($"cell", $"vec_id".as("corpus_vec"), $"v".as("vb")),
          Seq("cell"))
        .withColumn("cos", SemDedup.cos($"va", $"vb"))
        .filter($"cos" >= Tau)
        .select($"batch_vec", $"corpus_vec", $"cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val exp1 = cross(b1, corpus)
    val exp2 = cross(b2,
      corpus.unionByName(batch.filter($"vec_id" % 2 === 0)))
    val q = CellStreams.liveSemDedup(spark, p, Tau, pairsP, ckpt)
    try {
      q.processAllAvailable()
      // first trigger = the base layout: corpus side empty, no pairs
      assert(CellStreams.readPairs(spark, pairsP).count() == 0L)
      assert(IvfIndex.appendCellsIdempotent(b1, p, 1L))
      q.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b2, p, 2L))
      // a re-sent batch id is a no-op: the stream must not re-probe it
      assert(!IvfIndex.appendCellsIdempotent(b1, p, 1L))
      q.processAllAvailable()
      val streamed = CellStreams.readPairs(spark, pairsP)
        .select($"batch_vec", $"corpus_vec", $"cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(streamed == (exp1 ++ exp2) && streamed.nonEmpty,
        s"streamed ${streamed.size} vs expected ${(exp1 ++ exp2).size}")
      // every planted copy was caught against its own original
      // (identical v ⇒ same cell ⇒ cos 1.0 ≥ τ, no approximation gap)
      val planted = streamed.collect {
        case (b, c, _) if b >= 10000000L => (b - 10000000L, c) }
      val originals = corpus.filter($"vec_id" % 17 === 3)
        .select($"vec_id").as[Long].collect().toSet
      assert(originals.nonEmpty &&
        originals.forall(o => planted.contains((o, o))),
        s"planted copies must pair with their originals: " +
          s"${originals.size} planted, ${planted.size} caught")
      // the per-trigger probe rides the CandidatePairs skew guard (a
      // raw within-cell self-join regression loses the chunk columns —
      // a hot cell would then hand one task its O(m²))
      val probePlan = CellStreams.probeArrivals(
        spark.read.format("graft.sources.CellsSource")
          .option("path", p).load(),
        p, Tau, 1024)
        .queryExecution.executedPlan.toString
      assert(probePlan.contains("__cl") && probePlan.contains("__cr"),
        s"probeArrivals must route through CandidatePairs:\n" +
          probePlan.take(1200))
    } finally q.stop()
  }

  test("the trigger corpus is bounded to the START offset's commit " +
      "units: a batch committed between offset capture and trigger " +
      "execution stays OFF the corpus side (the reversed-orientation " +
      "double-publish race), and the unbounded read proves the race " +
      "was real") {
    import graft.operators.{IvfIndex, SemDedup}
    import graft.streaming.CellStreams
    val K = 8
    val Tau = 0.40
    val p = "/tmp/graft_cells_race/layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents), p,
      K, cents.head.length)
    val base1 = emb.filter($"vec_id" % 10 === 0 && $"vec_id" % 2 === 0)
    val b1 = IvfIndex.assignCells(base1, cents)
    // b2 contains an EXACT COPY of every b1 vector (cos 1.0, same
    // cell) — the pairs the race would publish twice
    val b2 = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 0 && $"vec_id" % 2 === 1)
        .unionAll(base1.select(($"vec_id" + 20000000L).as("vec_id"),
          $"v")), cents)
    assert(IvfIndex.appendCellsIdempotent(b1, p, 1L))
    // ... and b2 commits BETWEEN b1's offset capture and its trigger
    // execution (the race): at execution time the layout holds b2,
    // but b1's start offset was {base}
    assert(IvfIndex.appendCellsIdempotent(b2, p, 2L))
    def pairs(roots: Option[Set[String]]) = CellStreams.probeArrivals(
      spark.read.format("graft.sources.CellsSource")
        .option("path", p).option("roots", "_batch-1").load(),
      p, Tau, 1024, roots)
      .select($"batch_vec", $"corpus_vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bounded = pairs(Some(Set(".")))
    val unbounded = pairs(None)
    // the bound reproduces exactly the pre-append probe
    val expected = b1
      .select($"cell", $"vec_id".as("batch_vec"), $"v".as("va"))
      .join(IvfIndex.assignCells(corpus, cents)
        .select($"cell", $"vec_id".as("corpus_vec"), $"v".as("vb")),
        Seq("cell"))
      .withColumn("cos", SemDedup.cos($"va", $"vb"))
      .filter($"cos" >= Tau)
      .select($"batch_vec", $"corpus_vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == expected)
    // the unbounded read sees b2's planted copies on the corpus side:
    // strictly more pairs — each of which would be re-published in
    // reversed orientation when b2's own trigger fires
    val raced = unbounded -- bounded
    assert(raced.nonEmpty && raced.exists(_._2 >= 20000000L),
      s"the unbounded read must show the race: ${raced.size} extra")
  }

  test("StreamOffsets.startRoots threads the trigger's start offset " +
      "out of the foreachBatch frame: first trigger = {}, then " +
      "cumulative commit units in append order") {
    import graft.operators.IvfIndex
    import graft.streaming.StreamOffsets
    val K = 8
    val p = "/tmp/graft_cells_offsets/layout"
    val ckpt = "/tmp/graft_cells_offsets/ckpt"
    Seq(p, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents), p,
      K, cents.head.length)
    val b1 = IvfIndex.assignCells(emb.filter($"vec_id" % 10 === 0),
      cents)
    val seen = scala.collection.concurrent.TrieMap
      .empty[Long, Set[String]]
    val q = spark.readStream.format("graft.sources.CellsSource")
      .option("path", p).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame,
          id: java.lang.Long) =>
        seen.put(id.longValue,
          StreamOffsets.startRoots(df.sparkSession, ckpt,
            id.longValue))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b1, p, 1L))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen(0L) == Set.empty[String], seen.toString)
    assert(seen(1L) == Set("."), seen.toString)
    // a missing offsets entry is refused, not silently unbounded
    // (that would reintroduce the race)
    intercept[IllegalArgumentException](
      StreamOffsets.startRoots(spark, ckpt, 99L))
  }

  test("startRoots refuses offset files that do not match the layout " +
      "shape — an unknown depth must not silently widen the corpus " +
      "bound to the base root") {
    import graft.streaming.StreamOffsets
    val ckpt = "/tmp/graft_offsets_shape/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(ckpt))
    val dir = new java.io.File(ckpt, "offsets")
    assert(dir.mkdirs())
    def writeEntry(files: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, "0"))
      try {
        w.println("v1"); w.println("{}")
        w.println(files.map(f => "\"" + f + "\"")
          .mkString("[", ",", "]"))
      } finally w.close()
    }
    // a file directly under the root (no <key>=<v> partition parent)
    writeEntry(Seq("/tmp/layout/stray.parquet"))
    intercept[IllegalArgumentException](
      StreamOffsets.startRoots(spark, ckpt, 1L))
    // a file under a hidden non-commit-unit directory
    writeEntry(Seq("/tmp/layout/_staging-3-ab/bucket=1/p.parquet"))
    intercept[IllegalArgumentException](
      StreamOffsets.startRoots(spark, ckpt, 1L))
    // the two legal shapes still resolve
    writeEntry(Seq("/tmp/layout/bucket=1/p.parquet",
      "/tmp/layout/_batch-7/bucket=2/q.parquet",
      "/tmp/layout/_base-2/bucket=3/r.parquet"))
    assert(StreamOffsets.startRoots(spark, ckpt, 1L) ==
      Set(".", "_batch-7", "_base-2"))
  }

  test("liveSemDedup consumer restart: an append landing while the " +
      "consumer is DOWN is probed exactly once from the checkpoint, " +
      "and the pre-restart pairs are not re-published") {
    import graft.operators.IvfIndex
    import graft.streaming.CellStreams
    val K = 8
    val Tau = 0.40
    val p = "/tmp/graft_cells_restart/layout"
    val pairsP = "/tmp/graft_cells_restart/pairs"
    val ckpt = "/tmp/graft_cells_restart/ckpt"
    Seq(p, pairsP, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
      .unionAll(corpus.filter($"vec_id" % 17 === 3)
        .select(($"vec_id" + 10000000L).as("vec_id"), $"v"))
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents), p,
      K, cents.head.length)
    val b1 = IvfIndex.assignCells(batch.filter($"vec_id" % 2 === 0), cents)
    val b2 = IvfIndex.assignCells(batch.filter($"vec_id" % 2 === 1), cents)
    def start() = CellStreams.liveSemDedup(spark, p, Tau, pairsP, ckpt)
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b1, p, 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterB1 = CellStreams.readPairs(spark, pairsP)
      .select($"batch_vec", $"corpus_vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // append while the consumer is DOWN, then restart from checkpoint
    assert(IvfIndex.appendCellsIdempotent(b2, p, 2L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val after = CellStreams.readPairs(spark, pairsP)
      .select($"batch_vec", $"corpus_vec", $"cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // no pair published twice (the TxBatch sink is batch-id-keyed; a
    // restart replaying the b1 trigger would double these rows)
    assert(after.length == after.toSet.size,
      s"duplicate pairs after restart: ${after.length} rows, " +
        s"${after.toSet.size} distinct")
    // the pre-restart pairs survived, and b2's probe (vs corpus ∪ b1)
    // landed exactly once
    val pairSet = after.map(t => (t._1, t._2)).toSet
    assert(afterB1.subsetOf(pairSet) && afterB1.nonEmpty)
    def cross(b: org.apache.spark.sql.DataFrame,
        pre: org.apache.spark.sql.DataFrame) =
      b.select($"cell", $"vec_id".as("batch_vec"), $"v".as("va"))
        .join(IvfIndex.assignCells(pre, cents)
          .select($"cell", $"vec_id".as("corpus_vec"), $"v".as("vb")),
          Seq("cell"))
        .withColumn("cos", graft.operators.SemDedup.cos($"va", $"vb"))
        .filter($"cos" >= Tau)
        .select($"batch_vec", $"corpus_vec")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expB2 = cross(b2,
      corpus.unionByName(batch.filter($"vec_id" % 2 === 0)))
    assert(pairSet == (afterB1 ++ expB2),
      s"restart must deliver exactly b2's probe: ${pairSet.size} vs " +
        s"${(afterB1 ++ expB2).size}")
  }

  test("compaction and a live tailing consumer COEXIST: a fold in the " +
      "caught-up maintenance window translates offsets through the " +
      "fold history - no pair re-published, none lost, including a " +
      "restart whose checkpoint still names pre-compaction units") {
    import graft.operators.IvfIndex
    import graft.streaming.CellStreams
    val K = 8
    val Tau = 0.40
    val base = "/tmp/graft_coexist"
    Seq("layout", "layout_twin", "pairs", "pairs_twin", "ckpt",
      "ckpt_twin").foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$base/$d")))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
      .unionAll(corpus.filter($"vec_id" % 17 === 3)
        .select(($"vec_id" + 10000000L).as("vec_id"), $"v"))
    val b1 = IvfIndex.assignCells(batch.filter($"vec_id" % 2 === 0), cents)
    val b2 = IvfIndex.assignCells(batch.filter($"vec_id" % 2 === 1), cents)
    for (lay <- Seq("layout", "layout_twin"))
      IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents),
        s"$base/$lay", K, cents.head.length)
    // twin lane: the SAME appends, never compacted - ground truth
    val qt = CellStreams.liveSemDedup(spark, s"$base/layout_twin", Tau,
      s"$base/pairs_twin", s"$base/ckpt_twin")
    try {
      qt.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b1, s"$base/layout_twin", 1L))
      qt.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b2, s"$base/layout_twin", 2L))
      qt.processAllAvailable()
    } finally qt.stop()
    // main lane: trigger, COMPACT while the consumer runs (between
    // triggers, caught up), trigger again - then a second compact and
    // a RESTART whose committed offset still names the dead units
    val q1 = CellStreams.liveSemDedup(spark, s"$base/layout", Tau,
      s"$base/pairs", s"$base/ckpt")
    try {
      q1.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b1, s"$base/layout", 1L))
      q1.processAllAvailable()
      // the maintenance window: every committed batch delivered
      assert(IvfIndex.compact(spark, s"$base/layout"))
      assert(IvfIndex.appendCellsIdempotent(b2, s"$base/layout", 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    // fold AGAIN while the consumer is down: the checkpoint's last
    // committed offset now names _base-1 + _batch-2, both about to die
    assert(IvfIndex.compact(spark, s"$base/layout"))
    val q2 = CellStreams.liveSemDedup(spark, s"$base/layout", Tau,
      s"$base/pairs", s"$base/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    def pairsOf(path: String) = CellStreams.readPairs(spark, path)
      .select($"batch_vec", $"corpus_vec", $"cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = pairsOf(s"$base/pairs")
    val want = pairsOf(s"$base/pairs_twin")
    assert(got.length == got.toSet.size,
      s"re-published pairs after compaction: ${got.length} rows, " +
        s"${got.toSet.size} distinct")
    assert(got.toSet == want.toSet && want.nonEmpty,
      s"pairs lost or invented across the folds: got ${got.length}, " +
        s"want ${want.length}")
  }

  test("a fold that OUTRAN the consumer refuses loudly: a batch " +
      "folded before its trigger was processed is inseparable from " +
      "the new base, so the next trigger fails with the documented " +
      "recovery instead of silently losing or duplicating rows") {
    import graft.operators.IvfIndex
    import graft.streaming.CellStreams
    val K = 8
    val base = "/tmp/graft_coexist_refuse"
    Seq("layout", "pairs", "ckpt").foreach(d =>
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(s"$base/$d")))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents),
      s"$base/layout", K, cents.head.length)
    val q1 = CellStreams.liveSemDedup(spark, s"$base/layout", 0.40,
      s"$base/pairs", s"$base/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    // the consumer is DOWN: append b1, then fold it - the consumer
    // never processed batch 1, so translation must refuse
    val b1 = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 0), cents)
    assert(IvfIndex.appendCellsIdempotent(b1, s"$base/layout", 1L))
    assert(IvfIndex.compact(spark, s"$base/layout"))
    val q2 = CellStreams.liveSemDedup(spark, s"$base/layout", 0.40,
      s"$base/pairs", s"$base/ckpt")
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      try q2.processAllAvailable()
      finally q2.stop()
      throw new IllegalStateException("expected the refusal")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.toString +: chain(t.getCause)
    assert(chain(e).exists(m => m.contains("never processed") ||
      m.contains("cannot translate")), chain(e).mkString("\n"))
  }

  test("a content REWRITE (relearn) always refuses offset " +
      "translation: re-assigned rows are not a subset of what the " +
      "consumer delivered, even when it was fully caught up") {
    import graft.operators.IvfIndex
    import graft.streaming.CellStreams
    val K = 8
    val base = "/tmp/graft_coexist_relearn"
    Seq("layout", "pairs", "ckpt").foreach(d =>
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(s"$base/$d")))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents),
      s"$base/layout", K, cents.head.length)
    val b1 = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 0), cents)
    val q1 = CellStreams.liveSemDedup(spark, s"$base/layout", 0.40,
      s"$base/pairs", s"$base/ckpt")
    try {
      q1.processAllAvailable()
      assert(IvfIndex.appendCellsIdempotent(b1, s"$base/layout", 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    // fully caught up - but relearn REWRITES content
    IvfIndex.relearn(spark, s"$base/layout", iters = 1)
    val q2 = CellStreams.liveSemDedup(spark, s"$base/layout", 0.40,
      s"$base/pairs", s"$base/ckpt")
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      try q2.processAllAvailable()
      finally q2.stop()
      throw new IllegalStateException("expected the refusal")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.toString +: chain(t.getCause)
    assert(chain(e).exists(_.contains("REWRITE")),
      chain(e).mkString("\n"))
  }

  test("coexistence holds on the BANDS lane too (its own stream and " +
      "scan classes): liveNearDup keeps exact pairs across a fold in " +
      "the caught-up window") {
    import graft.operators.{BandIndex, InvertedIndex}
    import graft.streaming.BandStreams
    val NB = 8
    val base = "/tmp/graft_coexist_bands"
    Seq("layout", "layout_twin", "pairs", "pairs_twin", "ckpt",
      "ckpt_twin").foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$base/$d")))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val texts = docs
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batchDocs = docs.filter($"doc_id" % 10 === 0)
      .unionAll(corpus.filter($"doc_id" % 17 === 3)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
    val b1 = batchDocs.filter($"doc_id" % 2 === 0)
    val b2 = batchDocs.filter($"doc_id" % 2 === 1)
    for (lay <- Seq("layout", "layout_twin"))
      BandIndex.writeBandLayout(
        BandIndex.buildBands(corpus, 0.5, NB), s"$base/$lay", 0.5, NB)
    def run(lay: String, pairs: String, ckpt: String,
        compactBetween: Boolean): Unit = {
      val q = BandStreams.liveNearDup(spark, s"$base/$lay", texts,
        s"$base/$pairs", s"$base/$ckpt")
      try {
        q.processAllAvailable()
        assert(BandIndex.appendBandsIdempotent(b1, s"$base/$lay",
          0.5, NB, 1L))
        q.processAllAvailable()
        if (compactBetween)
          assert(graft.operators.TxBatch.compact(spark, s"$base/$lay"))
        assert(BandIndex.appendBandsIdempotent(b2, s"$base/$lay",
          0.5, NB, 2L))
        q.processAllAvailable()
      } finally q.stop()
    }
    run("layout_twin", "pairs_twin", "ckpt_twin",
      compactBetween = false)
    run("layout", "pairs", "ckpt", compactBetween = true)
    def pairsOf(path: String) = BandStreams.readPairs(spark, path)
      .select($"batch_doc", $"corpus_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = pairsOf(s"$base/pairs")
    val want = pairsOf(s"$base/pairs_twin")
    assert(got.length == got.toSet.size,
      s"re-published pairs after the fold: ${got.length} vs " +
        s"${got.toSet.size}")
    assert(got.toSet == want.toSet && want.nonEmpty,
      s"pairs lost or invented: got ${got.length}, want ${want.length}")
  }

  test("coexistence holds on the POSTINGS lane too: a caught-up " +
      "micro-batch stream re-delivers nothing after a fold, then " +
      "tails only the genuinely new append") {
    import graft.operators.InvertedIndex
    val NB = 8
    val base = "/tmp/graft_coexist_postings"
    Seq("layout", "ckpt").foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$base/$d")))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$base/layout.stats"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val third = docs.filter($"doc_id" % 3 === 0)
    val dl = third.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(third, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")),
      s"$base/layout")
    val delivered = new java.util.concurrent.atomic.AtomicLong(0L)
    def start() = spark.readStream
      .format("graft.sources.PostingsSource")
      .option("path", s"$base/layout")
      .option("nBuckets", NB.toString).load()
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame,
          id: java.lang.Long) =>
        delivered.addAndGet(df.count()); ()
      }.start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(InvertedIndex.appendPostingsIdempotent(
        docs.filter($"doc_id" % 3 === 1), s"$base/layout", NB, 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    val total = InvertedIndex.readLayout(spark, s"$base/layout").count()
    assert(delivered.get() == total, s"${delivered.get()} vs $total")
    // fold while the consumer is down (it was caught up), restart:
    // the stale offset translates — NOTHING re-delivers
    assert(InvertedIndex.compact(spark, s"$base/layout"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(delivered.get() == total,
      s"post-fold restart re-delivered: ${delivered.get()} vs $total")
    // a genuinely new append still tails normally
    val b2 = docs.filter($"doc_id" % 3 === 2)
    assert(InvertedIndex.appendPostingsIdempotent(
      b2, s"$base/layout", NB, 2L))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val total2 = InvertedIndex.readLayout(spark, s"$base/layout").count()
    assert(delivered.get() == total2 && total2 > total,
      s"${delivered.get()} vs $total2")
  }

  test("the post-trigger maintenance hook folds the source layout " +
      "AND the pairs sink mid-stream at the fan-in thresholds, with " +
      "no external cron and no refusal — pairs equal the unhooked " +
      "never-compacted twin (CELLS lane)") {
    import graft.operators.{IvfIndex, TxBatch}
    import graft.streaming.CellStreams
    val K = 8
    val Tau = 0.40
    val base = "/tmp/graft_hook_cells"
    Seq("layout", "layout_twin", "pairs", "pairs_twin", "ckpt",
      "ckpt_twin").foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$base/$d")))
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    def b(i: Int) = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 0 && $"vec_id" % 4 === i % 4)
        .unionAll(corpus.filter($"vec_id" % 23 === (i * 5) % 23)
          .select(($"vec_id" + 10000000L * i).as("vec_id"), $"v")),
      cents)
    for (lay <- Seq("layout", "layout_twin"))
      IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents),
        s"$base/$lay", K, cents.head.length)
    def run(lay: String, pairs: String, ckpt: String,
        hook: Boolean): Unit = {
      val q = CellStreams.liveSemDedup(spark, s"$base/$lay", Tau,
        s"$base/$pairs", s"$base/$ckpt",
        maintainLayoutEvery = if (hook) 2 else 0,
        maintainPairsEvery = if (hook) 3 else 0)
      try {
        q.processAllAvailable()
        (1 to 4).foreach { i =>
          assert(IvfIndex.appendCellsIdempotent(b(i),
            s"$base/$lay", i.toLong))
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    run("layout_twin", "pairs_twin", "ckpt_twin", hook = false)
    run("layout", "pairs", "ckpt", hook = true)
    // the hook alone folded the source layout (threshold 2 over a
    // 4-append run) and the pairs sink (threshold 3 over 5 triggers),
    // and kept the live fan-in bounded below the thresholds' sum
    assert(TxBatch.compactedBaseDir(spark, s"$base/layout").isDefined,
      "the source layout never folded via the hook")
    assert(TxBatch.compactedBaseDir(spark, s"$base/pairs").isDefined,
      "the pairs sink never folded via the hook")
    assert(TxBatch.liveBatchDirs(spark, s"$base/layout").size < 2,
      TxBatch.liveBatchDirs(spark, s"$base/layout").toString)
    assert(TxBatch.compactedBaseDir(spark, s"$base/layout_twin").isEmpty)
    def pairsOf(p: String) = CellStreams.readPairs(spark, s"$base/$p")
      .select($"batch_vec", $"corpus_vec", $"cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = pairsOf("pairs")
    val want = pairsOf("pairs_twin")
    assert(got.length == got.toSet.size,
      s"hook re-published pairs: ${got.length} vs ${got.toSet.size}")
    assert(got.toSet == want.toSet && want.nonEmpty,
      s"hooked lane diverged: got ${got.length}, want ${want.length}")
  }

  test("the maintenance hook holds on the BANDS lane too, and a " +
      "mid-run RESTART from the checkpoint keeps tailing across the " +
      "hook's folds") {
    import graft.operators.{BandIndex, TxBatch}
    import graft.streaming.BandStreams
    val NB = 8
    val base = "/tmp/graft_hook_bands"
    Seq("layout", "layout_twin", "pairs", "pairs_twin", "ckpt",
      "ckpt_twin").foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$base/$d")))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"doc_id" < 300)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    def rekeyed(i: Int) = corpus.filter($"doc_id" % 29 === (i * 7) % 29)
      .select(($"doc_id" + 10000000L * i).as("doc_id"), $"text")
    def b(i: Int) = docs.filter($"doc_id" % 5 === 0 &&
      $"doc_id" % 3 === i % 3)
      .unionAll(rekeyed(i))
    for (lay <- Seq("layout", "layout_twin"))
      BandIndex.writeBandLayout(BandIndex.buildBands(corpus, 0.5, NB),
        s"$base/$lay", 0.5, NB)
    // the exact verify reads text BY ID — cover the re-keyed batch
    // ids; texts must stay UNIQUE per id (b(i)'s original-id half is
    // already in docs — unioning whole batches would double those ids
    // and the verify join would multiply every pair they touch)
    val texts = (1 to 3).map(rekeyed).foldLeft(docs)(_ unionAll _)
    def start(lay: String, pairs: String, ckpt: String, hook: Boolean) =
      BandStreams.liveNearDup(spark, s"$base/$lay", texts,
        s"$base/$pairs", s"$base/$ckpt",
        maintainLayoutEvery = if (hook) 2 else 0,
        maintainPairsEvery = if (hook) 2 else 0)
    // twin: no hook, no restart
    val qt = start("layout_twin", "pairs_twin", "ckpt_twin", hook = false)
    try {
      qt.processAllAvailable()
      (1 to 3).foreach { i =>
        assert(BandIndex.appendBandsIdempotent(b(i),
          s"$base/layout_twin", 0.5, NB, i.toLong))
        qt.processAllAvailable()
      }
    } finally qt.stop()
    // hooked lane with a restart between appends 2 and 3: the new
    // consumer's offsets name units the hook already folded —
    // translation through the fold history, then more hooked folds
    val q1 = start("layout", "pairs", "ckpt", hook = true)
    try {
      q1.processAllAvailable()
      (1 to 2).foreach { i =>
        assert(BandIndex.appendBandsIdempotent(b(i),
          s"$base/layout", 0.5, NB, i.toLong))
        q1.processAllAvailable()
      }
    } finally q1.stop()
    assert(BandIndex.appendBandsIdempotent(b(3),
      s"$base/layout", 0.5, NB, 3L))
    val q2 = start("layout", "pairs", "ckpt", hook = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(TxBatch.compactedBaseDir(spark, s"$base/layout").isDefined,
      "the hook never folded the bands layout")
    def pairsOf(p: String) = BandStreams.readPairs(spark, s"$base/$p")
      .select($"batch_doc", $"corpus_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = pairsOf("pairs")
    val want = pairsOf("pairs_twin")
    assert(got.length == got.toSet.size,
      s"hook re-published pairs: ${got.length} vs ${got.toSet.size}")
    assert(got.toSet == want.toSet && want.nonEmpty,
      s"hooked bands lane diverged: got ${got.length}, want ${want.length}")
  }
}
