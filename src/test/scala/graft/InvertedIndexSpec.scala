package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The inverted-index layout contract, tested the IvfCellLayoutSpec
  * way: a term lookup over a bucket-partitioned postings layout must
  * LIST only the query terms' bucket directories, and the indexed
  * BM25 must agree row-for-row with the brute `bm25_search` query. */
class InvertedIndexSpec extends SparkSuite {
  import spark.implicits._

  private val root = "/tmp/graft_inverted_index/postings"
  private val NB = 8

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private lazy val layoutWritten: Unit = {
    val dl = docs.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(docs, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")),
      root)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail(s"no file scan in:\n${df.queryExecution.executedPlan}"))

  test("engine and driver bucket functions agree") {
    val sample = docs.select(explode(split($"text", " ")).as("term"))
      .distinct().limit(50)
      .withColumn("b", InvertedIndex.bucketCol($"term", NB))
      .as[(String, Long)].collect()
    sample.foreach { case (t, b) =>
      assert(InvertedIndex.bucketOf(t, NB) == b, s"bucket mismatch for '$t'")
    }
  }

  test("term lookup lists only the query terms' buckets; term filter pushed") {
    layoutWritten
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val terms = Seq("hash", "join", "vector")
      val want = terms.map(InvertedIndex.bucketOf(_, NB)).distinct.sorted
      val pruned = InvertedIndex.lookupTerms(spark, root, terms, NB)
      val scan = scanOf(pruned)
      assert(scan.selectedPartitions.partitionCount == want.length,
        s"expected buckets $want, got ${scan.selectedPartitions.partitionCount}")
      val full = scanOf(spark.read.parquet(root))
      assert(full.selectedPartitions.partitionCount == NB)
      assert(scan.metadata("PushedFilters").contains("In(term"),
        s"term filter not pushed: ${scan.metadata("PushedFilters")}")
      // and the pruned postings are exactly the terms' postings
      val brute = InvertedIndex.buildPostings(docs, NB)
        .filter($"term".isin(terms: _*))
        .select($"term", $"doc_id", $"tf").as[(String, Long, Long)]
        .collect().sorted.toSeq
      val got = pruned.select($"term", $"doc_id", $"tf")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(got == brute)
    }
  }

  test("indexed BM25 equals the brute bm25_search row-for-row") {
    layoutWritten
    val queries = Seq(
      (0L, "hash"), (0L, "join"),
      (1L, "scan"), (1L, "filter"), (1L, "vector"),
      (2L, "customer"), (2L, "merge"), (2L, "slow"))
    val indexed = InvertedIndex.bm25(spark, root, queries, NB, k = 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val brute = SparkEntry.queries("bm25_search")(spark, sf)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(indexed == brute)
  }

  test("streamed appendPostings maintains the index: search == full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root2 = "/tmp/graft_inverted_index/maintained"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root2))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root2 + ".stats"))
    // initial build over half the corpus...
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root2)
    // ...the other half arrives as a stream, appended batch-wise
    val rest = docs.filter($"doc_id" % 2 === 1)
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        InvertedIndex.appendPostings(b, root2, NB)
      }.start()
    try {
      rest.grouped(rest.size / 2 + 1).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()
    val queries = Seq((0L, "hash"), (0L, "join"), (1L, "scan"))
    val maintained = InvertedIndex.bm25(spark, root2, queries, NB, k = 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    layoutWritten
    val rebuilt = InvertedIndex.bm25(spark, root, queries, NB, k = 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(maintained == rebuilt && maintained.nonEmpty)
  }

  test("the bm25_indexed driver row writes its layout and matches brute") {
    val got = SparkEntry.queries("bm25_indexed")(spark, sf)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val brute = SparkEntry.queries("bm25_search")(spark, sf)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("idempotent appends: a re-delivered batchId is a no-op; fresh " +
      "ids append; the foreachBatch retry loop converges") {
    val root = "/tmp/graft_inverted_index/idem"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root + ".stats"))
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def content() = InvertedIndex.readLayout(spark, root)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .orderBy($"term", $"doc_id").collect().toSeq
    assert(InvertedIndex.appendPostingsIdempotent(batch, root, NB, 7L))
    val once = content()
    // the re-delivery: same batchId must change NOTHING
    assert(!InvertedIndex.appendPostingsIdempotent(batch, root, NB, 7L))
    assert(content() == once)
    // a fresh id is a real append (caller contract: new data per id)
    assert(InvertedIndex.appendPostingsIdempotent(
      batch.limit(1), root, NB, 8L))
    assert(content().size > once.size)
    // and the band twin honors the same contract
    val broot = "/tmp/graft_band_index/idem"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(broot))
    graft.operators.BandIndex.writeBandLayout(
      graft.operators.BandIndex.buildBands(half, 0.8, NB), broot, 0.8, NB)
    def bandCount() =
      graft.operators.BandIndex.readLayout(spark, broot).count()
    assert(graft.operators.BandIndex.appendBandsIdempotent(
      batch, broot, 0.8, NB, 3L))
    val n1 = bandCount()
    assert(!graft.operators.BandIndex.appendBandsIdempotent(
      batch, broot, 0.8, NB, 3L))
    assert(bandCount() == n1)
  }

  test("manifest commit: a crash between data write and publish leaves " +
      "NO partial batch visible; the retry applies exactly once") {
    val root = "/tmp/graft_inverted_index/txcrash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root + ".stats"))
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def content() = InvertedIndex.readLayout(spark, root)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .orderBy($"term", $"doc_id").collect().toSeq
    def statRows() = InvertedIndex.readStats(spark, root).count()
    val before = content()
    val statsBefore = statRows()
    // the injected crash: batch data fully staged, then the driver
    // dies BEFORE the atomic publish
    intercept[RuntimeException](InvertedIndex.appendPostingsIdempotent(
      batch, root, NB, 11L, crashBeforePublish = true))
    // the layout is readable and bitwise unchanged — no partial batch
    assert(content() == before,
      "a crashed batch must be invisible to every reader")
    assert(statRows() == statsBefore)
    // plain parquet read sees the base too (staging is hidden)
    assert(spark.read.parquet(root).count() == before.size)
    // the foreachBatch retry (same id) applies the batch exactly once
    assert(InvertedIndex.appendPostingsIdempotent(batch, root, NB, 11L))
    val after = content()
    assert(after.size == before.size +
      InvertedIndex.buildPostings(batch, NB).count())
    assert(statRows() == statsBefore + 1)
    // the crashed attempt's staging was swept; a re-retry is a no-op
    val leftovers = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("_staging-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    assert(!InvertedIndex.appendPostingsIdempotent(batch, root, NB, 11L))
    assert(content() == after)
    // the indexed search surface reads the committed batch (bm25 goes
    // through the connector + merged stats)
    val q = Seq((0L, "hash"))
    assert(InvertedIndex.bm25(spark, root, q, NB, k = 5).count() > 0)
    // band twin: same protocol, same guarantees
    val broot = "/tmp/graft_band_index/txcrash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(broot))
    graft.operators.BandIndex.writeBandLayout(
      graft.operators.BandIndex.buildBands(half, 0.8, NB), broot, 0.8, NB)
    val bandsBefore = graft.operators.BandIndex.readLayout(spark, broot)
      .count()
    intercept[RuntimeException](
      graft.operators.BandIndex.appendBandsIdempotent(
        batch, broot, 0.8, NB, 5L, crashBeforePublish = true))
    assert(graft.operators.BandIndex.readLayout(spark, broot).count() ==
      bandsBefore)
    assert(graft.operators.BandIndex.appendBandsIdempotent(
      batch, broot, 0.8, NB, 5L))
    val bandsAfter = graft.operators.BandIndex.readLayout(spark, broot)
      .count()
    assert(bandsAfter > bandsBefore)
    assert(!graft.operators.BandIndex.appendBandsIdempotent(
      batch, broot, 0.8, NB, 5L))
    assert(graft.operators.BandIndex.readLayout(spark, broot).count() ==
      bandsAfter)
    // and the probe (DSv2 scan) sees the committed batch's bands:
    // probing the batch against the layout finds its own docs
    val cand = graft.operators.BandIndex.probeCandidates(
      batch.limit(20), broot, 0.8, NB)
    assert(cand.count() > 0,
      "the probe must see bands committed via the manifest protocol")
  }

  test("readStats resolves gen-0 vs compacted Path-safely: a trailing " +
      "slash or file: scheme never mis-routes to the compacted branch") {
    layoutWritten
    val want = InvertedIndex.readStats(spark, root).count()
    assert(want > 0)
    // raw string comparison of baseDir against these spellings would
    // wrongly take the compacted branch and throw on missing _stats
    assert(InvertedIndex.readStats(spark, root + "/").count() == want)
    assert(InvertedIndex.readStats(spark, "file:" + root).count() == want)
  }
}
