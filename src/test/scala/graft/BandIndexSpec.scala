package graft

import graft.operators.BandIndex
import org.apache.spark.sql.functions._

/** The persisted LSH band index must be maintainable by appends: a
  * half-build plus streamed batch appends must equal a from-scratch
  * full rebuild, both as raw index CONTENT and through the candidate
  * probe (the InvertedIndexSpec appendPostings contract applied to
  * band keys). */
class BandIndexSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 8
  private val Tau = 0.5

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def indexRows(path: String): Seq[(Long, Int, Long, Long)] =
    spark.read.parquet(path)
      .select($"doc_id", $"band_no".cast("int"), $"band_hash",
        $"bucket".cast("long"))
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq

  test("streamed appendBands maintains the index: content and probe " +
      "equal a full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val full = "/tmp/graft_band_index/full"
    val maintained = "/tmp/graft_band_index/maintained"
    Seq(full, maintained).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))

    // reference: one-shot build over the whole corpus
    BandIndex.writeBandLayout(BandIndex.buildBands(docs, Tau, NB), full,
      Tau, NB)

    // maintained: half built, the other half arrives as a stream
    val half = docs.filter($"doc_id" % 2 === 0)
    BandIndex.writeBandLayout(BandIndex.buildBands(half, Tau, NB),
      maintained, Tau, NB)
    val rest = docs.filter($"doc_id" % 2 === 1)
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          BandIndex.appendBands(b, maintained, Tau, NB)
      }.start()
    try {
      rest.grouped(rest.size / 2 + 1).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()

    // raw content parity: every (doc, band, hash, bucket) row equal
    val got = indexRows(maintained)
    assert(got == indexRows(full) && got.nonEmpty)

    // probe parity through both layouts, with planted near-dup twins
    // so the candidate set is non-trivially non-empty
    val batch = docs.filter($"doc_id" % 7 === 3)
      .select(($"doc_id" + 5000000L).as("doc_id"),
        concat($"text", lit(" bandprobe")).as("text"))
    val viaMaintained = BandIndex
      .probeCandidates(batch, maintained, Tau, NB)
      .as[(Long, Long)].collect().sorted.toSeq
    val viaFull = BandIndex.probeCandidates(batch, full, Tau, NB)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaMaintained == viaFull && viaMaintained.nonEmpty)
    // every planted twin must find its source doc among candidates
    // (banding recall at J ≈ (W-1)/W is ~1 by construction)
    val planted = batch.select($"doc_id").as[Long].collect().toSet
    val recovered = viaMaintained.map(_._1).toSet
    assert(planted.subsetOf(recovered),
      s"missing twins: ${planted diff recovered}")
    viaMaintained.foreach { case (b, c) =>
      assert(b >= 5000000L && c < 5000000L,
        "cross pairs must be batch x corpus")
    }
  }

  test("the probe lists only the batch's buckets") {
    // 16 band keys per doc into 64 buckets: one doc touches ≤ 16
    // buckets, so the literal IN-prune must name a strict subset
    val wide = 64
    val path = "/tmp/graft_band_index/wide"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    BandIndex.writeBandLayout(BandIndex.buildBands(docs, Tau, wide), path,
      Tau, wide)
    val batch = docs.orderBy($"doc_id").limit(1)
    val batchBuckets = BandIndex.buildBands(batch, Tau, wide)
      .select($"bucket".cast("long")).distinct().as[Long].collect().toSet
    assert(batchBuckets.size <= 16)
    val absent = (0L until wide.toLong).toSet diff batchBuckets
    assert(absent.nonEmpty, "one doc's bands must not cover 64 buckets")
    val probe = BandIndex.probeCandidates(batch, path, Tau, wide)
    // the index read rides the DSv2 bands connector: the bucket
    // IN-prune is pushed into the scan itself, which reports the
    // derived bucket set (pruning happens at listing time — see
    // graft.sources.BandsSource); pin it to exactly the batch's
    // buckets. Parsed from the tree string — node collection does not
    // descend into the AQE wrapper.
    val plan = probe.queryExecution.executedPlan.treeString
    assert(plan.contains("GraftBandsScan"), plan.take(1200))
    val inList = "GraftBandsScan[^\\n]*?buckets=\\{([0-9,]*)\\}".r
      .findFirstMatchIn(plan)
      .map(_.group(1).split(",").filter(_.nonEmpty).map(_.toLong).toSet)
    assert(inList.contains(batchBuckets),
      s"scan bucket prune ${inList.orNull} != batch buckets " +
        s"$batchBuckets in plan:\n${plan.take(1200)}")
  }

  test("geometry is stamped into the layout; mismatched appends and " +
      "probes fail fast") {
    val path = "/tmp/graft_band_index/meta"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val small = docs.limit(10)
    BandIndex.writeBandLayout(BandIndex.buildBands(small, Tau, NB), path,
      Tau, NB)
    assert(BandIndex.readMeta(spark, path) == ((Tau, NB)))
    // wrong tau and wrong nBuckets each refuse both maintenance paths
    for ((t, n) <- Seq((0.7, NB), (Tau, NB * 2))) {
      val ea = intercept[IllegalArgumentException](
        BandIndex.appendBands(small, path, t, n))
      assert(ea.getMessage.contains("geometry mismatch"))
      val ep = intercept[IllegalArgumentException](
        BandIndex.probeCandidates(small, path, t, n))
      assert(ep.getMessage.contains("geometry mismatch"))
    }
    // a layout with no meta (pre-geometry or foreign) is refused too
    val p = new org.apache.hadoop.fs.Path(path, "_graft_meta.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false)
    val e = intercept[IllegalArgumentException](
      BandIndex.probeCandidates(small, path, Tau, NB))
    assert(e.getMessage.contains("_graft_meta.json"))
  }

  test("negative doc_ids are refused on both sides of the probe") {
    val path = "/tmp/graft_band_index/negids"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val ok = docs.limit(5)
    BandIndex.writeBandLayout(BandIndex.buildBands(ok, Tau, NB), path,
      Tau, NB)
    val bad = ok.select((-$"doc_id" - 1000L).as("doc_id"), $"text")
    // batch side: the bucket-list aggregate carries the guard
    val eb = intercept[IllegalArgumentException](
      BandIndex.probeCandidates(bad, path, Tau, NB))
    assert(eb.getMessage.contains("non-negative"))
    // write side: the in-query raise_error guard fires during append
    val ew = intercept[Exception](BandIndex.appendBands(bad, path, Tau, NB))
    assert(ew.getMessage != null)
    // initial-write side: caller-built bands with negative ids are
    // refused too — a layout can never be published with ids the
    // probe's sign-flip encoding would misclassify
    val badBands = BandIndex.buildBands(ok, Tau, NB)
      .select((-$"doc_id" - 1000L).as("doc_id"),
        $"band_no", $"band_hash", $"bucket")
    val p2 = "/tmp/graft_band_index/negids_init"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p2))
    val ei = intercept[Exception](
      BandIndex.writeBandLayout(badBands, p2, Tau, NB))
    assert(ei.getMessage != null)
  }
}
