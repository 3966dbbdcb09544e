package graft

import graft.operators.BandIndex
import graft.sources.BandsSource
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import org.apache.spark.sql.functions._

/** The DSv2 bands connector contract: bucket (or band_hash, from which
  * the bucket follows by the layout's own pmod) predicates are PUSHED
  * INTO the scan and prune unprobed bucket directories at file-listing
  * time; the scan reports statistics over the pruned listing so narrow
  * probes broadcast without a manual hint. */
class BandsSourceSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 16
  private val Tau = 0.8
  private lazy val root = {
    val p = "/tmp/graft_bands_v2/layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    BandIndex.writeBandLayout(BandIndex.buildBands(docs, Tau, NB), p,
      Tau, NB)
    p
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))

  private def load() = spark.read.format("graft.sources.BandsSource")
    .option("path", root).load()

  test("geometry comes from the layout meta; connector rows equal " +
      "the raw parquet rows") {
    val cols = Seq($"doc_id", $"band_no", $"band_hash",
      $"bucket".cast("long").as("bucket"))
    val raw = spark.read.parquet(root).select(cols: _*)
      .orderBy($"doc_id", $"band_no").collect().toSeq
    val v2 = load().select(cols: _*)
      .orderBy($"doc_id", $"band_no").collect().toSeq
    assert(raw.nonEmpty && v2 == raw)
  }

  test("bucket and band_hash predicates are pushed and prune the " +
      "file listing; conjunctions intersect") {
    val some = spark.read.parquet(root)
      .select($"band_hash").distinct().limit(3)
      .as[Long].collect().toSeq
    val byHash = load().filter($"band_hash".isin(some: _*))
    val wantBuckets = some.map(BandsSource.bucketOf(_, NB)).toSet
    val desc = scanOf(byHash).description()
    assert(desc.contains("GraftBandsScan"), desc)
    assert(desc.contains(
      wantBuckets.toSeq.sorted.mkString("{", ",", "}")), desc)
    val all = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    val wantFiles = all
      .filter(d => wantBuckets.contains(
        d.getName.stripPrefix("bucket=").toLong))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val totalFiles = all.flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    val gotFiles = "files=(\\d+)".r.findFirstMatchIn(desc).get.group(1).toInt
    assert(gotFiles == wantFiles && gotFiles < totalFiles,
      s"files=$gotFiles want=$wantFiles total=$totalFiles")
    // rows equal the raw filtered read (pushed filters are accepted,
    // not advisory: the reader re-checks the hash set)
    val want = spark.read.parquet(root)
      .filter($"band_hash".isin(some: _*))
      .select($"doc_id", $"band_no", $"band_hash")
      .orderBy($"doc_id", $"band_no").collect().toSeq
    assert(byHash.select($"doc_id", $"band_no", $"band_hash")
      .orderBy($"doc_id", $"band_no").collect().toSeq == want)
    // conjunctive hash sets intersect: h AND (h' != h) is empty
    assert(load().filter($"band_hash" === some.head &&
      $"band_hash" === (some.head + 1L)).count() == 0L)
    // overlapping IN lists keep only the overlap
    val overlap = load().filter(
      $"band_hash".isin(some: _*) && $"band_hash".isin(some.head))
    assert(overlap.count() == spark.read.parquet(root)
      .filter($"band_hash" === some.head).count())
  }

  test("the scan reports statistics over the pruned listing; a narrow " +
      "probe joined to documents broadcasts without a hint") {
    val one = spark.read.parquet(root)
      .select($"bucket".cast("long")).distinct().limit(1)
      .as[Long].collect().head
    val pruned = scanOf(load().filter($"bucket" === one))
      .asInstanceOf[graft.sources.BandsScan]
    val full = scanOf(load()).asInstanceOf[graft.sources.BandsScan]
    val prunedBytes = pruned.estimateStatistics().sizeInBytes()
    val fullBytes = full.estimateStatistics().sizeInBytes()
    assert(prunedBytes.isPresent && fullBytes.isPresent)
    assert(prunedBytes.getAsLong > 0L &&
      prunedBytes.getAsLong < fullBytes.getAsLong,
      s"pruned=$prunedBytes full=$fullBytes")
    // without SupportsReportStatistics a DSv2 scan defaults to
    // spark.sql.defaultSizeInBytes (Long.Max) and can never broadcast;
    // a BroadcastHashJoin here proves OUR pruned statistics flowed
    // into the join decision
    val joined = Tables.documents(spark, sf)
      .join(load().filter($"bucket" === one), "doc_id")
    // collect() does not descend into the AQE wrapper — pin on the tree
    val tree = joined.queryExecution.executedPlan.treeString
    assert(tree.contains("BroadcastHashJoin") &&
      !tree.contains("SortMergeJoin"), tree.take(2000))
  }

  test("DSv2 append write: a batch written through the connector " +
      "equals the appendBands path; mis-bucketed rows, negative ids " +
      "and mismatched geometry options are refused; aborts stage-clean") {
    import org.apache.spark.sql.SaveMode
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def freshLayout(p: String): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      BandIndex.writeBandLayout(BandIndex.buildBands(base, Tau, NB), p,
        Tau, NB)
    }
    val viaHelper = "/tmp/graft_bands_v2/append_helper"
    val viaV2 = "/tmp/graft_bands_v2/append_v2"
    freshLayout(viaHelper); freshLayout(viaV2)
    BandIndex.appendBands(batch, viaHelper, Tau, NB)
    val bandRows = BandIndex.buildBands(batch, Tau, NB)
      .select($"doc_id", $"band_no", $"band_hash",
        $"bucket".cast("long").as("bucket"))
    bandRows.write.format("graft.sources.BandsSource")
      .option("path", viaV2).option("tau", Tau.toString)
      .option("nBuckets", NB.toString)
      .mode(SaveMode.Append).save()
    val cols = Seq($"doc_id", $"band_no", $"band_hash",
      $"bucket".cast("long").as("bucket"))
    val a = spark.read.parquet(viaHelper).select(cols: _*)
      .orderBy($"doc_id", $"band_no").collect().toSeq
    val b = spark.read.parquet(viaV2).select(cols: _*)
      .orderBy($"doc_id", $"band_no").collect().toSeq
    assert(a.nonEmpty && b == a)
    // the connector reads its own appended layout identically
    val v2 = spark.read.format("graft.sources.BandsSource")
      .option("path", viaV2).load()
      .select(cols: _*).orderBy($"doc_id", $"band_no").collect().toSeq
    assert(v2 == a)
    // no staging residue after commit
    assert(new java.io.File(viaV2).listFiles()
      .forall(!_.getName.startsWith(".staging-")))
    val visible = spark.read.parquet(viaV2).count()
    // a mis-bucketed row is refused, and the failed job publishes nothing
    val bad = bandRows.limit(8)
      .withColumn("bucket", ($"bucket" + 1L) % NB.toLong)
    intercept[Exception](bad.write.format("graft.sources.BandsSource")
      .option("path", viaV2).mode(SaveMode.Append).save())
    assert(spark.read.parquet(viaV2).count() == visible)
    // a negative doc_id is refused (the probe sign-flip contract)
    val neg = bandRows.limit(1).withColumn("doc_id", lit(-5L))
    intercept[Exception](neg.write.format("graft.sources.BandsSource")
      .option("path", viaV2).mode(SaveMode.Append).save())
    assert(spark.read.parquet(viaV2).count() == visible)
    // a geometry-mismatched option set is refused at the boundary
    intercept[Exception](bandRows.write
      .format("graft.sources.BandsSource")
      .option("path", viaV2).option("tau", "0.5")
      .mode(SaveMode.Append).save())
    intercept[Exception](bandRows.write
      .format("graft.sources.BandsSource")
      .option("path", viaV2).option("nBuckets", (NB * 2).toString)
      .mode(SaveMode.Append).save())
    assert(spark.read.parquet(viaV2).count() == visible)
  }

  test("micro-batch streaming read tails the layout's appends: first " +
      "trigger delivers the base layout, each appendBands batch " +
      "delivers exactly its files") {
    val p = "/tmp/graft_bands_v2/stream"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    BandIndex.writeBandLayout(BandIndex.buildBands(base, Tau, NB), p,
      Tau, NB)
    val q = spark.readStream.format("graft.sources.BandsSource")
      .option("path", p).load()
      .writeStream.format("memory").queryName("t_bands_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val afterBase = spark.table("t_bands_stream").count()
      assert(afterBase == spark.read.parquet(p).count() && afterBase > 0)
      BandIndex.appendBands(b1, p, Tau, NB)
      q.processAllAvailable()
      assert(spark.table("t_bands_stream").count() ==
        spark.read.parquet(p).count())
      // the idempotent (TxBatch _batch-<id>) append path is tailed too
      assert(BandIndex.appendBandsIdempotent(b2, p, Tau, NB, 7L))
      q.processAllAvailable()
      val cols = Seq($"doc_id", $"band_no", $"band_hash",
        $"bucket".cast("long").as("bucket"))
      val streamed = spark.table("t_bands_stream").select(cols: _*)
        .orderBy($"doc_id", $"band_no").collect().toSeq
      val layout = BandIndex.readLayout(spark, p).select(cols: _*)
        .orderBy($"doc_id", $"band_no").collect().toSeq
      assert(streamed == layout)
    } finally q.stop()
  }

  test("stream restarts from the checkpointed offset: the post-stop " +
      "append is delivered exactly once, no replay of the base") {
    val p = "/tmp/graft_bands_v2/restart"
    val ckpt = "/tmp/graft_bands_v2/restart_ckpt"
    val out = "/tmp/graft_bands_v2/restart_out"
    Seq(p, ckpt, out).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    BandIndex.writeBandLayout(BandIndex.buildBands(base, Tau, NB), p,
      Tau, NB)
    val nFiles = new java.io.File(p).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 2, s"need a multi-file first batch, got $nFiles")
    def start() = spark.readStream.format("graft.sources.BandsSource")
      .option("path", p).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() ==
        spark.read.parquet(p).count())
    } finally q1.stop()
    // append while the stream is DOWN, then restart from the checkpoint
    BandIndex.appendBands(b1, p, Tau, NB)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val cols = Seq($"doc_id", $"band_no", $"band_hash",
        $"bucket".cast("long").as("bucket"))
      val sunk = spark.read.parquet(out).select(cols: _*)
        .orderBy($"doc_id", $"band_no").collect().toSeq
      val layout = spark.read.parquet(p).select(cols: _*)
        .orderBy($"doc_id", $"band_no").collect().toSeq
      assert(sunk == layout,
        s"restart must deliver exactly the appended files: " +
          s"${sunk.size} sunk vs ${layout.size} in layout")
    } finally q2.stop()
  }

  test("mixed geometry is refused: the connector reads nBuckets from " +
      "the stamped meta, a geometry-less layout cannot be opened") {
    val bare = "/tmp/graft_bands_v2/bare"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bare))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .limit(4)
    BandIndex.buildBands(docs, Tau, NB)
      .write.mode("overwrite").partitionBy("bucket").parquet(bare)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft.sources.BandsSource")
        .option("path", bare).load())
    assert(e.getMessage.contains("_graft_meta.json"))
  }
}
