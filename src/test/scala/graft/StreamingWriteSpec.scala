package graft

import graft.operators.{BandIndex, InvertedIndex, IvfIndex}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class PostingRow(term: String, doc_id: Long, dl: Long, tf: Long,
  bucket: Long)
case class BandRow(doc_id: Long, band_no: Int, band_hash: Long,
  bucket: Long)
case class CellRow(vec_id: Long, v: Seq[Double], cell: Long)

/** Native `STREAMING_WRITE` through the three layout connectors:
  * `writeStream.format(...)` commits each epoch through the TxBatch
  * manifest protocol (epoch id ≡ batch id) — streamed content equals
  * the idempotent-append content, a re-delivered epoch (restart with
  * its commit marker removed) is a no-op, and a failed epoch aborts
  * with no residue. */
class StreamingWriteSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 8

  private def clean(paths: String*): Unit = paths.foreach(p =>
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))

  private def entries(root: String): Set[String] =
    new java.io.File(root).listFiles().map(_.getName).toSet

  /** Drop the commits marker of the stream's last batch so a restart
    * re-delivers it — the retry path the epoch ≡ batch-id contract
    * must no-op. */
  private def dropLastCommit(ckpt: String): Long = {
    val dir = new java.io.File(s"$ckpt/commits")
    val last = dir.listFiles().map(_.getName).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    assert(new java.io.File(dir, last.toString).delete())
    // the local FS keeps a .crc sidecar; a leftover one makes the
    // replayed commit's rename collide
    new java.io.File(dir, s".$last.crc").delete()
    last
  }

  test("postings: a streaming write equals the idempotent-append " +
      "content; epoch re-delivery is a no-op") {
    val root = "/tmp/graft_swrite/postings"
    val twin = "/tmp/graft_swrite/postings_twin"
    val ckpt = "/tmp/graft_swrite/postings_ckpt"
    clean(root, twin, ckpt, root + ".stats", twin + ".stats")
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB), stats, root)
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB), stats, twin)
    val batch = docs.filter($"doc_id" % 2 === 1)
    // twin lane: the established idempotent append
    assert(InvertedIndex.appendPostingsIdempotent(batch, twin, NB, 0L))
    // stream lane: the SAME postings rows through writeStream
    val rows = InvertedIndex.buildPostings(batch, NB)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .as[PostingRow].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PostingRow]
    input.addData(rows)
    def start() = input.toDF()
      .writeStream.format("graft.sources.PostingsSource")
      .option("path", root).option("nBuckets", NB.toString)
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    def content(p: String) = InvertedIndex.readLayout(spark, p)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(content(root) == content(twin) && content(root).nonEmpty)
    // the epoch landed as the TxBatch unit its id names
    assert(entries(root).exists(_.startsWith("_batch-")))
    // re-delivery: drop the commit marker, restart, same data replays
    val replayed = dropLastCommit(ckpt)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(content(root) == content(twin),
      s"re-delivered epoch $replayed must be a no-op")
  }

  test("bands: streamed epochs land as TxBatch batches the readers " +
      "and live probes see; mis-bucketed rows abort with no residue") {
    val root = "/tmp/graft_swrite/bands"
    val ckpt = "/tmp/graft_swrite/bands_ckpt"
    val ckptBad = "/tmp/graft_swrite/bands_ckpt_bad"
    clean(root, ckpt, ckptBad)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val half = docs.filter($"doc_id" % 2 === 0)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(half, 0.8, NB), root, 0.8, NB)
    val batch = docs.filter($"doc_id" % 2 === 1)
    val rows = BandIndex.buildBands(batch, 0.8, NB)
      .select($"doc_id", $"band_no".cast("int").as("band_no"),
        $"band_hash", $"bucket".cast("long").as("bucket"))
      .as[BandRow].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BandRow]
    input.addData(rows)
    val q = input.toDF()
      .writeStream.format("graft.sources.BandsSource")
      .option("path", root).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val expected = BandIndex.readLayout(spark, root)
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet
    val brute = BandIndex.buildBands(docs, 0.8, NB)
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet
    assert(expected == brute)
    // a mis-bucketed row fails the epoch: abort leaves no residue
    val before = entries(root)
    val bad = MemoryStream[BandRow]
    bad.addData(Seq(BandRow(1L, 0, 5L, (5L % NB) + 1L)))
    val qBad = bad.toDF()
      .writeStream.format("graft.sources.BandsSource")
      .option("path", root).option("checkpointLocation", ckptBad)
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qBad.processAllAvailable()
      throw new IllegalStateException(
        qBad.exception.map(_.toString).getOrElse("expected a failure"))
    }
    qBad.stop()
    assert(BandIndex.readLayout(spark, root)
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet == brute)
    assert(entries(root).filterNot(_.startsWith(".staging-stream-"))
      == before.filterNot(_.startsWith(".staging-stream-")),
      s"aborted epoch left residue: ${entries(root) -- before}")
  }

  test("crash residue sweeps on the streaming lane: stale " +
      "_staging-<epoch>-* and abandoned .staging-stream-* roots are " +
      "cleared at commit, committed batches untouched") {
    val root = "/tmp/graft_swrite/sweep"
    val ckpt = "/tmp/graft_swrite/sweep_ckpt"
    clean(root, ckpt)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val half = docs.filter($"doc_id" % 2 === 0)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(half, 0.8, NB), root, 0.8, NB)
    // plant the two residue classes a pure-streaming layout never
    // otherwise clears: a dead stream's dot-hidden root and a crashed
    // epoch's publish staging
    assert(new java.io.File(root, ".staging-stream-deadrun00001/3")
      .mkdirs())
    assert(new java.io.File(root, "_staging-0-abcd1234").mkdirs())
    val rows = BandIndex.buildBands(
      docs.filter($"doc_id" % 2 === 1), 0.8, NB)
      .select($"doc_id", $"band_no".cast("int").as("band_no"),
        $"band_hash", $"bucket".cast("long").as("bucket"))
      .as[BandRow].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BandRow]
    input.addData(rows)
    val q = input.toDF()
      .writeStream.format("graft.sources.BandsSource")
      .option("path", root).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val names = entries(root)
    assert(!names.contains(".staging-stream-deadrun00001"), names)
    assert(!names.contains("_staging-0-abcd1234"), names)
    // the epoch itself committed normally
    assert(names.exists(_.startsWith("_batch-")), names)
    assert(BandIndex.readLayout(spark, root)
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet ==
      BandIndex.buildBands(docs, 0.8, NB)
        .select($"doc_id", $"band_no", $"band_hash")
        .collect().map(_.toSeq).toSet)
  }

  test("cells: streamed vectors land co-celled and probe-able; the " +
      "geometry guard holds at the connector boundary") {
    val root = "/tmp/graft_swrite/cells"
    val ckpt = "/tmp/graft_swrite/cells_ckpt"
    clean(root, ckpt)
    val K = 8
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents), root,
      K, cents.head.length)
    val rows = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 0), cents)
      .select($"vec_id", $"v", $"cell".cast("long").as("cell"))
      .as[CellRow].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CellRow]
    input.addData(rows)
    val q = input.toDF()
      .writeStream.format("graft.sources.CellsSource")
      .option("path", root).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = IvfIndex.readLayout(spark, root)
      .select($"vec_id", $"cell".cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = IvfIndex.assignCells(emb, cents)
      .select($"vec_id", $"cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // the connector's pruned read resolves the streamed batch too
    val viaConn = spark.read.format("graft.sources.CellsSource")
      .option("path", root).load()
      .filter($"cell" === 2L).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(viaConn == want.collect { case (v, 2L) => v })
  }
}
