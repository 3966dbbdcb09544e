package graft

import graft.operators.{BandIndex, InvertedIndex, IvfIndex, TxBatch}
import org.apache.spark.sql.functions._

/** The index-layout compaction contract ([[TxBatch.compact]]): fold
  * base + committed batches into one new base generation under ONE
  * atomic rename — content bitwise-preserved, the applied-batch-id set
  * retained (replayed micro-batches stay no-ops), the layout landing
  * at base shape, and a crash mid-compact leaving the old layout fully
  * readable (the S22 crash-injection pattern). */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 8

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def clean(paths: String*): Unit = paths.foreach(p =>
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))

  private def entries(root: String): Set[String] =
    new java.io.File(root).listFiles().map(_.getName).toSet

  test("postings compaction: content and stats bitwise-preserved, " +
      "the layout lands at base shape, replayed pre-compaction batch " +
      "ids stay no-ops, and the DSv2 connector reads the new base " +
      "with pushdown intact") {
    val root = "/tmp/graft_compact/postings"
    clean(root, root + ".stats")
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root)
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 2 === 1), root, NB, 7L))
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 4 === 1).limit(3), root, NB, 8L))
    def content() = InvertedIndex.readLayout(spark, root)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    def stats() = InvertedIndex.readStats(spark, root)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val before = content()
    val statsBefore = stats()
    assert(InvertedIndex.compact(spark, root))
    assert(content() == before, "compaction must preserve content")
    assert(stats() == statsBefore, "compaction must preserve stats")
    // base shape: one _base-1 unit, no batch dirs, no root buckets
    val names = entries(root)
    assert(names.contains("_base-1") &&
      !names.exists(_.startsWith("_batch-")) &&
      !names.exists(_.startsWith("bucket=")), names.toString)
    // replayed pre-compaction ids are still no-ops (the applied set)
    assert(!InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 2 === 1), root, NB, 7L))
    assert(!InvertedIndex.appendPostingsIdempotent(
      docs.limit(1), root, NB, 8L))
    assert(content() == before)
    // the connector reads the compacted base; term pushdown intact
    val terms = docs.select(explode(split($"text", " ")).as("t"))
      .distinct().limit(3).as[String].collect().toSeq
    val viaV2 = InvertedIndex.lookupTermsV2(spark, root, terms, NB)
    assert(viaV2.collect().map(_.toSeq).toSet ==
      InvertedIndex.lookupTerms(spark, root, terms, NB)
        .select(viaV2.columns.map(col): _*)
        .collect().map(_.toSeq).toSet)
    // a fresh post-compaction append lands live; a second compaction
    // folds it into gen 2 and re-preserves everything
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.limit(2), root, NB, 9L))
    val withNine = content()
    assert(InvertedIndex.compact(spark, root))
    assert(content() == withNine)
    assert(entries(root).contains("_base-2") &&
      !entries(root).contains("_base-1"))
    assert(!InvertedIndex.appendPostingsIdempotent(
      docs.limit(2), root, NB, 9L))
  }

  test("crash mid-compact (failpoint before the rename) leaves the " +
      "old layout fully readable; the retry compacts cleanly") {
    val root = "/tmp/graft_compact/bands"
    clean(root)
    val half = docs.filter($"doc_id" % 2 === 0)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(half, 0.8, NB), root, 0.8, NB)
    assert(BandIndex.appendBandsIdempotent(
      docs.filter($"doc_id" % 2 === 1), root, 0.8, NB, 5L))
    def content() = BandIndex.readLayout(spark, root)
      .select($"doc_id", $"band_no", $"band_hash",
        $"bucket".cast("long").as("bucket"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val before = content()
    intercept[RuntimeException](TxBatch.compact(spark, root, "bucket",
      None, crashBeforePublish = true))
    // nothing published: still gen 0, batch dir intact, content equal
    assert(!entries(root).exists(_.startsWith("_base-")))
    assert(entries(root).contains("_batch-5"))
    assert(content() == before)
    // geometry still resolves (root meta, the gen-0 convention)
    assert(BandIndex.readMeta(spark, root) == ((0.8, NB)))
    // the retry sweeps the dead staging and publishes
    assert(BandIndex.compact(spark, root))
    assert(content() == before)
    assert(BandIndex.readMeta(spark, root) == ((0.8, NB)))
    assert(!entries(root).exists(_.startsWith("_staging-base-")) &&
      !entries(root).exists(_.startsWith("_batch-")), entries(root))
  }

  test("pairs-sink compaction (baseless root): the live consumers' " +
      "trigger batches fold into one base generation — readPairs " +
      "content preserved (including empty-trigger markers), replayed " +
      "trigger ids stay no-ops, fan-in drops to one root") {
    import graft.streaming.CellStreams
    val root = "/tmp/graft_compact/pairs"
    clean(root)
    def pairsDf(ids: Seq[Long]) = ids.map(i =>
      (i, i + 100L, (i % 8) + 1L, 0.5 + i * 0.01, i % 32L))
      .toDF("batch_vec", "corpus_vec", "cell", "cos", "bucket")
    assert(graft.operators.TxBatch.publish(spark, root, 0L,
      pairsDf(Seq(1L, 2L)), None))
    // an EMPTY trigger still publishes its idempotence marker
    assert(graft.operators.TxBatch.publish(spark, root, 1L,
      pairsDf(Seq.empty), None))
    assert(graft.operators.TxBatch.publish(spark, root, 2L,
      pairsDf(Seq(3L)), None))
    def content() = CellStreams.readPairs(spark, root)
      .collect().map(_.toSeq).toSet
    val before = content()
    assert(before.size == 3)
    assert(CellStreams.compactPairs(spark, root))
    assert(content() == before)
    val names = entries(root)
    assert(names.contains("_base-1") &&
      !names.exists(_.startsWith("_batch-")), names.toString)
    // a retried trigger of a folded id publishes nothing
    assert(!graft.operators.TxBatch.publish(spark, root, 2L,
      pairsDf(Seq(99L)), None))
    assert(content() == before)
    // nothing new to fold → no-op; a fresh trigger + second compact
    // lands at gen 2 with everything preserved
    assert(!CellStreams.compactPairs(spark, root))
    assert(graft.operators.TxBatch.publish(spark, root, 3L,
      pairsDf(Seq(4L)), None))
    assert(CellStreams.compactPairs(spark, root))
    assert(content().size == 4 &&
      entries(root).contains("_base-2"))
  }

  test("cell-layout compaction: readLayout, readCells and the DSv2 " +
      "connector (cell pushdown) all resolve the new base; nothing " +
      "to fold is a no-op") {
    val root = "/tmp/graft_compact/cells"
    clean(root)
    val K = 8
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents), root,
      K, cents.head.length)
    // no live batches: compaction has nothing to fold
    assert(!IvfIndex.compact(spark, root))
    assert(IvfIndex.appendCellsIdempotent(
      IvfIndex.assignCells(emb.filter($"vec_id" % 10 === 0), cents),
      root, 1L))
    def content() = IvfIndex.readLayout(spark, root)
      .select($"vec_id", $"cell".cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = content()
    assert(IvfIndex.compact(spark, root))
    assert(content() == before)
    assert(IvfIndex.readCellMeta(spark, root) ==
      ((K, cents.head.length)))
    // readCells resolves the new base (a literal cell prune)
    assert(IvfIndex.readCells(spark, root, Seq(1L, 2L))
      .select($"vec_id").count() ==
      before.count(c => c._2 == 1L || c._2 == 2L))
    // connector parity + pruned listing through the compacted base
    val viaConn = spark.read.format("graft.sources.CellsSource")
      .option("path", root).load()
      .select($"vec_id", $"cell".cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaConn == before)
    val pruned = spark.read.format("graft.sources.CellsSource")
      .option("path", root).load()
      .filter($"cell" === 3L)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(pruned == before.collect { case (v, 3L) => v })
  }

  test("offset-translation refusal matrix at unit level: happy fold, " +
      "outran consumer, unknown units, newer-than-layout generation, " +
      "and a history-less (legacy) fold all behave as documented") {
    val root = "/tmp/graft_compact/translate"
    clean(root, root + ".stats")
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root)
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 2 === 1), root, NB, 1L))
    assert(InvertedIndex.compact(spark, root))
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def xlate(seen: Set[String]) =
      TxBatch.translateUnits(fs, rootPath, seen, "spec")
    // happy: the consumer had the old base AND the folded batch -
    // together they ARE the new base
    assert(xlate(Set(".", "_batch-1")) == Set("_base-1"))
    // active units pass through untouched (fast path)
    assert(xlate(Set("_base-1")) == Set("_base-1"))
    // outran: batch 1 was folded but never delivered to this consumer
    val e1 = intercept[IllegalStateException](xlate(Set(".")))
    assert(e1.getMessage.contains("never processed"), e1.getMessage)
    // a unit in no generation's history = out-of-protocol deletion
    val e2 = intercept[IllegalStateException](
      xlate(Set(".", "_batch-1", "_batch-9")))
    assert(e2.getMessage.contains("no generation's fold history"),
      e2.getMessage)
    // a captured generation NEWER than the layout's = replaced layout
    val e3 = intercept[IllegalStateException](xlate(Set("_base-5")))
    assert(e3.getMessage.contains("NEWER"), e3.getMessage)
    // legacy fold: delete the history file - translation must refuse
    // rather than guess (a pre-r15 compaction recorded nothing)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/_base-1/${TxBatch.FoldedFile}"), false))
    val e4 = intercept[IllegalStateException](
      xlate(Set(".", "_batch-1")))
    assert(e4.getMessage.contains("no fold history"), e4.getMessage)
  }

  test("maintainCompact folds only at the fan-in threshold: below it " +
      "the layout is untouched, at it the fold runs and the count " +
      "resets") {
    val root = "/tmp/graft_compact/policy"
    clean(root, root + ".stats")
    val half = docs.filter($"doc_id" % 4 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root)
    val before = InvertedIndex.readLayout(spark, root).count()
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 4 === 1), root, NB, 1L))
    // one live batch, threshold 2: untouched (no _base- generation)
    assert(!TxBatch.maintainCompact(spark, root, maxLiveBatches = 2))
    assert(!entries(root).exists(_.startsWith("_base-")))
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 4 === 2), root, NB, 2L))
    // two live batches: the policy trips, the fold runs
    val total = InvertedIndex.readLayout(spark, root).count()
    assert(total > before)
    assert(TxBatch.maintainCompact(spark, root, maxLiveBatches = 2))
    assert(entries(root).contains("_base-1"))
    assert(TxBatch.liveBatchDirs(spark, root).isEmpty)
    assert(InvertedIndex.readLayout(spark, root).count() == total)
    // and immediately after the fold the policy is quiet again
    assert(!TxBatch.maintainCompact(spark, root, maxLiveBatches = 2))
  }

  test("onlyIds restricts a fold to the named batch ids: unfolded " +
      "batches stay LIVE (a concurrent writer's fresh batch is never " +
      "folded undelivered), and offset translation across the " +
      "partial fold passes live units through unchanged") {
    val root = "/tmp/graft_compact/partial"
    clean(root, root + ".stats")
    val half = docs.filter($"doc_id" % 4 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), root)
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 4 === 1), root, NB, 1L))
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 4 === 2), root, NB, 2L))
    val total = InvertedIndex.readLayout(spark, root).count()
    // fold ONLY batch 1 — batch 2 arrived "mid-trigger" and must
    // survive live; the eligible count (1) gates the policy too
    assert(!TxBatch.maintainCompact(spark, root, maxLiveBatches = 2,
      onlyIds = Some(Set(1L))))
    assert(TxBatch.maintainCompact(spark, root, maxLiveBatches = 1,
      onlyIds = Some(Set(1L))))
    assert(entries(root).contains("_base-1") &&
      entries(root).contains("_batch-2") &&
      !entries(root).contains("_batch-1"), entries(root).toString)
    assert(InvertedIndex.readLayout(spark, root).count() == total)
    // a consumer whose offsets name {base, _batch-1, _batch-2}
    // translates: folded batch 1 was delivered, live batch 2 passes
    // through unchanged
    val r = new org.apache.hadoop.fs.Path(root)
    val fs = r.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(TxBatch.translateUnits(fs, r,
      Set(".", "_batch-1", "_batch-2"), "partial-fold consumer") ==
      Set("_base-1", "_batch-2"))
    // a replayed pre-fold batch id is still a no-op after the partial
    // fold; the remaining live batch folds on the next full pass
    assert(!InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 4 === 1), root, NB, 1L))
    assert(TxBatch.compact(spark, root))
    assert(entries(root).contains("_base-2") &&
      !entries(root).contains("_batch-2"))
    assert(InvertedIndex.readLayout(spark, root).count() == total)
  }

  test("S35 maintenance lease: two CONCURRENT compact calls on one " +
      "layout SERIALIZE — exactly one folds, the other waits and " +
      "no-ops against the already-folded layout; content preserved, " +
      "one new generation, the lease released, the fencing " +
      "generation advanced once per acquisition") {
    for (round <- 1 to 3) {
      val root = s"/tmp/graft_compact/concurrent/r$round"
      clean(root)
      val half = docs.filter($"doc_id" % 2 === 0)
      BandIndex.writeBandLayout(
        BandIndex.buildBands(half, 0.5, NB), root, 0.5, NB)
      assert(BandIndex.appendBandsIdempotent(
        docs.filter($"doc_id" % 2 === 1), root, 0.5, NB, 1L))
      def content() = BandIndex.readLayout(spark, root)
        .select($"doc_id", $"band_no", $"band_hash")
        .collect().map(_.toSeq).toSet
      val before = content()
      val results = scala.collection.concurrent
        .TrieMap.empty[Int, Either[Throwable, Boolean]]
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq(0, 1).map { i =>
        val t = new Thread(() => {
          start.await()
          val r = try Right(TxBatch.compact(spark, root))
          catch { case e: Throwable => Left(e) }
          results.put(i, r)
          ()
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(180000L))
      val rs = Seq(0, 1).flatMap(results.get)
      assert(rs.length == 2, s"round $round: a compact hung: $results")
      // pre-lease, both could pay a full staged fold and race the
      // rename (individually safe, collectively wasteful and a torn
      // listing for any concurrent reader of the loser's sweep);
      // under the lease exactly one folds and one no-ops
      assert(rs.count(_ == Right(true)) == 1 &&
        rs.count(_ == Right(false)) == 1,
        s"round $round: expected one fold + one no-op, got $rs")
      assert(content() == before,
        s"round $round: concurrent compaction changed content")
      val names = entries(root)
      assert(names.contains("_base-1") && !names.contains("_base-2") &&
        !names.exists(_.startsWith("_batch-")), names.toString)
      assert(!names.contains(TxBatch.MaintenanceLease),
        s"round $round: the maintenance lease leaked")
      // both contenders acquired (winner folds, loser observes the
      // folded layout) — the monotone fencing generation counted both
      val genFile = new java.io.File(root,
        s"${TxBatch.MaintenanceLease}.gen")
      assert(genFile.exists())
      val gen = new String(java.nio.file.Files
        .readAllBytes(genFile.toPath), "UTF-8").trim.toLong
      assert(gen == 2L, s"round $round: fencing generation $gen")
    }
  }
}
