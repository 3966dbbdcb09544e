package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 postings connector contract: a term predicate against the
  * source is PUSHED INTO the scan, derives the bucket set with the
  * layout hash, and prunes unprobed bucket directories at
  * file-listing time — all visible on the scan node itself. */
class PostingsSourceSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 16
  private lazy val root = {
    val p = "/tmp/graft_postings_v2/layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p + ".stats"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val stats = docs.select(
        size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(docs, NB), stats, p)
    p
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("term predicate is pushed, buckets derived, files pruned") {
    val terms = Seq("alpha", "queryprobe", "the")
    val v2 = InvertedIndex.lookupTermsV2(spark, root, terms, NB)
    val scan = scanOf(v2)
    val desc = scan.description()
    assert(desc.contains("GraftPostingsScan"), desc)
    assert(desc.contains("In(term"), s"term filter not pushed: $desc")
    val wantBuckets = terms.map(InvertedIndex.bucketOf(_, NB)).toSet
    assert(desc.contains(
      wantBuckets.toSeq.sorted.mkString("{", ",", "}")),
      s"derived buckets missing from: $desc")
    // pruned listing: exactly the probed buckets' files, fewer than all
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
  }

  test("connector rows equal the path-API rows; column pruning holds") {
    val terms = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").count().orderBy($"count".desc, $"t")
      .limit(3).as[(String, Long)].collect().map(_._1).toSeq
    val cols = Seq("term", "doc_id", "dl", "tf", "bucket").map(col)
    val v1 = InvertedIndex.lookupTerms(spark, root, terms, NB)
      .select(cols: _*).orderBy($"term", $"doc_id").collect().toSeq
    val v2 = InvertedIndex.lookupTermsV2(spark, root, terms, NB)
      .select(cols: _*).orderBy($"term", $"doc_id").collect().toSeq
    assert(v1.nonEmpty && v2 == v1)
    // pruned projection: the scan's read schema narrows
    val narrow = InvertedIndex.lookupTermsV2(spark, root, terms, NB)
      .select($"doc_id", $"tf")
    assert(scanOf(narrow).readSchema().fieldNames.toSet
      .subsetOf(Set("doc_id", "tf", "term")),
      scanOf(narrow).readSchema().treeString)
    assert(narrow.agg(sum($"tf")).as[Long].collect()(0) ==
      v1.map(_.getLong(3)).sum)
  }

  test("runtime (DPP-style) filters narrow the scan: term values " +
      "injected at execution prune buckets and rows") {
    import org.apache.spark.sql.sources.{In => SIn}
    val full = spark.read.format("graft.sources.PostingsSource")
      .option("path", root).option("nBuckets", NB.toString).load()
    val scan = scanOf(full)
      .asInstanceOf[graft.sources.PostingsScan]
    val before = scan.files.size
    // the contract surface Spark's runtime-filter injection calls
    assert(scan.filterAttributes().map(_.describe()).toSet ==
      Set("term", "bucket"))
    val terms = Seq("alpha", "the")
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      SIn("term", terms.toArray[Any])))
    val wantBuckets = terms.map(InvertedIndex.bucketOf(_, NB)).toSet
    val wantFiles = new java.io.File(root).listFiles()
      .filter(d => d.isDirectory && wantBuckets.contains(
        d.getName.stripPrefix("bucket=").toLong))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(scan.files.size == wantFiles && scan.files.size < before,
      s"runtime filter did not prune: ${scan.files.size} of $before")
    // a join against a small term relation produces exactly the rows
    // of the pruned lookup, whether or not the optimizer chose to
    // inject the runtime filter in this plan
    val probeTerms = terms.toDF("term")
    val joined = spark.read.format("graft.sources.PostingsSource")
      .option("path", root).option("nBuckets", NB.toString).load()
      .join(broadcast(probeTerms), "term")
      .orderBy($"term", $"doc_id")
      .select($"term", $"doc_id", $"tf").collect().toSeq
    val direct = InvertedIndex.lookupTerms(spark, root, terms, NB)
      .orderBy($"term", $"doc_id")
      .select($"term", $"doc_id", $"tf").collect().toSeq
    assert(joined == direct && joined.nonEmpty)
  }

  test("conjunctive term predicates INTERSECT: term='a' AND term='b' " +
      "is empty, overlapping IN lists keep only the overlap") {
    val src = spark.read.format("graft.sources.PostingsSource")
      .option("path", root).option("nBuckets", NB.toString).load()
    // pick two real terms so the wrong (union) semantics would return rows
    val Seq(t1, t2) = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").count().orderBy($"count".desc, $"t")
      .limit(2).as[(String, Long)].collect().map(_._1).toSeq
    assert(src.filter($"term" === t1 && $"term" === t2).count() == 0L,
      s"term='$t1' AND term='$t2' must be empty")
    val overlap = src
      .filter($"term".isin(t1, t2) && $"term".isin(t2, "no_such_term"))
    val want = spark.read.parquet(root)
      .filter($"term" === t2).count()
    assert(want > 0L && overlap.count() == want,
      s"IN-list conjunction must keep only '$t2' rows")
    // and the intersected value's bucket is the only one listed
    val desc = scanOf(overlap).description()
    assert(desc.contains(
      s"buckets={${InvertedIndex.bucketOf(t2, NB)}}"), desc)
  }

  test("DSv2 append write: a batch written through the connector " +
      "equals the appendPostings path; mis-bucketed rows are refused") {
    import org.apache.spark.sql.SaveMode
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def freshLayout(p: String): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(p + ".stats"))
      val stats = base.select(
          size(split($"text", " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
      InvertedIndex.writeTermLayout(
        InvertedIndex.buildPostings(base, NB), stats, p)
    }
    val viaHelper = "/tmp/graft_postings_v2/append_helper"
    val viaV2 = "/tmp/graft_postings_v2/append_v2"
    freshLayout(viaHelper); freshLayout(viaV2)
    InvertedIndex.appendPostings(batch, viaHelper, NB)
    InvertedIndex.buildPostings(batch, NB)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .write.format("graft.sources.PostingsSource")
      .option("path", viaV2).option("nBuckets", NB.toString)
      .mode(SaveMode.Append).save()
    val cols = Seq($"term", $"doc_id", $"dl", $"tf",
      $"bucket".cast("long").as("bucket"))
    val a = spark.read.parquet(viaHelper).select(cols: _*)
      .orderBy($"term", $"doc_id").collect().toSeq
    val b = spark.read.parquet(viaV2).select(cols: _*)
      .orderBy($"term", $"doc_id").collect().toSeq
    assert(a.nonEmpty && b == a)
    // and the connector reads its own appended layout identically
    val v2 = spark.read.format("graft.sources.PostingsSource")
      .option("path", viaV2).option("nBuckets", NB.toString).load()
      .select(cols: _*).orderBy($"term", $"doc_id").collect().toSeq
    assert(v2 == a)
    // a row whose bucket does not match the layout hash is an error
    val bad = InvertedIndex.buildPostings(batch.limit(1), NB)
      .select($"term", $"doc_id", $"dl", $"tf",
        (($"bucket".cast("long") + 1L) % NB.toLong).as("bucket"))
    val e = intercept[Exception](
      bad.write.format("graft.sources.PostingsSource")
        .option("path", viaV2).option("nBuckets", NB.toString)
        .mode(SaveMode.Append).save())
    assert(e.getMessage != null)
  }

  test("micro-batch streaming read tails the layout's appends: each " +
      "trigger delivers exactly the new files' rows") {
    val p = "/tmp/graft_postings_v2/stream"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p + ".stats"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val b2 = docs.filter($"doc_id" % 3 === 2)
    val stats = base.select(
        size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(base, NB), stats, p)
    val q = spark.readStream.format("graft.sources.PostingsSource")
      .option("path", p).option("nBuckets", NB.toString).load()
      .writeStream.format("memory").queryName("t_postings_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val afterBase = spark.table("t_postings_stream").count()
      assert(afterBase == spark.read.parquet(p).count() && afterBase > 0)
      InvertedIndex.appendPostings(b1, p, NB)
      q.processAllAvailable()
      assert(spark.table("t_postings_stream").count() ==
        spark.read.parquet(p).count())
      InvertedIndex.appendPostings(b2, p, NB)
      q.processAllAvailable()
      // content equality, not just counts: streamed union == layout
      val cols = Seq($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      val streamed = spark.table("t_postings_stream").select(cols: _*)
        .orderBy($"term", $"doc_id").collect().toSeq
      val layout = spark.read.parquet(p).select(cols: _*)
        .orderBy($"term", $"doc_id").collect().toSeq
      assert(streamed == layout)
    } finally q.stop()
  }

  test("stream restarts from checkpoint with a multi-file first batch: " +
      "offsets round-trip the offset log; no replay, no missed files") {
    // The first micro-batch delivers the WHOLE layout (many files), so
    // its committed offset holds >= 2 paths — the exact shape that
    // corrupted the one-path-per-line offset serialization (Spark's
    // OffsetSeqLog is one offset JSON per LINE; a multi-line json()
    // breaks restart). The restart must resume, deliver only the
    // post-stop appends, and reach content equality with the layout.
    val p = "/tmp/graft_postings_v2/restart"
    val ckpt = "/tmp/graft_postings_v2/restart_ckpt"
    val out = "/tmp/graft_postings_v2/restart_out"
    Seq(p, p + ".stats", ckpt, out).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    val stats = base.select(
        size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(base, NB), stats, p)
    val nFiles = new java.io.File(p).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 2, s"need a multi-file first batch, got $nFiles")
    // file sink: the one built-in sink that RECOVERS from a checkpoint
    def start() = spark.readStream.format("graft.sources.PostingsSource")
      .option("path", p).option("nBuckets", NB.toString).load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() ==
        spark.read.parquet(p).count())
    } finally q1.stop()
    // append while the stream is DOWN, then restart from the checkpoint
    InvertedIndex.appendPostings(b1, p, NB)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly base + b1 in the sink: a corrupt offset log would have
      // failed the restart or replayed the whole layout (duplicates)
      val cols = Seq($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      val sunk = spark.read.parquet(out).select(cols: _*)
        .orderBy($"term", $"doc_id").collect().toSeq
      val layout = spark.read.parquet(p).select(cols: _*)
        .orderBy($"term", $"doc_id").collect().toSeq
      assert(sunk == layout,
        s"restart must deliver exactly the appended files: " +
          s"${sunk.size} sunk vs ${layout.size} in layout")
    } finally q2.stop()
  }

  test("DSv2 write stages files invisibly and publishes at job commit") {
    import org.apache.spark.sql.SaveMode
    val p = "/tmp/graft_postings_v2/staged"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p + ".stats"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 2 === 0)
    val stats = base.select(
        size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(base, NB), stats, p)
    val before = spark.read.parquet(p).count()
    InvertedIndex.buildPostings(docs.filter($"doc_id" % 2 === 1), NB)
      .select($"term", $"doc_id", $"dl", $"tf",
        $"bucket".cast("long").as("bucket"))
      .write.format("graft.sources.PostingsSource")
      .option("path", p).option("nBuckets", NB.toString)
      .mode(SaveMode.Append).save()
    // published: rows landed, and no staging residue is left behind
    assert(spark.read.parquet(p).count() > before)
    val residue = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith(".staging-"))
    assert(residue.isEmpty,
      s"staging root must be gone after commit: ${residue.mkString(",")}")
    // a mid-write failure leaves nothing visible: force a task error
    // after some rows would have been staged
    val bad = InvertedIndex.buildPostings(docs.limit(50), NB)
      .select($"term", $"doc_id", $"dl", $"tf",
        when($"doc_id" % 37 === 0, ($"bucket".cast("long") + 1L) % NB.toLong)
          .otherwise($"bucket".cast("long")).as("bucket"))
    val visible = spark.read.parquet(p).count()
    intercept[Exception](
      bad.write.format("graft.sources.PostingsSource")
        .option("path", p).option("nBuckets", NB.toString)
        .mode(SaveMode.Append).save())
    assert(spark.read.parquet(p).count() == visible,
      "an aborted write must leave the layout unchanged")
  }

  test("the roots allowlist bounds the listing to named commit units " +
      "— the offset-threading contract, symmetric with bands/cells") {
    val p = "/tmp/graft_postings_v2/roots_layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p + ".stats"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val half = docs.filter($"doc_id" % 2 === 0)
    val dl = half.select(size(split($"text", " ")).cast("long").as("dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(half, NB),
      dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")), p)
    assert(InvertedIndex.appendPostingsIdempotent(
      docs.filter($"doc_id" % 2 === 1), p, NB, 7L))
    def read(rootsOpt: Option[String]) = {
      val r = spark.read.format("graft.sources.PostingsSource")
        .option("path", p).option("nBuckets", NB.toString)
      rootsOpt.fold(r)(v => r.option("roots", v)).load()
    }
    val all = read(None).count()
    val baseOnly = read(Some(".")).count()
    val batchOnly = read(Some("_batch-7")).count()
    assert(baseOnly > 0 && batchOnly > 0 && baseOnly + batchOnly == all,
      s"base=$baseOnly batch=$batchOnly all=$all")
    // empty allowlist = read nothing (the first trigger's corpus),
    // distinct from the option being absent
    assert(read(Some("")).count() == 0)
    assert(scanOf(read(Some("."))).description().contains("roots={.}"))
  }

  test("no predicate scans every bucket; a bucket predicate prunes " +
      "directly") {
    val full = spark.read.format("graft.sources.PostingsSource")
      .option("path", root).option("nBuckets", NB.toString).load()
    assert(full.count() ==
      spark.read.parquet(root).count())
    val one = full.filter($"bucket" === 3L)
    assert(scanOf(one).description().contains("buckets={3}"))
    assert(one.count() ==
      spark.read.parquet(root).filter($"bucket" === 3L).count())
  }
}
