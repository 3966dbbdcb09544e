package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 cells connector contract — the ANN flagship gets the
  * S17/S18 treatment the term/band layouts already have: cell
  * predicates are PUSHED INTO the scan and prune unprobed cell
  * directories at file-listing time (pruned-file count == the probed
  * cells' files), probe-derived joins narrow the listing at runtime
  * (DPP-style), and the scan reports statistics over the pruned
  * listing so a probe-sized read broadcasts hint-free. */
class CellsSourceSpec extends SparkSuite {
  import spark.implicits._

  private val K = 16
  private lazy val emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding".cast("array<double>").as("v"))
  private lazy val cents = IvfIndex.learnCentroids(emb, K, 1)
  private lazy val root = {
    val p = "/tmp/graft_cells_v2/layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    IvfIndex.writeCellLayout(IvfIndex.assignCells(emb, cents), p,
      K, cents.head.length)
    p
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))

  private def load() = spark.read.format("graft.sources.CellsSource")
    .option("path", root).load()

  test("schema is inferred from the layout footer (vector payload) and " +
      "connector rows equal the raw parquet rows, arrays included") {
    val cols = Seq($"vec_id", $"v", $"cell".cast("long").as("cell"))
    val raw = spark.read.parquet(root).select(cols: _*)
      .orderBy($"vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    val v2 = load().select(cols: _*)
      .orderBy($"vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    assert(raw.nonEmpty && v2 == raw)
  }

  test("cell predicates are pushed and prune the file listing to " +
      "exactly the probed cells' files; conjunctions intersect") {
    val allCells = spark.read.parquet(root)
      .select($"cell".cast("long")).distinct().as[Long].collect().sorted
    assert(allCells.length >= 8, s"spread needed: ${allCells.toSeq}")
    val probed = allCells.take(4).toSeq
    val pruned = load().filter($"cell".isin(probed: _*))
    val desc = scanOf(pruned).description()
    assert(desc.contains("GraftCellsScan"), desc)
    assert(desc.contains(probed.sorted.mkString("{", ",", "}")), desc)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val wantFiles = dirs
      .filter(d => probed.contains(d.getName.stripPrefix("cell=").toLong))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val totalFiles = dirs.flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    val gotFiles = "files=(\\d+)".r.findFirstMatchIn(desc).get.group(1).toInt
    assert(gotFiles == wantFiles && gotFiles < totalFiles,
      s"files=$gotFiles want=$wantFiles total=$totalFiles")
    // pruned rows == the probed cells' members
    val want = spark.read.parquet(root)
      .filter($"cell".cast("long").isin(probed: _*))
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val got = pruned.select($"vec_id").as[Long].collect().sorted.toSeq
    assert(got == want)
    // conjunctive sets intersect: c AND (c' != c) is empty
    assert(load().filter($"cell" === probed.head &&
      $"cell" === probed(1)).count() == 0L)
  }

  test("statistics ride the pruned listing: a probe-sized read joined " +
      "to the corpus broadcasts without a manual hint") {
    val one = spark.read.parquet(root)
      .select($"cell".cast("long")).distinct().orderBy($"cell")
      .limit(1).as[Long].collect().head
    val pruned = scanOf(load().filter($"cell" === one))
      .asInstanceOf[graft.sources.CellsScan]
    val full = scanOf(load()).asInstanceOf[graft.sources.CellsScan]
    val prunedBytes = pruned.estimateStatistics().sizeInBytes()
    val fullBytes = full.estimateStatistics().sizeInBytes()
    assert(prunedBytes.isPresent && fullBytes.isPresent)
    assert(prunedBytes.getAsLong > 0L &&
      prunedBytes.getAsLong < fullBytes.getAsLong,
      s"pruned=$prunedBytes full=$fullBytes")
    // without SupportsReportStatistics a DSv2 scan defaults to
    // defaultSizeInBytes (Long.Max) and can never broadcast — a
    // BroadcastHashJoin proves OUR pruned statistics flowed in
    val joined = Tables.embeddings(spark, sf)
      .join(load().filter($"cell" === one), "vec_id")
    val tree = joined.queryExecution.executedPlan.treeString
    assert(tree.contains("BroadcastHashJoin") &&
      !tree.contains("SortMergeJoin"), tree.take(2000))
  }

  test("a probe-derived cell join narrows the scan at runtime " +
      "(DPP-style) through SupportsRuntimeFiltering") {
    val dimRoot = "/tmp/graft_cells_v2/probe_cells"
    val probes = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"),
        posexplode(IvfIndex.scoresCol($"v", cents)).as(Seq("cid0", "score")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"probe_id").orderBy($"score".desc, $"cid0")))
      .filter($"rk" <= 4)
      .select($"probe_id", ($"cid0" + 1).cast("long").as("cell"))
    probes.write.mode("overwrite").parquet(dimRoot)
    val dim = spark.read.parquet(dimRoot).filter($"probe_id" === 5L)
    val fact = load()
    val joined = fact.join(dim, Seq("cell"))
      .groupBy($"cell").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") ||
      plan.contains("RuntimeFilters"),
      s"expected runtime cell narrowing on the v2 scan:\n${plan.take(3000)}")
    // and the narrowed read returns exactly the probed cells' rows
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val wantCells = dim.select($"cell").as[Long].collect().toSet
    val want = spark.read.parquet(root)
      .filter($"cell".cast("long").isin(wantCells.toSeq: _*))
      .groupBy($"cell".cast("long")).agg(count(lit(1)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("a geometry-less layout is refused at open time") {
    val bare = "/tmp/graft_cells_v2/bare"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bare))
    IvfIndex.assignCells(emb.limit(8), cents)
      .write.mode("overwrite").partitionBy("cell").parquet(bare)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft.sources.CellsSource")
        .option("path", bare).load())
    assert(e.getMessage.contains("_graft_meta.json"))
  }

  test("a PQ-code payload (no arrays) reads through the same " +
      "connector: schema follows the footer") {
    import graft.operators.PqIndex
    val books = PqIndex.learnCodebooks(emb, cents.head.length, 4, 16, 1)
    val p = "/tmp/graft_cells_v2/pq_layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    IvfIndex.writeCellLayout(
      PqIndex.encode(IvfIndex.assignCells(emb, cents), books).drop("v"),
      p, K, cents.head.length)
    val v2 = spark.read.format("graft.sources.CellsSource")
      .option("path", p).load()
    assert(v2.columns.toSet ==
      Set("vec_id", "code_1", "code_2", "code_3", "code_4", "cell"))
    val cols = Seq($"vec_id", $"code_1", $"code_4",
      $"cell".cast("long").as("cell"))
    val raw = spark.read.parquet(p).select(cols: _*)
      .orderBy($"vec_id").collect().toSeq
    val got = v2.select(cols: _*).orderBy($"vec_id").collect().toSeq
    assert(got == raw && got.nonEmpty)
  }

  test("DSv2 append write: a batch written through the connector " +
      "equals the assignCells payload; alien cells, wrong-dim vectors, " +
      "negative ids and mismatched geometry options are refused") {
    import org.apache.spark.sql.SaveMode
    val p = "/tmp/graft_cells_v2/append_v2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val corpus = IvfIndex.assignCells(emb.filter($"vec_id" % 2 === 0), cents)
    val batch = IvfIndex.assignCells(emb.filter($"vec_id" % 2 === 1), cents)
    IvfIndex.writeCellLayout(corpus, p, K, cents.head.length)
    batch.write.format("graft.sources.CellsSource")
      .option("path", p).option("k", K.toString)
      .option("dim", cents.head.length.toString)
      .mode(SaveMode.Append).save()
    val cols = Seq($"vec_id", $"v", $"cell".cast("long").as("cell"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols: _*).orderBy($"vec_id").collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
    val expected = rows(corpus.unionByName(batch))
    assert(rows(spark.read.parquet(p)) == expected && expected.nonEmpty)
    // the connector reads its own appended layout identically
    assert(rows(spark.read.format("graft.sources.CellsSource")
      .option("path", p).load()) == expected)
    // no staging residue after commit
    assert(new java.io.File(p).listFiles()
      .forall(!_.getName.startsWith(".staging-")))
    val visible = spark.read.parquet(p).count()
    // an out-of-range cell is refused, and the failed job publishes
    // nothing (a row assigned against alien centroids must not land)
    val alien = batch.limit(4).withColumn("cell", $"cell" + lit(K.toLong))
    intercept[Exception](alien.write.format("graft.sources.CellsSource")
      .option("path", p).mode(SaveMode.Append).save())
    assert(spark.read.parquet(p).count() == visible)
    // the failed job's staging was aborted away, not left behind
    assert(!new java.io.File(p).listFiles()
      .exists(_.getName.startsWith(".staging-")),
      "aborted write must leave no staging residue")
    // a wrong-dimension vector is refused
    val short = batch.limit(1).withColumn("v", slice($"v", 1, 8))
    intercept[Exception](short.write.format("graft.sources.CellsSource")
      .option("path", p).mode(SaveMode.Append).save())
    assert(spark.read.parquet(p).count() == visible)
    // a negative vec_id is refused (the probe sign-flip contract)
    val neg = batch.limit(1).withColumn("vec_id", lit(-5L))
    intercept[Exception](neg.write.format("graft.sources.CellsSource")
      .option("path", p).mode(SaveMode.Append).save())
    assert(spark.read.parquet(p).count() == visible)
    // geometry-mismatched option sets are refused at the boundary
    intercept[Exception](batch.write.format("graft.sources.CellsSource")
      .option("path", p).option("k", (K * 2).toString)
      .mode(SaveMode.Append).save())
    intercept[Exception](batch.write.format("graft.sources.CellsSource")
      .option("path", p).option("dim", "8")
      .mode(SaveMode.Append).save())
    assert(spark.read.parquet(p).count() == visible)
  }

  test("idempotent cell append: crash before publish leaves the layout " +
      "bitwise unchanged, the retry applies exactly once, a re-send " +
      "no-ops, and geometry violations are refused in-plan") {
    val p = "/tmp/graft_cells_v2/append"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val corpus = IvfIndex.assignCells(emb.filter($"vec_id" % 5 =!= 0), cents)
    val batch = IvfIndex.assignCells(emb.filter($"vec_id" % 5 === 0), cents)
    IvfIndex.writeCellLayout(corpus, p, K, cents.head.length)
    val before = IvfIndex.readLayout(spark, p)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    // injected crash between staging and publish: nothing visible
    intercept[RuntimeException](
      IvfIndex.appendCellsIdempotent(batch, p, 1L,
        crashBeforePublish = true))
    assert(IvfIndex.readLayout(spark, p)
      .select($"vec_id").as[Long].collect().sorted.toSeq == before)
    // the retry applies the batch exactly once (and sweeps the
    // crashed attempt's stale staging); a re-send no-ops
    assert(IvfIndex.appendCellsIdempotent(batch, p, 1L))
    assert(!new java.io.File(p).listFiles()
      .exists(_.getName.startsWith("_staging-")), "staging swept")
    val after = IvfIndex.readLayout(spark, p)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(after == (before ++ batch.select($"vec_id").as[Long]
      .collect().toSeq).sorted)
    assert(!IvfIndex.appendCellsIdempotent(batch, p, 1L))
    assert(IvfIndex.readLayout(spark, p).count() == after.size.toLong)
    // rows assigned against different centroids (cell out of [1, k])
    // are refused loudly, and the refused batch leaves no residue
    val alien = batch.withColumn("cell", $"cell" + lit(K.toLong))
    val e = intercept[Exception](
      IvfIndex.appendCellsIdempotent(alien, p, 2L))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("geometry")), messages(e))
    assert(IvfIndex.readLayout(spark, p).count() == after.size.toLong)
  }

  test("micro-batch streaming read tails the layout's appends: first " +
      "trigger delivers the base, each committed batch exactly its " +
      "files; restart resumes from the checkpointed offset") {
    val p = "/tmp/graft_cells_v2/stream"
    val ckpt = "/tmp/graft_cells_v2/stream_ckpt"
    val out = "/tmp/graft_cells_v2/stream_out"
    Seq(p, ckpt, out).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val corpus = IvfIndex.assignCells(emb.filter($"vec_id" % 3 === 0), cents)
    val b1 = IvfIndex.assignCells(emb.filter($"vec_id" % 3 === 1), cents)
    val b2 = IvfIndex.assignCells(emb.filter($"vec_id" % 3 === 2), cents)
    IvfIndex.writeCellLayout(corpus, p, K, cents.head.length)
    def start() = spark.readStream.format("graft.sources.CellsSource")
      .option("path", p).load()
      .select($"vec_id", $"cell".cast("long").as("cell"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() ==
        spark.read.parquet(p).count())
      assert(IvfIndex.appendCellsIdempotent(b1, p, 1L))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() ==
        IvfIndex.readLayout(spark, p).count())
    } finally q1.stop()
    // append while the stream is DOWN, then restart from the
    // checkpoint: b2 is delivered exactly once, no replay
    assert(IvfIndex.appendCellsIdempotent(b2, p, 2L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val sunk = spark.read.parquet(out)
        .select($"vec_id", $"cell").orderBy($"vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val layout = IvfIndex.readLayout(spark, p)
        .select($"vec_id", $"cell".cast("long")).orderBy($"vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(sunk == layout && sunk.nonEmpty,
        s"restart must deliver exactly the appended files: " +
          s"${sunk.size} sunk vs ${layout.size} in layout")
    } finally q2.stop()
  }
}
