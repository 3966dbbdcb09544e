package graft

import graft.operators.{BandIndex, InvertedIndex, IvfIndex}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.functions._

/** The TableCatalog plugin ([[graft.sources.GraftCatalog]]):
  * `SELECT ... FROM <cat>.<ns>.<layout>` must resolve — by the
  * layout's own geometry stamp — to the identical connector table the
  * format/load spelling builds, pushdown intact; stamp-less
  * directories and DDL are refused. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private val NB = 16
  private val root = "/tmp/graft_catalog_spec"
  private val Cat = "graftcat"

  private lazy val ready: Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val stats = docs
      .select(size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(docs, NB), stats,
      s"$root/search/terms", nBuckets = NB)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(docs, 0.8, NB), s"$root/search/bands",
      0.8, NB)
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, 8, 1)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(emb, cents),
      s"$root/ann/cells", 8, cents.head.length)
    // a stamp-less directory: parquet, but NOT a registered layout
    docs.limit(3).write.mode("overwrite")
      .parquet(s"$root/search/junk")
    spark.conf.set(s"spark.sql.catalog.$Cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$Cat.root", root)
  }

  test("SELECT through the catalog equals the format/load spelling " +
      "for all three layout types, with pushdown intact") {
    ready
    // postings: content parity + pushed term filter prunes the scan
    val viaCat = spark.sql(
      s"SELECT * FROM $Cat.search.terms WHERE term = 'spark'")
    val viaLoad = spark.read.format("graft.sources.PostingsSource")
      .option("path", s"$root/search/terms").load()
      .filter($"term" === "spark")
    assert(viaCat.collect().map(_.toSeq).toSet ==
      viaLoad.collect().map(_.toSeq).toSet)
    val plan = viaCat.queryExecution.executedPlan.toString
    assert(plan.contains("GraftPostingsScan") &&
      plan.contains("term"), plan.take(800))
    // bands: geometry comes from the stamp, content parity
    assert(spark.table(s"$Cat.search.bands")
      .collect().map(_.toSeq).toSet ==
      spark.read.format("graft.sources.BandsSource")
        .option("path", s"$root/search/bands").load()
        .collect().map(_.toSeq).toSet)
    // cells: content parity + cell pushdown through the catalog
    val cellsCat = spark.sql(
      s"SELECT vec_id FROM $Cat.ann.cells WHERE cell = 3")
    val cellsLoad = spark.read.format("graft.sources.CellsSource")
      .option("path", s"$root/ann/cells").load()
      .filter($"cell" === 3L).select($"vec_id")
    assert(cellsCat.collect().map(_.getLong(0)).toSet ==
      cellsLoad.collect().map(_.getLong(0)).toSet)
    assert(cellsCat.queryExecution.executedPlan.toString
      .contains("cells={3}"),
      cellsCat.queryExecution.executedPlan.toString.take(800))
  }

  test("listTables lists only stamped layouts; namespaces are the " +
      "non-layout directories; a stamp-less directory is not a table") {
    ready
    val cat = spark.sessionState.catalogManager.catalog(Cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    assert(cat.listTables(Array("search")).map(_.name()).toSeq ==
      Seq("bands", "terms"))
    assert(cat.listTables(Array("ann")).map(_.name()).toSeq ==
      Seq("cells"))
    assert(cat.listNamespaces().map(_.toSeq).toSet ==
      Set(Seq("ann"), Seq("search")))
    intercept[org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException](
      cat.loadTable(Identifier.of(Array("search"), "junk")))
    intercept[org.apache.spark.sql.AnalysisException](
      spark.table(s"$Cat.search.junk").collect())
  }

  test("a micro-batch STREAM resolves through the catalog too: " +
      "readStream.table(<cat>.ns.layout) tails the layout's appends " +
      "exactly like the format spelling") {
    ready
    import graft.operators.IvfIndex
    val ckpt = "/tmp/graft_catalog_spec_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.table(s"$Cat.ann.cells")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame,
          id: java.lang.Long) =>
        seen.synchronized { seen += ((id.longValue, df.count())) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // the first trigger delivered the whole base, through the catalog
    val total = spark.read.format("graft.sources.CellsSource")
      .option("path", s"$root/ann/cells").load().count()
    assert(seen.map(_._2).sum == total && total > 0,
      seen.toString)
  }

  test("the stamp dispatch parses the exact key set: extra/unknown " +
      "keys still route correctly, an ambiguous stamp is refused " +
      "loudly — never silently misrouted") {
    ready
    val cat = spark.sessionState.catalogManager.catalog(Cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    def craft(name: String, json: String): Unit = {
      val d = new java.io.File(s"$root/search/$name")
      d.mkdirs()
      val w = new java.io.PrintWriter(
        new java.io.File(d, "_graft_meta.json"))
      try w.print(json) finally w.close()
    }
    // a postings stamp with extra keys (a future writer adding
    // provenance fields) still routes to the term layout
    craft("crafted_terms", """{"nBuckets": 16, "note": "prov", "v": 2}""")
    assert(cat.loadTable(Identifier.of(Array("search"), "crafted_terms"))
      .name().contains("graft_postings"))
    // a band stamp that ALSO grew a k-named field must not silently
    // become a cell layout: k without dim is not the cells key set
    craft("crafted_bands", """{"tau": 0.8, "nBuckets": 16, "k": 3}""")
    assert(cat.loadTable(Identifier.of(Array("search"), "crafted_bands"))
      .name().contains("graft_bands"))
    // genuinely ambiguous (full cells AND bands key sets): refused
    craft("crafted_ambig",
      """{"k": 8, "dim": 64, "tau": 0.8, "nBuckets": 16}""")
    val e = intercept[IllegalArgumentException](
      cat.loadTable(Identifier.of(Array("search"), "crafted_ambig")))
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
    // unparseable JSON: loud, not NoSuchTable
    craft("crafted_bad", """{"nBuckets": """)
    intercept[IllegalArgumentException](
      cat.loadTable(Identifier.of(Array("search"), "crafted_bad")))
    // none of the known key sets: not a table
    craft("crafted_alien", """{"quux": 1}""")
    intercept[org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException](
      cat.loadTable(Identifier.of(Array("search"), "crafted_alien")))
  }

  test("INSERT INTO through the catalog appends via the connector " +
      "write builder; a mis-bucketed SQL insert is refused and " +
      "leaves the layout untouched") {
    val wroot = "/tmp/graft_catalog_spec_w"
    val wcat = "graftcatw"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wroot))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val half = docs.filter($"doc_id" % 2 === 0)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(half, 0.8, NB), s"$wroot/search/bands",
      0.8, NB)
    spark.conf.set(s"spark.sql.catalog.$wcat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$wcat.root", wroot)
    BandIndex.buildBands(docs.filter($"doc_id" % 2 === 1), 0.8, NB)
      .createOrReplaceTempView("cat_ins_rows")
    spark.sql(s"INSERT INTO $wcat.search.bands " +
      "SELECT doc_id, CAST(band_no AS INT), band_hash, " +
      "CAST(bucket AS BIGINT) FROM cat_ins_rows")
    // parity: the SQL-ingested layout equals a full rebuild
    val got = BandIndex.readLayout(spark, s"$wroot/search/bands")
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet
    val want = BandIndex.buildBands(docs, 0.8, NB)
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // and the catalog read sees it with pushdown intact
    assert(spark.table(s"$wcat.search.bands").count() == want.size)
    // a mis-bucketed row is refused AT THE CONNECTOR BOUNDARY through
    // SQL too (a silently mis-bucketed band row vanishes from every
    // pruned probe), and the failed job leaves no partial append
    val before = got
    intercept[Exception](spark.sql(
      s"INSERT INTO $wcat.search.bands VALUES " +
        s"(1, 0, 5, ${(5L % NB) + 1L})"))
    assert(BandIndex.readLayout(spark, s"$wroot/search/bands")
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet == before,
      "a refused INSERT must leave the layout untouched")
  }

  test("writeStream.toTable commits through the native " +
      "STREAMING_WRITE lane (epoch = TxBatch batch id); a " +
      "re-delivered epoch is a no-op") {
    val wroot = "/tmp/graft_catalog_spec_ws"
    val wcat = "graftcatws"
    val ckpt = s"$wroot/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wroot))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val half = docs.filter($"doc_id" % 2 === 0)
    BandIndex.writeBandLayout(
      BandIndex.buildBands(half, 0.8, NB), s"$wroot/search/bands",
      0.8, NB)
    spark.conf.set(s"spark.sql.catalog.$wcat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$wcat.root", wroot)
    val rows = BandIndex.buildBands(
      docs.filter($"doc_id" % 2 === 1), 0.8, NB)
      .select($"doc_id", $"band_no".cast("int").as("band_no"),
        $"band_hash", $"bucket".cast("long").as("bucket"))
      .as[BandRow].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BandRow]
    input.addData(rows)
    def start() = input.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .toTable(s"$wcat.search.bands")
    val q = start()
    try q.processAllAvailable() finally q.stop()
    def content() = BandIndex.readLayout(spark, s"$wroot/search/bands")
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet
    val want = BandIndex.buildBands(docs, 0.8, NB)
      .select($"doc_id", $"band_no", $"band_hash")
      .collect().map(_.toSeq).toSet
    assert(content() == want && want.nonEmpty)
    // the epoch landed as the TxBatch unit its id names
    assert(new java.io.File(s"$wroot/search/bands").listFiles()
      .exists(_.getName.startsWith("_batch-")))
    // re-delivery: drop the stream's last commit marker, restart —
    // the replayed epoch finds its _batch-<id> and no-ops
    val commits = new java.io.File(s"$ckpt/commits")
    val last = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(new java.io.File(commits, last.toString).delete())
    new java.io.File(commits, s".$last.crc").delete()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(content() == want,
      s"re-delivered epoch $last must be a no-op")
  }

  test("DDL through the catalog is refused (read-focused), and a " +
      "stamped-vs-option geometry mismatch is refused at open time") {
    ready
    intercept[UnsupportedOperationException](
      spark.sessionState.catalogManager.catalog(Cat)
        .asInstanceOf[graft.sources.GraftCatalog]
        .dropTable(Identifier.of(Array("search"), "terms")))
    // the postings stamp also binds the format/load spelling now
    intercept[IllegalArgumentException](
      spark.read.format("graft.sources.PostingsSource")
        .option("path", s"$root/search/terms")
        .option("nBuckets", "8").load())
  }

  test("TBLPROPERTIES answer the operational questions for all three " +
      "layout types: geometry stamp, base generation, live-batch " +
      "fan-in, and (cells, after a relearn) the centroid version — " +
      "live per call, not frozen at table resolution") {
    ready
    val cat = spark.sessionState.catalogManager.catalog(Cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    def props(ns: String, t: String): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      cat.loadTable(Identifier.of(Array(ns), t)).properties()
        .asScala.toMap
    }
    val terms = props("search", "terms")
    assert(terms("graft.layout_type") == "postings" &&
      terms("graft.nBuckets") == NB.toString &&
      terms("graft.base_generation") == "0" &&
      terms("graft.live_batches") == "0", terms.toString)
    val bands = props("search", "bands")
    assert(bands("graft.layout_type") == "bands" &&
      bands("graft.tau") == "0.8" &&
      bands("graft.nBuckets") == NB.toString &&
      bands("graft.base_generation") == "0" &&
      bands("graft.live_batches") == "0", bands.toString)
    val cells0 = props("ann", "cells")
    assert(cells0("graft.layout_type") == "cells" &&
      cells0("graft.k") == "8" &&
      cells0("graft.base_generation") == "0" &&
      cells0("graft.live_batches") == "0", cells0.toString)
    // DESCRIBE EXTENDED surfaces the map through plain SQL
    val desc = spark.sql(s"DESCRIBE EXTENDED $Cat.ann.cells")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .mkString("\n")
    assert(desc.contains("graft.layout_type") &&
      desc.contains("cells"), desc)
    // the map is LIVE: an append raises live_batches on the SAME
    // resolved table; a compact folds it into a new base generation
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, 8, 1)
    val table = cat.loadTable(Identifier.of(Array("ann"), "cells"))
    assert(IvfIndex.appendCellsIdempotent(
      IvfIndex.assignCells(emb.filter($"vec_id" % 13 === 0)
        .select(($"vec_id" + 5000000L).as("vec_id"), $"v"), cents),
      s"$root/ann/cells", 1L))
    import scala.jdk.CollectionConverters._
    val afterAppend = table.properties().asScala.toMap
    assert(afterAppend("graft.live_batches") == "1" &&
      afterAppend("graft.base_generation") == "0", afterAppend.toString)
    assert(IvfIndex.compact(spark, s"$root/ann/cells"))
    val afterFold = table.properties().asScala.toMap
    assert(afterFold("graft.live_batches") == "0" &&
      afterFold("graft.base_generation") == "1", afterFold.toString)
    // a relearn stamps the centroid version the probes must match
    IvfIndex.relearn(spark, s"$root/ann/cells", iters = 1)
    val afterRelearn = props("ann", "cells")
    assert(afterRelearn.get("graft.centroid_version") ==
      IvfIndex.readCentroidVersion(spark, s"$root/ann/cells"),
      afterRelearn.toString)
    assert(afterRelearn("graft.base_generation") == "2",
      afterRelearn.toString)
    // namespace metadata answers the same questions one level up
    import scala.jdk.CollectionConverters._
    val nsMeta = cat.loadNamespaceMetadata(Array("ann")).asScala
    // the ann namespace holds exactly the cells layout (search gains
    // crafted fixtures from other tests, so it is not a stable pin)
    assert(nsMeta("graft.tables") == "1" &&
      nsMeta("graft.namespaces") == "0" &&
      nsMeta("graft.path").endsWith("/ann"), nsMeta.toString)
  }
}
