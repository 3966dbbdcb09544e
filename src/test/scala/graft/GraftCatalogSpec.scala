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
}
