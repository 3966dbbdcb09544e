package graft

import graft.operators.{Chunking, InvertedIndex, SqlTableFunctions}
import org.apache.spark.sql.functions._

/** The SQL TVF surface must plan the SAME machinery as the library
  * calls — parity row-for-row, no SQL-path reimplementation. */
class SqlTableFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def same(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0, "parity on an empty result proves nothing")
  }

  test("graft_chunk equals Chunking.chunkDocs") {
    SqlTableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_chunk('tvf_docs', '64', '16')"),
      Chunking.chunkDocs(docs, 64, 16))
    // optional min_tokens argument
    same(
      spark.sql("SELECT * FROM graft_chunk('tvf_docs', '64', '16', '8')"),
      Chunking.chunkDocs(docs, 64, 16, minTokens = 8))
  }

  test("graft_minhash_pairs equals minhashNearDupPairs") {
    SqlTableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_minhash_pairs('tvf_docs', '0.5')"),
      graft.queries.Pipeline.minhashNearDupPairs(docs, 0.5))
  }

  test("graft_bm25 equals InvertedIndex.bm25 over a written index") {
    SqlTableFunctions.registerAll(spark)
    val root = "/tmp/graft_tvf_index/postings"
    val nb = 8
    InvertedIndex.writeTermLayout(
      InvertedIndex.buildPostings(docs, nb),
      docs.select(size(split($"text", " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")),
      root)
    val queries = Seq((1L, "data"), (1L, "model"), (2L, "training"))
    queries.toDF("query_id", "term").createOrReplaceTempView("tvf_queries")
    same(
      spark.sql(
        s"SELECT * FROM graft_bm25('$root', 'tvf_queries', '$nb', '10')"),
      InvertedIndex.bm25(spark, root, queries, nb, k = 10))
  }

  test("graft_setsim equals SetSimJoin.selfJoin") {
    SqlTableFunctions.registerAll(spark)
    docs.select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
      .createOrReplaceTempView("tvf_sets")
    same(
      spark.sql("SELECT * FROM graft_setsim('tvf_sets', 'doc_id', 'toks', '1', '2')"),
      graft.operators.SetSimJoin.selfJoin(
        spark.table("tvf_sets"), "doc_id", "toks", 1, 2))
  }

  test("graft_neardup_dedup / graft_pack / graft_budget_select " +
      "equal the library calls") {
    SqlTableFunctions.registerAll(spark)
    val full = Tables.documents(spark, sf)
    full.createOrReplaceTempView("tvf_docs_full")
    val pairs = graft.queries.Pipeline.minhashNearDupPairs(docs, 0.5)
    val dupes = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .filter($"node" =!= $"component").select($"node".as("doc_id"))
    same(
      spark.sql("SELECT * FROM graft_neardup_dedup('tvf_docs_full', '0.5')"),
      full.join(dupes, Seq("doc_id"), "left_anti"))

    val chunks = Chunking.chunkDocs(docs, 16, 4)
    chunks.createOrReplaceTempView("tvf_chunks_v")
    same(
      spark.sql("SELECT * FROM graft_pack('tvf_chunks_v', '64', '8')"),
      graft.operators.Packing.packChunks(
        chunks.select($"doc_id", $"chunk_id", $"n_tokens"), 64, 8))

    val scored = docs.select($"doc_id",
      (length($"text") % 64).cast("double").as("score"),
      size(split($"text", " ")).cast("long").as("nt"))
    scored.createOrReplaceTempView("tvf_scored")
    same(
      spark.sql("SELECT * FROM graft_budget_select(" +
        "'tvf_scored', 'doc_id', 'score', 'nt', '5000')"),
      graft.operators.BudgetSelect.select(
        scored, "doc_id", "score", "nt", 5000L))
    same(
      spark.sql("SELECT * FROM graft_budget_select(" +
        "'tvf_scored', 'doc_id', 'score', 'nt', '2', '5')"),
      graft.operators.BudgetSelect.selectFraction(
        scored, "doc_id", "score", "nt", 2, 5))
  }

  test("graft_skyline / graft_kcore / graft_hops equal the library calls") {
    SqlTableFunctions.registerAll(spark)
    Tables.part(spark, sf).select($"p_partkey", $"p_retailprice", $"p_size")
      .createOrReplaceTempView("tvf_parts")
    same(
      spark.sql(
        "SELECT * FROM graft_skyline('tvf_parts', 'p_retailprice', 'p_size')"),
      graft.operators.Skyline.frontier2d(
        Tables.part(spark, sf)
          .select($"p_partkey", $"p_retailprice", $"p_size"),
        "p_retailprice", "p_size"))
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L),
      (5L, 6L)).toDF("a", "b")
    edges.createOrReplaceTempView("tvf_edges")
    same(
      spark.sql("SELECT * FROM graft_kcore('tvf_edges', 'a', 'b', '2', '3')"),
      graft.operators.KCore.core(edges, "a", "b", 2L, 3))
    same(
      spark.sql("SELECT * FROM graft_hops('tvf_edges', 'a', 'b', '2', '2')"),
      graft.operators.HopLevels.levels(edges, "a", "b",
        n => n % 2 === lit(0L), 2))
    same(
      spark.sql("SELECT * FROM graft_scc('tvf_edges', 'a', 'b')"),
      graft.operators.Scc.components(edges, "a", "b"))
    // optional round caps reach the operator (and don't change results)
    same(
      spark.sql("SELECT * FROM graft_scc('tvf_edges', 'a', 'b', '7', '9')"),
      graft.operators.Scc.components(edges, "a", "b",
        maxOuter = 7, maxProp = 9))
  }

  test("malformed TVF calls fail loudly") {
    SqlTableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_docs")
    intercept[Exception](
      spark.sql("SELECT * FROM graft_chunk('tvf_docs')"))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_minhash_pairs('tvf_docs', 0.5)"))
  }
}
