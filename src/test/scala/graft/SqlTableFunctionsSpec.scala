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

  test("graft_semdedup / graft_phash_pairs / graft_fingerprint / " +
      "graft_dedup_surgery equal the library calls") {
    import graft.operators.{CandidatePairs, Fingerprints, IvfIndex,
      SemDedup, SuffixRanks}
    import graft.functions.{GraftFunctions => F}
    SqlTableFunctions.registerAll(spark)
    // semdedup over the embeddings fixture
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    emb.createOrReplaceTempView("tvf_emb")
    val cents = IvfIndex.learnCentroids(emb, 8, 3)
    same(
      spark.sql("SELECT * FROM graft_semdedup('tvf_emb', '8', '3', '0.4')"),
      SemDedup.dedup(emb, cents, 0.4))
    // the decision relation is total and its keep flag is meaningful
    val dec = spark.sql(
      "SELECT * FROM graft_semdedup('tvf_emb', '8', '3', '0.4')")
    assert(dec.count() == emb.count())
    assert(dec.filter($"keep" === 0L).count() > 0L,
      "fixture has near-dups at tau=0.4")
    // phash pairs over payloads (with a planted verbatim copy)
    val payloads = docs
      .unionAll(docs.limit(1).select($"doc_id" + 1000000L, $"text"))
      .select($"doc_id", $"text".as("payload"))
    payloads.createOrReplaceTempView("tvf_payloads")
    val hashes = payloads.select($"doc_id",
      F.ahash64($"payload".cast("binary")).as("h"))
      .filter($"h".isNotNull)
    val banded = hashes.select($"doc_id",
      posexplode(array((0 to 3).map(bb =>
        shiftrightunsigned($"h", bb * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band_no", "band_val")))
    val wantPairs = CandidatePairs
      .fromBuckets(banded, Seq("band_no", "band_val"), "doc_id",
        "doc_a", "doc_b")
      .join(hashes.select($"doc_id".as("doc_a"), $"h".as("ha")), Seq("doc_a"))
      .join(hashes.select($"doc_id".as("doc_b"), $"h".as("hb")), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        bit_count($"ha".bitwiseXOR($"hb")).cast("long").as("hamming"))
      .filter($"hamming" <= 3L)
    same(
      spark.sql("SELECT * FROM graft_phash_pairs('tvf_payloads', '3')"),
      wantPairs)
    // fingerprints over orders
    val orders = Tables.orders(spark, sf)
    orders.createOrReplaceTempView("tvf_orders")
    same(
      spark.sql("SELECT * FROM graft_fingerprint('tvf_orders', " +
        "'o_orderkey', '16', 'o_orderkey', 'o_custkey', 'o_orderstatus')"),
      Fingerprints.bucketFingerprints(orders, "o_orderkey",
        Seq($"o_orderkey", $"o_custkey", $"o_orderstatus"), 16))
    // dedup surgery over a small slice with a planted verbatim copy
    val surgBase = docs.filter($"doc_id" % 29 === 0)
    val planted = surgBase.limit(1)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("zq1 "), concat_ws(" ",
          slice(split($"text", " "), 1, 9)), lit(" zq2")).as("text"))
    val surg = surgBase.unionByName(planted)
    surg.createOrReplaceTempView("tvf_surgery")
    val tokens = surg
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("tok"))
    val runs = SuffixRanks.dupRuns(tokens, 8L)
    val kept = tokens.alias("t").join(runs.alias("r"),
      col("t.doc_id") === col("r.doc_id") &&
        $"pos" >= $"run_start" && $"pos" <= $"run_end", "left_anti")
    val wantSurg = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, tok))), " +
            "p -> p.tok)")).as("kept_text"))
      .join(surg.select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens")),
        Seq("doc_id"), "right_outer")
      .select($"doc_id", $"n_tokens",
        coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
        ($"n_tokens" - coalesce($"kept_tokens", lit(0L)))
          .as("removed_tokens"),
        coalesce($"kept_text", lit("")).as("kept_text"))
    val gotSurg = spark.sql(
      "SELECT * FROM graft_dedup_surgery('tvf_surgery', '8')")
    same(gotSurg, wantSurg)
    // the planted copy really removed tokens
    assert(gotSurg.filter($"removed_tokens" > 0L).count() > 0L)
  }

  test("graft_rank / graft_trustrank / graft_communities / " +
      "graft_triangles / graft_paths equal the library calls") {
    SqlTableFunctions.registerAll(spark)
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L),
      (3L, 4L, 5L), (4L, 1L, 1L), (4L, 2L, 2L), (5L, 6L, 1L),
      (6L, 5L, 4L)).toDF("src", "dst", "w")
    edges.createOrReplaceTempView("tvf_wedges")
    same(
      spark.sql(
        "SELECT * FROM graft_rank('tvf_wedges', 'src', 'dst', '5')"),
      graft.operators.PageRank.ranks(edges, "src", "dst", 5))
    // optional scale / damping reach the operator
    same(
      spark.sql("SELECT * FROM graft_rank('tvf_wedges', 'src', 'dst', " +
        "'5', '100000', '80', '100')"),
      graft.operators.PageRank.ranks(edges, "src", "dst", 5,
        scale = 100000L, dampNum = 80L, dampDen = 100L))
    same(
      spark.sql("SELECT * FROM graft_trustrank('tvf_wedges', 'src', " +
        "'dst', 'w', '2', '5')"),
      graft.operators.PageRank.ranksSeeded(edges, "src", "dst", "w",
        n => n % 2 === lit(0L), 5))
    same(
      spark.sql(
        "SELECT * FROM graft_communities('tvf_wedges', 'src', 'dst', '3')"),
      graft.operators.LabelPropagation.communities(edges, "src", "dst", 3))
    same(
      spark.sql("SELECT * FROM graft_triangles('tvf_wedges', 'src', 'dst')"),
      graft.operators.Triangles.triangles(edges, "src", "dst"))
    same(
      spark.sql("SELECT * FROM graft_paths('tvf_wedges', 'src', 'dst', " +
        "'w', '3', '4')"),
      graft.operators.MinPlusPaths.distances(edges, "src", "dst", "w",
        n => n % 3 === lit(0L), 4))
  }

  test("graft_hybrid_rrf / graft_interval_overlap / graft_funnel " +
      "equal the library spellings") {
    SqlTableFunctions.registerAll(spark)
    import org.apache.spark.sql.expressions.Window
    // two ranked views: lexical and semantic top lists per query
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 10L, 2L)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((1L, 11L, 1L), (1L, 13L, 2L), (2L, 10L, 1L),
      (2L, 21L, 2L)).toDF("query_id", "doc_id", "rank")
    lex.createOrReplaceTempView("tvf_lex")
    sem.createOrReplaceTempView("tvf_sem")
    val wFuse = Window.partitionBy($"query_id")
      .orderBy($"rrf_micro".desc, $"doc_id")
    val wantRrf = lex.select($"query_id", $"doc_id", $"rank".as("lex_rank"))
      .join(sem.select($"query_id", $"doc_id", $"rank".as("sem_rank")),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(floor(lit(1000000.0) / (lit(60L) + $"lex_rank")), lit(0L)) +
        coalesce(floor(lit(1000000.0) / (lit(60L) + $"sem_rank")), lit(0L)))
      .withColumn("rank", row_number().over(wFuse).cast("long"))
      .filter($"rank" <= 10)
      .select($"query_id", $"rank", $"doc_id", $"rrf_micro")
    same(
      spark.sql("SELECT * FROM graft_hybrid_rrf('tvf_lex', 'tvf_sem')"),
      wantRrf)
    // interval overlap: sessions × promo windows
    val left = Seq((1L, 0L, 10L), (2L, 5L, 8L), (3L, 20L, 25L))
      .toDF("l_id", "l_s", "l_e")
    val right = Seq((7L, 4L, 6L), (8L, 9L, 22L)).toDF("r_id", "r_s", "r_e")
    left.createOrReplaceTempView("tvf_left")
    right.createOrReplaceTempView("tvf_right")
    same(
      spark.sql("SELECT * FROM graft_interval_overlap('tvf_left', " +
        "'l_s', 'l_e', 'tvf_right', 'r_s', 'r_e', '8')"),
      graft.operators.IntervalJoin.overlapJoin(left, "l_s", "l_e",
        right, "r_s", "r_e", 8L))
    // funnel over the events fixture
    val events = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_type")
    events.createOrReplaceTempView("tvf_events")
    val stages = Seq("view", "click", "purchase")
    same(
      spark.sql("SELECT * FROM graft_funnel('tvf_events', 'user_id', " +
        "'ts', 'event_type', 'INTERVAL 7 DAYS', 'view', 'click', " +
        "'purchase')"),
      graft.operators.Funnel.windowFunnel(events, "user_id", "ts",
        "event_type", stages, "INTERVAL 7 DAYS"))
  }

  test("graft_acf and graft_spearman equal the SeriesStats library " +
      "calls over an arbitrary view") {
    import graft.operators.SeriesStats
    SqlTableFunctions.registerAll(spark)
    val daily = Tables.events(spark, sf)
      .select($"event_type",
        datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
          .cast("long").as("day"),
        floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("v"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"), sum($"v").as("y"))
    daily.createOrReplaceTempView("tvf_daily")
    same(
      spark.sql("SELECT * FROM graft_acf('tvf_daily', 'event_type', " +
        "'day', 'n', '7')"),
      SeriesStats.acf(daily, "event_type", "day", "n", 7))
    same(
      spark.sql("SELECT * FROM graft_spearman('tvf_daily', " +
        "'event_type', 'n', 'y')"),
      SeriesStats.spearman(daily, "event_type", "n", "y"))
    same(
      spark.sql("SELECT * FROM graft_ccf('tvf_daily', 'event_type', " +
        "'day', 'n', '3')"),
      SeriesStats.ccf(daily, "event_type", "day", "n", 3))
    same(
      spark.sql("SELECT * FROM graft_seasonal_strength('tvf_daily', " +
        "'event_type', 'day', 'n', '7', '3')"),
      SeriesStats.seasonalStrength(daily, "event_type", "day", "n", 7, 3))
  }

  test("graft_dp_counts equals Privacy.dpCounts; the seed argument " +
      "is required (a defaulted public seed would be zero privacy)") {
    import graft.operators.Privacy
    SqlTableFunctions.registerAll(spark)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
    docs.createOrReplaceTempView("tvf_dp_docs")
    same(
      spark.sql("SELECT * FROM graft_dp_counts('tvf_dp_docs', " +
        "'source', '0.5', 'secret:tvf:')"),
      Privacy.dpCounts(docs, "source", 0.5, "secret:tvf:"))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_dp_counts('tvf_dp_docs', " +
        "'source', '0.5')").collect())
  }

  test("graft_dp_sum / graft_dp_mean / the known-domain dp_counts " +
      "variant equal their Privacy operators") {
    import graft.operators.Privacy
    SqlTableFunctions.registerAll(spark)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    docs.createOrReplaceTempView("tvf_dp_docs2")
    (0 to 24).map(i => s"src$i").toDF("source")
      .createOrReplaceTempView("tvf_dp_domain")
    same(
      spark.sql("SELECT * FROM graft_dp_sum('tvf_dp_docs2', " +
        "'source', 'n_chars', '0.5', '400', 'secret:s:')"),
      Privacy.dpSum(docs, "source", "n_chars", 0.5, 400L, "secret:s:"))
    same(
      spark.sql("SELECT * FROM graft_dp_mean('tvf_dp_docs2', " +
        "'source', 'n_chars', '0.5', '400', 'secret:m:')"),
      Privacy.dpMean(docs, "source", "n_chars", 0.5, 400L,
        "secret:m:"))
    same(
      spark.sql("SELECT * FROM graft_dp_counts('tvf_dp_docs2', " +
        "'source', '0.5', 'secret:d:', 'tvf_dp_domain')"),
      Privacy.dpCounts(docs, "source", 0.5, "secret:d:",
        (0 to 24).map(i => s"src$i").toDF("source")))
    same(
      spark.sql("SELECT * FROM graft_dp_median('tvf_dp_docs2', " +
        "'source', 'n_chars', '600', 'secret:q:')"),
      Privacy.dpMedian(docs, "source", "n_chars", 600L, "secret:q:"))
    // the optional 6th arg releases under a general ε (the quantized
    // weight table)
    same(
      spark.sql("SELECT * FROM graft_dp_median('tvf_dp_docs2', " +
        "'source', 'n_chars', '600', 'secret:q:', '0.5')"),
      Privacy.dpMedian(docs, "source", "n_chars", 600L, 0.5,
        "secret:q:"))
    // arbitrary rational quantile (first quartile)
    same(
      spark.sql("SELECT * FROM graft_dp_quantile('tvf_dp_docs2', " +
        "'source', 'n_chars', '600', '1', '4', '0.5', 'secret:u:')"),
      Privacy.dpQuantile(docs, "source", "n_chars", 600L, 1, 4, 0.5,
        "secret:u:"))
  }

  test("graft_dp_topk and graft_dp_crosstab equal their Privacy " +
      "operators (the SQL face of the M24/M25 releases)") {
    import graft.operators.Privacy
    SqlTableFunctions.registerAll(spark)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars")
    docs.createOrReplaceTempView("tvf_dp_docs3")
    (0 to 24).map(i => s"src$i").toDF("source")
      .createOrReplaceTempView("tvf_dp_domain3")
    same(
      spark.sql("SELECT * FROM graft_dp_topk('tvf_dp_docs3', " +
        "'source', '0.5', 'secret:t:', 'tvf_dp_domain3', '5')"),
      Privacy.dpTopK(docs, "source", 0.5, "secret:t:",
        (0 to 24).map(i => s"src$i").toDF("source"), 5))
    val cells = docs.select($"source",
      expr("n_chars DIV 100").as("len_bucket"))
    cells.createOrReplaceTempView("tvf_dp_cells")
    val dom2 = (for { i <- 0 to 24; b <- 0L to 3L }
      yield (s"src$i", b)).toDF("source", "len_bucket")
    dom2.createOrReplaceTempView("tvf_dp_dom2")
    same(
      spark.sql("SELECT * FROM graft_dp_crosstab('tvf_dp_cells', " +
        "'source', 'len_bucket', '0.5', 'secret:x:', 'tvf_dp_dom2')"),
      Privacy.dpCrosstab(cells, "source", "len_bucket", 0.5,
        "secret:x:", dom2))
  }

  test("graft_ann equals the DataFrame IVF probe over a written cell " +
      "layout (the written-artifact case); alien centroid views are " +
      "refused") {
    import graft.operators.IvfIndex
    import org.apache.spark.sql.expressions.Window
    SqlTableFunctions.registerAll(spark)
    val K = 8
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = IvfIndex.learnCentroids(emb, K, 1)
    val p = "/tmp/graft_tvf_ann/layout"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    IvfIndex.writeCellLayout(IvfIndex.assignCells(emb, cents), p,
      K, cents.head.length)
    cents.zipWithIndex
      .map { case (c, i) => (i.toLong + 1L, c.toSeq) }.toSeq
      .toDF("cell_id", "c").createOrReplaceTempView("tvf_cents")
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v")
    probes.createOrReplaceTempView("tvf_probes")
    // the identical DataFrame spelling: nprobe best cells by the
    // placement score, exact q6 cosine top-k within them
    val wCell = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"cid0")
    val probeCells = probes
      .select($"query_id", $"v".as("pv"),
        posexplode(IvfIndex.scoresCol($"v", cents))
          .as(Seq("cid0", "score")))
      .withColumn("cell", ($"cid0" + 1).cast("long"))
      .withColumn("cr", row_number().over(wCell))
      .filter($"cr" <= 2)
      .select($"query_id", $"pv", $"cell")
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("double") /
        lit(1000000.0)
    val dot = graft.functions.GraftFunctions.dotd _
    val wTop = Window.partitionBy($"query_id")
      .orderBy($"cos_sim".desc, $"vec_id")
    val expected = spark.read.format("graft.sources.CellsSource")
      .option("path", p).load()
      .select($"vec_id", $"v".cast("array<double>").as("v"),
        $"cell".cast("long").as("cell"))
      .join(broadcast(probeCells), Seq("cell"))
      .select($"query_id", $"vec_id",
        q6(dot($"v", $"pv") /
          (sqrt(dot($"v", $"v")) * sqrt(dot($"pv", $"pv"))))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter($"rn" <= 5)
      .select($"query_id", $"rn", $"vec_id".as("neighbor_id"),
        $"cos_sim")
    same(
      spark.sql(s"SELECT * FROM graft_ann('$p', 'tvf_cents', " +
        "'tvf_probes', '2', '5')"),
      expected)
    // a centroid view whose geometry does not match the stamp is
    // refused (probing with alien centroids searches wrong cells)
    cents.take(4).zipWithIndex
      .map { case (c, i) => (i.toLong + 1L, c.toSeq) }.toSeq
      .toDF("cell_id", "c").createOrReplaceTempView("tvf_cents_bad")
    intercept[Exception](
      spark.sql(s"SELECT * FROM graft_ann('$p', 'tvf_cents_bad', " +
        "'tvf_probes', '2', '5')"))
  }

  test("malformed TVF calls fail loudly") {
    SqlTableFunctions.registerAll(spark)
    docs.createOrReplaceTempView("tvf_docs")
    intercept[Exception](
      spark.sql("SELECT * FROM graft_chunk('tvf_docs')"))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_minhash_pairs('tvf_docs', 0.5)"))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_trustrank('tvf_docs', 'a', 'b', " +
        "'w', '0', '3')"))
  }
}
