package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.{Bridge => B}
import org.apache.spark.sql.types.StringType

/** SQL table-valued surface for the curation operators — the
  * `graft_asof` pattern ([[AsOfJoin.registerSqlTableFunction]])
  * generalized: each operator registers as a temp table function whose
  * STRING-LITERAL arguments name views and parameters, so the whole
  * pipeline is drivable from pure `spark.sql(...)` text (BI tools,
  * notebooks, SQL-only jobs) while planning the exact same DataFrame
  * machinery — same skew guards, same shuffle shapes, nothing
  * re-implemented on the SQL path. SqlTableFunctionsSpec pins parity
  * row-for-row against the library calls.
  */
object SqlTableFunctions {

  /** Register every graft TVF (idempotent; temp-function scope):
    *
    *  - `graft_asof(...)` — see [[AsOfJoin.registerSqlTableFunction]]
    *  - `graft_chunk(docs_view, max_tokens, overlap[, min_tokens])` —
    *    [[Chunking.chunkDocs]] over a (doc_id, text) view
    *  - `graft_minhash_pairs(docs_view, tau)` —
    *    [[graft.queries.Pipeline.minhashNearDupPairs]]: exact word-
    *    3-gram Jaccard ≥ tau pairs, LSH-banded from tau
    *  - `graft_bm25(index_path, queries_view, n_buckets, k)` —
    *    [[InvertedIndex.bm25]] top-k per query over a written index;
    *    the (query_id, term) view is collected at plan time (query
    *    sets are bounded by construction — they are the SMALL side)
    *  - `graft_skyline(view, cost_col, gain_col)` —
    *    [[Skyline.frontier2d]]: the 2-D Pareto frontier of any view
    *  - `graft_kcore(edges_view, a_col, b_col, k, rounds)` —
    *    [[KCore.core]]: fixed-round synchronous k-core peel
    *  - `graft_hops(edges_view, a_col, b_col, seed_mod, rounds)` —
    *    [[HopLevels.levels]]: BFS hop distance from the seed set
    *    {node : node ≡ 0 (mod seed_mod)}
    *  - `graft_setsim(sets_view, id_col, set_col, tau_num, tau_den)` —
    *    [[SetSimJoin.selfJoin]]: every pair with exact Jaccard ≥
    *    tau_num/tau_den over a (id, element-array) view
    *  - `graft_scc(edges_view, src_col, dst_col[, max_outer[,
    *    max_prop]])` — [[Scc.components]]: strongly connected
    *    components of a directed edge view, labels = min member id
    *  - `graft_neardup_dedup(docs_view, tau)` — the curation product
    *    itself from SQL: LSH pairs at Jaccard ≥ tau → cluster
    *    closure → drop non-canonical members; returns the view's
    *    rows minus near-duplicates
    *  - `graft_pack(chunks_view, budget[, n_buckets[, salt]])` —
    *    [[Packing.packChunks]] offset sequence packing over a
    *    (doc_id, chunk_id, n_tokens) view
    *  - `graft_budget_select(view, id_col, score_col, value_col,
    *    num[, den])` — [[BudgetSelect.select]] at absolute budget
    *    `num`, or [[BudgetSelect.selectFraction]] at `num/den` of
    *    the total when `den` is given
    *  - `graft_semdedup(emb_view, k, iters, tau[, bucket_cap])` —
    *    [[SemDedup.dedup]] over a (vec_id, v) view: learn k centroids
    *    (Lloyd, `iters` rounds), keep/drop decision per vector at
    *    within-cell cosine ≥ tau
    *  - `graft_phash_pairs(docs_view, max_hamming)` — the perceptual-
    *    hash near-dup pair relation over a (doc_id, payload BINARY)
    *    view: aHash64 → 4×16-bit pigeonhole bands →
    *    [[CandidatePairs]] → exact bit_count verify
    *  - `graft_fingerprint(view, key_col, n_buckets, col1[, ...col9])`
    *    — [[Fingerprints.bucketFingerprints]]: per-bucket Merkle-style
    *    content fingerprints over the named columns
    *  - `graft_dedup_surgery(docs_view, min_len)` — the L101 scrub
    *    over any (doc_id, text) view: [[SuffixRanks.dupRuns]] regions
    *    ≥ min_len stripped from every doc, survivors reassembled
    *  - `graft_rank(edges_view, src_col, dst_col, iterations[, scale[,
    *    damp_num, damp_den]])` — [[PageRank.ranks]]: integer-exact
    *    PageRank over a directed edge view
    *  - `graft_trustrank(edges_view, src_col, dst_col, w_col,
    *    seed_mod, iterations)` — [[PageRank.ranksSeeded]]: weighted
    *    seed-personalized rank, trusted seeds = {node ≡ 0 (mod
    *    seed_mod)}
    *  - `graft_communities(edges_view, a_col, b_col, rounds)` —
    *    [[LabelPropagation.communities]]: synchronous LPA,
    *    smallest-label tiebreak
    *  - `graft_triangles(edges_view, a_col, b_col)` —
    *    [[Triangles.triangles]]: ordered-wedge triangle enumeration
    *  - `graft_paths(edges_view, a_col, b_col, cost_col, seed_mod,
    *    rounds)` — [[MinPlusPaths.distances]]: min-plus shortest
    *    distances from the seed set {node ≡ 0 (mod seed_mod)}
    *  - `graft_hybrid_rrf(lex_view, sem_view[, rrf_k[, top_n]])` —
    *    reciprocal-rank fusion of two (query_id, doc_id, rank) views,
    *    the `hybrid_rrf` spelling (integer micro-units, full-outer
    *    merge)
    *  - `graft_interval_overlap(left_view, l_start, l_end, right_view,
    *    r_start, r_end, width)` — [[IntervalJoin.overlapJoin]]: the
    *    binned interval-overlap equi-join (column names must be
    *    disjoint across the two views, the operator's contract)
    *  - `graft_funnel(events_view, entity_col, time_col, type_col,
    *    window, stage1[, stage2...])` — [[Funnel.windowFunnel]]:
    *    ordered in-window stage progression counts
    *  - `graft_acf(view, part_col, day_col, n_col, max_lag)` —
    *    [[SeriesStats.acf]]: lag-1..max_lag autocorrelation of an
    *    integer series per group (exact-long deviations, q6 r)
    *  - `graft_ccf(view, id_col, day_col, n_col, max_lag)` —
    *    [[SeriesStats.ccf]]: pairwise lead-lag cross-correlation
    *    between a relation's groups at lags −max_lag..max_lag
    *  - `graft_spearman(view, part_col, x_col, y_col)` —
    *    [[SeriesStats.spearman]]: Spearman ρ per group with textbook
    *    mid-rank ties (doubled-rank exact integers, q6 ρ)
    *  - `graft_seasonal_strength(view, part_col, day_col, n_col,
    *    period[, phase_offset])` — [[SeriesStats.seasonalStrength]]:
    *    Hyndman F_s of a period-cycle per group
    *  - `graft_dp_counts(view, key_col, epsilon, seed[, domain_view])`
    *    — [[Privacy.dpCounts]]: DP released group counts
    *    (deterministic keyed-draw Laplace — release-once semantics;
    *    the seed is required and must be a caller-kept secret); with
    *    a one-column public `domain_view`, the known-domain release
    *    (absent groups publish pure noise — no presence leak)
    *  - `graft_dp_sum(view, key_col, value_col, epsilon, clip, seed)`
    *    — [[Privacy.dpSum]]: clipped-contribution DP sums
    *  - `graft_dp_mean(view, key_col, value_col, epsilon, clip,
    *    seed)` — [[Privacy.dpMean]]: the ε/2 + ε/2 count+sum pair,
    *    q6 quotient of the noised halves
    *  - `graft_dp_median(view, key_col, value_col, grid_max, seed)` —
    *    [[Privacy.dpMedian]]: the exponential mechanism over the
    *    public [0, grid_max] grid at ε = 2·ln 2 (exact power-of-two
    *    weights — no transcendental)
    *  - `graft_ann(layout_path, cents_view, probes_view, nprobe, k)` —
    *    IVF ANN over a persisted [[IvfIndex.writeCellLayout]] corpus
    *    from SQL: per probe in the (query_id, v) view, the nprobe
    *    best cells by the [[IvfIndex.scoresCol]] placement score, then
    *    exact q6 cosine top-k within them. Centroids come from a
    *    (cell_id, c) view collected at plan time (k·dim doubles — the
    *    graft_bm25 bounded-small-side rule) and must match the
    *    layout's stamped (k, dim) geometry; the cell IN-prune reaches
    *    the connector scan through the broadcast probe join (runtime
    *    narrowing), so a probe touches nprobe/k of the corpus
    */
  def registerAll(spark: SparkSession): Unit = {
    AsOfJoin.registerSqlTableFunction(spark)
    register(spark, "graft_chunk", 3, 4) { args =>
      val docs = spark.table(args(0))
      val minTokens = args.lift(3).map(_.toInt).getOrElse(1)
      Chunking.chunkDocs(docs, args(1).toInt, args(2).toInt, minTokens)
    }
    register(spark, "graft_minhash_pairs", 2, 2) { args =>
      graft.queries.Pipeline.minhashNearDupPairs(
        spark.table(args(0)), args(1).toDouble)
    }
    register(spark, "graft_bm25", 4, 4) { args =>
      val queries = spark.table(args(1))
        .select("query_id", "term").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      InvertedIndex.bm25(spark, args(0), queries,
        args(2).toInt, args(3).toInt)
    }
    register(spark, "graft_skyline", 3, 3) { args =>
      Skyline.frontier2d(spark.table(args(0)), args(1), args(2))
    }
    register(spark, "graft_kcore", 5, 5) { args =>
      KCore.core(spark.table(args(0)), args(1), args(2),
        args(3).toLong, args(4).toInt)
    }
    register(spark, "graft_hops", 5, 5) { args =>
      val m = args(3).toLong
      require(m >= 1L, s"graft_hops seed_mod must be >= 1, got $m")
      HopLevels.levels(spark.table(args(0)), args(1), args(2),
        n => n % m === org.apache.spark.sql.functions.lit(0L),
        args(4).toInt)
    }
    register(spark, "graft_setsim", 5, 5) { args =>
      SetSimJoin.selfJoin(spark.table(args(0)), args(1), args(2),
        args(3).toInt, args(4).toInt)
    }
    register(spark, "graft_scc", 3, 5) { args =>
      Scc.components(spark.table(args(0)), args(1), args(2),
        maxOuter = args.lift(3).map(_.toInt).getOrElse(100),
        maxProp = args.lift(4).map(_.toInt).getOrElse(40))
    }
    register(spark, "graft_neardup_dedup", 2, 2) { args =>
      import org.apache.spark.sql.functions.col
      val docs = spark.table(args(0))
      val pairs = graft.queries.Pipeline.minhashNearDupPairs(
        docs.select(col("doc_id"), col("text")), args(1).toDouble)
      val dupes = ConnectedComponents.components(pairs, "doc_a", "doc_b")
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      docs.join(dupes, Seq("doc_id"), "left_anti")
    }
    register(spark, "graft_pack", 2, 4) { args =>
      import org.apache.spark.sql.functions.col
      Packing.packChunks(
        spark.table(args(0))
          .select(col("doc_id"), col("chunk_id"), col("n_tokens")),
        args(1).toInt,
        args.lift(2).map(_.toInt).getOrElse(64),
        args.lift(3).getOrElse("pack:v1:"))
    }
    register(spark, "graft_budget_select", 5, 6) { args =>
      val df = spark.table(args(0))
      args.lift(5) match {
        case Some(den) => BudgetSelect.selectFraction(df, args(1),
          args(2), args(3), args(4).toLong, den.toLong)
        case None => BudgetSelect.select(df, args(1), args(2), args(3),
          args(4).toLong)
      }
    }
    register(spark, "graft_semdedup", 4, 5) { args =>
      import org.apache.spark.sql.functions.col
      val emb = spark.table(args(0))
        .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      val cents = IvfIndex.learnCentroids(emb, args(1).toInt,
        args(2).toInt)
      SemDedup.dedup(emb, cents, args(3).toDouble,
        args.lift(4).map(_.toInt).getOrElse(1024))
    }
    register(spark, "graft_phash_pairs", 2, 2) { args =>
      import org.apache.spark.sql.functions._
      val docs = spark.table(args(0))
      val maxHamming = args(1).toLong
      val hashes = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.ahash64(
          col("payload").cast("binary")).as("h"))
        .filter(col("h").isNotNull)
      val banded = hashes.select(col("doc_id"),
        posexplode(array((0 to 3).map(bb =>
          shiftrightunsigned(col("h"), bb * 16)
            .bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band_no", "band_val")))
      CandidatePairs.fromBuckets(banded, Seq("band_no", "band_val"),
        "doc_id", "doc_a", "doc_b")
        .join(hashes.select(col("doc_id").as("doc_a"),
          col("h").as("ha")), Seq("doc_a"))
        .join(hashes.select(col("doc_id").as("doc_b"),
          col("h").as("hb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
            .as("hamming"))
        .filter(col("hamming") <= maxHamming)
    }
    register(spark, "graft_acf", 5, 5) { args =>
      SeriesStats.acf(spark.table(args(0)), args(1), args(2), args(3),
        args(4).toInt)
    }
    // the seed argument is REQUIRED — a defaulted (public) seed makes
    // the deterministic noise recomputable by anyone, zero privacy
    // (see [[Privacy]])
    register(spark, "graft_dp_counts", 4, 5) { args =>
      // optional 5th arg: a one-column view of the PUBLIC key domain
      // (the known-domain release — absent groups publish pure noise)
      args.lift(4) match {
        case Some(domainView) => Privacy.dpCounts(spark.table(args(0)),
          args(1), args(2).toDouble, args(3), spark.table(domainView))
        case None => Privacy.dpCounts(spark.table(args(0)), args(1),
          args(2).toDouble, args(3))
      }
    }
    register(spark, "graft_dp_sum", 6, 6) { args =>
      Privacy.dpSum(spark.table(args(0)), args(1), args(2),
        args(3).toDouble, args(4).toLong, args(5))
    }
    register(spark, "graft_dp_mean", 6, 6) { args =>
      Privacy.dpMean(spark.table(args(0)), args(1), args(2),
        args(3).toDouble, args(4).toLong, args(5))
    }
    register(spark, "graft_dp_median", 5, 6) { args =>
      // optional 6th arg: a general ε — the driver-quantized weight
      // table replaces the fixed ε = 2·ln 2 powers of two
      args.lift(5) match {
        case Some(eps) => Privacy.dpMedian(spark.table(args(0)),
          args(1), args(2), args(3).toLong, eps.toDouble, args(4))
        case None => Privacy.dpMedian(spark.table(args(0)), args(1),
          args(2), args(3).toLong, args(4))
      }
    }
    register(spark, "graft_dp_quantile", 8, 8) { args =>
      Privacy.dpQuantile(spark.table(args(0)), args(1), args(2),
        args(3).toLong, args(4).toInt, args(5).toInt,
        args(6).toDouble, args(7))
    }
    register(spark, "graft_dp_topk", 6, 6) { args =>
      // graft_dp_topk(view, key_col, epsilon, seed, domain_view, k):
      // noisy top-k = post-processing of the known-domain release
      Privacy.dpTopK(spark.table(args(0)), args(1), args(2).toDouble,
        args(3), spark.table(args(4)), args(5).toInt)
    }
    register(spark, "graft_dp_crosstab", 6, 6) { args =>
      // graft_dp_crosstab(view, key_a, key_b, epsilon, seed,
      // domain_view): the two-way contingency release over a public
      // two-column cell domain
      Privacy.dpCrosstab(spark.table(args(0)), args(1), args(2),
        args(3).toDouble, args(4), spark.table(args(5)))
    }
    register(spark, "graft_seasonal_strength", 5, 6) { args =>
      SeriesStats.seasonalStrength(spark.table(args(0)), args(1),
        args(2), args(3), args(4).toInt,
        args.lift(5).map(_.toInt).getOrElse(0))
    }
    register(spark, "graft_ccf", 5, 5) { args =>
      SeriesStats.ccf(spark.table(args(0)), args(1), args(2), args(3),
        args(4).toInt)
    }
    register(spark, "graft_spearman", 4, 4) { args =>
      SeriesStats.spearman(spark.table(args(0)), args(1), args(2),
        args(3))
    }
    register(spark, "graft_ann", 5, 5) { args =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val layoutPath = args(0)
      val (k, dim) = IvfIndex.readCellMeta(spark, layoutPath)
      val centRows = spark.table(args(1))
        .select(col("cell_id").cast("long"),
          col("c").cast("array<double>"))
        .collect().sortBy(_.getLong(0))
      val cents: Array[Array[Double]] =
        centRows.map(_.getSeq[Double](1).toArray)
      require(cents.length == k && cents.forall(_.length == dim),
        s"graft_ann: centroid view ${args(1)} has ${cents.length} " +
          s"centroids of dim ${cents.headOption.map(_.length)}, the " +
          s"layout at $layoutPath is stamped (k=$k, dim=$dim) — " +
          "probing with alien centroids silently searches wrong cells")
      // the sorted-position→cell mapping below assumes the view's ids
      // are EXACTLY 1..k — a 0-based or gapped id set would pass the
      // count check yet silently score probes against shifted
      // centroids (the failure mode the geometry stamp exists to
      // refuse), so the id sequence is pinned, not assumed
      require(centRows.map(_.getLong(0)).toSeq == (1L to k.toLong),
        s"graft_ann: centroid view ${args(1)} cell_id values " +
          s"${centRows.map(_.getLong(0)).mkString("[", ",", "]")} " +
          s"are not the layout's 1..$k — a shifted id set maps " +
          "probes to the wrong cells")
      // a relearned layout stamps its centroid fingerprint: probes
      // holding the PRE-relearn centroids would pass the (k, dim)
      // check yet search the old cells — refuse stale geometry
      IvfIndex.readCentroidVersion(spark, layoutPath).foreach { ver =>
        require(IvfIndex.centroidVersion(cents) == ver,
          s"graft_ann: centroid view ${args(1)} does not match the " +
            s"layout's stamped centroid_version $ver — the layout " +
            "was relearned; refresh the centroid view")
      }
      val nprobe = args(3).toInt
      val topK = args(4).toInt
      require(nprobe >= 1 && nprobe <= k,
        s"graft_ann: nprobe must be in [1, $k], got $nprobe")
      val probes = spark.table(args(2))
        .select(col("query_id").cast("long"),
          col("v").cast("array<double>").as("pv"))
      val wCell = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cid0"))
      val probeCells = probes
        .select(col("query_id"), col("pv"),
          posexplode(IvfIndex.scoresCol(col("pv"), cents))
            .as(Seq("cid0", "score")))
        .withColumn("cell", (col("cid0") + 1).cast("long"))
        .withColumn("cr", row_number().over(wCell))
        .filter(col("cr") <= nprobe)
        .select(col("query_id"), col("pv"), col("cell"))
      val corpus = spark.read.format("graft.sources.CellsSource")
        .option("path", layoutPath).load()
        .select(col("vec_id"), col("v").cast("array<double>").as("v"),
          col("cell").cast("long").as("cell"))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0) + lit(0.5)).cast("double") /
          lit(1000000.0)
      val dot = graft.functions.GraftFunctions.dotd _
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      corpus.join(broadcast(probeCells), Seq("cell"))
        .select(col("query_id"), col("vec_id"),
          q6(dot(col("v"), col("pv")) /
            (sqrt(dot(col("v"), col("v"))) *
              sqrt(dot(col("pv"), col("pv"))))).as("cos_sim"))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter(col("rn") <= topK)
        .select(col("query_id"), col("rn"),
          col("vec_id").as("neighbor_id"), col("cos_sim"))
    }
    register(spark, "graft_fingerprint", 4, 12) { args =>
      import org.apache.spark.sql.functions.col
      Fingerprints.bucketFingerprints(spark.table(args(0)), args(1),
        args.drop(3).map(col), args(2).toInt)
    }
    register(spark, "graft_dedup_surgery", 2, 2) { args =>
      import org.apache.spark.sql.functions._
      val docs = spark.table(args(0)).select(col("doc_id"), col("text"))
      val tokens = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("tok"))
      val runs = SuffixRanks.dupRuns(tokens, args(1).toLong)
      val kept = tokens.alias("t").join(runs.alias("r"),
        col("t.doc_id") === col("r.doc_id") &&
          col("pos") >= col("run_start") && col("pos") <= col("run_end"),
        "left_anti")
      kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("kept_tokens"),
          concat_ws(" ", expr(
            "transform(array_sort(collect_list(struct(pos, tok))), " +
              "p -> p.tok)")).as("kept_text"))
        .join(docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
          Seq("doc_id"), "right_outer")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
          (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
            .as("removed_tokens"),
          coalesce(col("kept_text"), lit("")).as("kept_text"))
    }
    register(spark, "graft_rank", 4, 7) { args =>
      PageRank.ranks(spark.table(args(0)), args(1), args(2),
        args(3).toInt,
        scale = args.lift(4).map(_.toLong).getOrElse(1000000L),
        dampNum = args.lift(5).map(_.toLong).getOrElse(85L),
        dampDen = args.lift(6).map(_.toLong).getOrElse(100L))
    }
    register(spark, "graft_trustrank", 6, 6) { args =>
      val m = args(4).toLong
      require(m >= 1L, s"graft_trustrank seed_mod must be >= 1, got $m")
      PageRank.ranksSeeded(spark.table(args(0)), args(1), args(2),
        args(3),
        n => n % m === org.apache.spark.sql.functions.lit(0L),
        args(5).toInt)
    }
    register(spark, "graft_communities", 4, 4) { args =>
      LabelPropagation.communities(spark.table(args(0)), args(1),
        args(2), args(3).toInt)
    }
    register(spark, "graft_triangles", 3, 3) { args =>
      Triangles.triangles(spark.table(args(0)), args(1), args(2))
    }
    register(spark, "graft_paths", 6, 6) { args =>
      val m = args(4).toLong
      require(m >= 1L, s"graft_paths seed_mod must be >= 1, got $m")
      MinPlusPaths.distances(spark.table(args(0)), args(1), args(2),
        args(3),
        n => n % m === org.apache.spark.sql.functions.lit(0L),
        args(5).toInt)
    }
    register(spark, "graft_hybrid_rrf", 2, 4) { args =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rrfK = args.lift(2).map(_.toLong).getOrElse(60L)
      val topN = args.lift(3).map(_.toInt).getOrElse(10)
      def ranked(view: String, as: String) = spark.table(view)
        .select(col("query_id"), col("doc_id"), col("rank").as(as))
      val wFuse = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf_micro").desc, col("doc_id"))
      ranked(args(0), "lex_rank")
        .join(ranked(args(1), "sem_rank"),
          Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf_micro",
          coalesce(floor(lit(1000000.0) / (lit(rrfK) + col("lex_rank"))),
            lit(0L)) +
          coalesce(floor(lit(1000000.0) / (lit(rrfK) + col("sem_rank"))),
            lit(0L)))
        .withColumn("rank", row_number().over(wFuse).cast("long"))
        .filter(col("rank") <= topN)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("rrf_micro"))
    }
    register(spark, "graft_interval_overlap", 7, 7) { args =>
      IntervalJoin.overlapJoin(spark.table(args(0)), args(1), args(2),
        spark.table(args(3)), args(4), args(5), args(6).toLong)
    }
    register(spark, "graft_funnel", 6, 16) { args =>
      Funnel.windowFunnel(spark.table(args(0)), args(1), args(2),
        args(3), args.drop(5), args(4))
    }
  }

  /** The shared literal-args plumbing: evaluate the call's expressions
    * as non-null string literals, delegate to `build`, return the
    * analyzed plan. */
  private def register(spark: SparkSession, name: String,
      minArgs: Int, maxArgs: Int)(
      build: Seq[String] => org.apache.spark.sql.DataFrame): Unit =
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      name, { exprs: Seq[Expression] =>
        val args = exprs.map { e =>
          require(e.foldable && e.dataType == StringType,
            s"$name arguments must be string literals")
          val v = e.eval(null)
          require(v != null, s"$name arguments must not be NULL")
          v.toString
        }
        require(args.length >= minArgs && args.length <= maxArgs,
          s"$name takes $minArgs to $maxArgs arguments, got ${args.length}")
        val plan: LogicalPlan = B.analyzed(build(args))
        plan
      }, "built-in")
}
