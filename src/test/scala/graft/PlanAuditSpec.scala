package graft

/** Global physical-plan audit over EVERY registered query: the
  * expensive plan shapes must only appear where they are the intended
  * algorithm. This is the regression net for the 100 TB contract — a
  * future edit that silently turns an equi-join into a nested loop or
  * a cartesian product fails here, not in production.
  */
class PlanAuditSpec extends SparkSuite {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan.toString
    }

  // Cartesian products: only the operator whose SEMANTICS is the
  // cross product may plan one.
  private val cartesianOk = Set("join_cross")

  // Nested-loop joins: only non-equi (theta/brute-force-scoring)
  // operators with an explicitly broadcast dimension side, the
  // group-sketch pairing whose both sides are per-GROUP relations
  // (cardinality = number of groups, not rows), and the one-row
  // corpus-total broadcast behind unigram_logprob (the scalar-
  // subquery shape: the nested "loop" iterates a single row).
  private val nestedLoopOk =
    Set("join_theta", "join_cross", "cosine_knn", "source_minhash_sim",
      "unigram_logprob", "bm25_search", "bm25_indexed", "tfidf_terms",
      "bm25_catalog", // bm25_indexed's one-row stats broadcast, via
                      // the TableCatalog resolution path
      "agg_histogram", "heavy_hitters", "exact_ntile", "decayed_activity",
      "source_kl", // one-row corpus-total broadcast (scalar-subquery shape)
      "pq_ann", // brute ADC scan vs broadcast probes (cosine_knn shape)
      "hard_negatives", // the cosine_knn brute scorer + an anti-join
      "ann_recall", // both brute rankings (exact + ADC) vs broadcast probes
      "bigram_logprob", // one-row vocab broadcast (unigram_logprob shape)
      "kn_bigram_logprob", // one-row bigram-types broadcast (same shape)
      "benford_audit", // one-row digit-total broadcast (same shape)
      "chi2_independence", // bounded margin cross (R x C <= 35 cells)
                           // + one-row totals broadcast
      "anova_f", // one-row grand-total broadcast over the k-row
                 // group relation (scalar-subquery shape)
      "ks_drift", // one-row (n1, n2) totals broadcast (same shape)
      "mannwhitney_drift", // one-row (n1, n2, tie) totals broadcast (same shape)
      "lang_id_trigram", // one-row class-totals broadcast (same shape)
      "perplexity_filter", // one-row (n_ref, v) totals broadcast (same shape)
      "hybrid_rrf", // its vector arm is the cosine_knn brute scorer
                    // (broadcast probes); the scale path swaps in
                    // ivfpq_ann unchanged

      "t_closeness", // m-value global-distribution + one-row totals +
                     // 3-row threshold broadcasts over the QI-domain-
                     // sized group relation (prune_audit shape)
      "tpch_q22", // one-row acctbal-threshold broadcast (scalar-subquery shape)
      "tpch_q11", // one-row global-total broadcast (scalar-subquery shape)
      "pmi_collocations", // one-row N/B-totals broadcast (same shape)
      "corr_matrix", // one-row n-cell broadcast over the 2145-cell
                     // metadata relation (scalar-subquery shape)
      "l_diversity", // 3-row threshold broadcast over the QI-domain-
                     // sized group relation (prune_audit shape)
      "k_anonymity", // 3-row threshold broadcast over the QI-domain-
                     // sized group relation (the l_diversity shape)
      "prune_audit", // 3-row probe broadcast over the bounded per-file
                     // stats relation (the pruning planner's own shape)
      "cms_freq", // one-row corpus-total broadcast (scalar-subquery shape)
      "bloom_file_skip", // one-row file-total broadcast (same shape)
      "mixture_apportion", // one-row total + leftover broadcasts over the
                           // source-domain relation (scalar-subquery shape)
      "mixture_temperature", // one-row totals broadcast over the
                             // source-domain relation (same shape)
      "curve_compare", // one-row bounds + 3-row probe broadcasts over
                       // file-count-sized stats (the prune_audit shape)
      "curve_compare3", // same shape at d=3
      "hilbert3_cells", // one-row scaling-bounds broadcast
      "source_affinity", // bounded source-domain centroid pairing
                         // (kmv_overlap shape: both sides one row per
                         // source, inequality dedupes the pairs)
      "retention_sweep", // one-row reference-now broadcast
                         // (scalar-subquery shape)
      "bpe_train", // per-round one-row argmax + vocab-count broadcasts
                   // over the word-frequency relation (scalar-subquery
                   // shape, 2 per merge round)
      "kmv_overlap") // per-SOURCE sketch pairing (source_minhash_sim
                     // shape): both sides are one-row-per-source
                     // relations, the inequality dedupes the bounded
                     // source×source domain

  test("no unintended cartesian products") {
    plans.foreach { case (name, p) =>
      if (!cartesianOk(name))
        assert(!p.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n${p.take(1500)}")
    }
  }

  test("no unintended nested-loop joins") {
    plans.foreach { case (name, p) =>
      if (!nestedLoopOk(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n${p.take(1500)}")
    }
  }

  test("phash_neardup and semdedup pair enumeration rides the " +
      "CandidatePairs skew guard, not a raw bucket self-join") {
    // the chunk branch's role-join columns only exist when pairing
    // routes through CandidatePairs.fromBuckets — a raw
    // join(band/cell) regression loses them
    Seq("phash_neardup", "semdedup").foreach { name =>
      val p = plans(name)
      assert(p.contains("__cl") && p.contains("__cr"),
        s"$name must route pairs through CandidatePairs:\n${p.take(1500)}")
    }
  }

  test("every lineitem filter query pushes predicates to the scan") {
    Seq("filter_project", "range_scan", "pricing_summary").foreach { name =>
      assert(plans(name).contains("PushedFilters: [") &&
        !plans(name).matches("(?s).*PushedFilters: \\[\\].*"),
        s"$name should push filters:\n${plans(name).take(1500)}")
    }
  }

  test("no driver-side collect appears in any query plan") {
    // CollectLimit only ever feeds a bounded k (top-k/limit); anything
    // else driver-side would appear as a LocalTableScan of gathered
    // rows after an action, which query plans here never contain.
    plans.foreach { case (name, p) =>
      assert(!p.contains("CollectLimit") || Set("top_k", "floor_successor_lookup")(name)
        || p.contains("TakeOrderedAndProject"),
        s"$name has an unexpected CollectLimit:\n${p.take(1000)}")
    }
  }

  test("binary_features stays on the expression path (no RDD hop)") {
    // r2 routed this through df.rdd + createDataFrame, which severed
    // codegen, pushdown and pruning below the node; the features are
    // Catalyst expressions now — pin that.
    val p = plans("binary_features")
    assert(!p.contains("ExistingRDD") && !p.contains("SerializeFromObject"),
      s"binary_features dropped to an RDD scan:\n${p.take(1500)}")
  }

  test("broadcast as-of joins inside a WholeStageCodegen stage") {
    // the CodegenSupport integration must actually fuse: after AQE
    // finalizes, the node carries the codegen-stage marker
    val df = SparkEntry.queries("asof_join_broadcast")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) BroadcastAsOfJoin""".r.findFirstIn(p).isDefined,
      s"BroadcastAsOfJoin not codegen-fused:\n${p.take(2000)}")
  }

  test("topk_per_group keeps the WindowGroupLimit rank pushdown") {
    // Spark 4 turns `row_number <= k` above a window into a
    // per-partition group limit BEFORE the shuffle/sort — the plan
    // shape that makes top-k-per-group (and the stratified exact-k
    // sample) viable at 100 TB. Pin it.
    Seq("topk_per_group", "stratified_sample").foreach { name =>
      assert(plans(name).contains("WindowGroupLimit"),
        s"$name rank filter not pushed:\n${plans(name).take(1500)}")
    }
  }

  test("theil_sen selects its median by grid-value counting, not a " +
      "rank over the raw pair relation") {
    // the slope median is a grid value: selection must ride a
    // map-combinable (type, s6) count aggregate + a cumulative walk
    // over DISTINCT grid values — a row_number over the days² pair
    // relation is the shape that dies on long day axes
    val p = plans("theil_sen")
    assert(!p.contains("row_number"),
      s"theil_sen must not rank the raw pair relation:\n${p.take(1500)}")
    assert(p.contains("HashAggregate(keys=[event_type") &&
      p.contains("s6"),
      s"selection must run over the (type, s6) count aggregate:\n" +
        p.take(1500))
  }
}
