package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSuite {

  test("pricing_summary: groups present, counts reconcile with raw filter") {
    val df = SparkEntry.queries("pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
    val totalGrouped = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp")).count()
    assert(totalGrouped === expected)
    // avg consistency: avg_qty * count ≈ sum_qty
    rows.foreach { r =>
      val approx = r.getAs[Double]("avg_qty") * r.getAs[Long]("count_order")
      assert(math.abs(approx - r.getAs[Double]("sum_qty")) < 1e-6 * approx + 1e-6)
    }
  }

  test("entry: flagship smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("filter_project: predicate actually applied") {
    val df = SparkEntry.queries("filter_project")(spark, sf)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02 &&
        col("l_returnflag") =!= "A").count()
    assert(df.count() === expected && expected > 0)
  }

  test("global_sort: monotone by o_totalprice desc") {
    val prices = SparkEntry.queries("global_sort")(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("every query has either an oracle or is explicitly exempt") {
    // Data-dependent oracles (learned-centroid / engine-fingerprint
    // literals): constructing each query warms its per-dir cache,
    // exactly as a Verify run does before dumping oracle_sql.json.
    SparkEntry.queries("ivf_ann_learned")(spark, sf)
    SparkEntry.queries("simhash_neighbors")(spark, sf)
    SparkEntry.queries("source_minhash_sim")(spark, sf)
    SparkEntry.queries("pq_ann")(spark, sf)
    SparkEntry.queries("ivfpq_ann")(spark, sf)
    SparkEntry.queries("agg_approx")(spark, sf)
    SparkEntry.queries("cms_freq")(spark, sf)
    SparkEntry.queries("kmv_overlap")(spark, sf)
    SparkEntry.queries("distinct_ngrams_approx")(spark, sf)
    SparkEntry.queries("bloom_file_skip")(spark, sf)
    SparkEntry.queries("hash_fns_native")(spark, sf)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // The exemption list is EMPTY since round 8: agg_approx closed via
    // the interpolated-estimate + oracle-side 3·rsd bound check,
    // hash_fns_native via IndependentHashes VALUES literals. Keep the
    // empty set so any new query without an oracle fails loudly here.
    // (simhash, winnowing, ann_lsh and source_minhash_sim left this
    // list in round 6: the first two via downstream-guarantee /
    // interpolated-fingerprint oracles, ann_lsh via the sign-bit-fold
    // bucket replay — its bucket never was a hash — and
    // source_minhash_sim via interpolated per-source signatures.)
    val exempt = Set.empty[String]
    assert((missing -- exempt).isEmpty, s"queries without oracle: $missing")
  }

  test("metadata_agg answers MIN/MAX/COUNT from parquet footers (PushedAggregation)") {
    val df = graft.queries.Relational.queries("metadata_agg")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate must push to the scan (footer-only read):\n${p.take(1500)}")
    assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_extendedprice)"),
      s"all five aggregates must push down:\n${p.take(1500)}")
    // values still correct (conf-independent result, footer-only plan)
    val r = df.collect().head
    val exact = Tables.lineitem(spark, sf)
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_extendedprice")))
      .collect().head
    assert(r.getAs[Long]("n_rows") === exact.getLong(0))
    assert(r.getAs[Long]("min_key") === exact.getLong(1))
    assert(r.getAs[Double]("max_price") === exact.getDouble(2))
    // the isolated newSession must not leak the conf into the shared session
    assert(spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
      .forall(_ == "false"))
  }

  test("partitioned_source prunes non-matching lang partitions at the scan") {
    val df = graft.queries.Relational.queries("partitioned_source")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune DIRECTORIES (static partition pruning), " +
        s"not rows:\n${p.take(1500)}")
    assert(df.count() > 0)
  }

  test("json_variant_shredded: the snapshot is variant-SHREDDED parquet " +
      "and the extraction is pushed into the scan as a struct field") {
    // the snapshot's footer carries the VARIANT group with an inferred
    // typed_value — proof the write actually shredded
    val snap = graft.queries.Scalars.variantSnapshot(spark, sf)
    val f = new java.io.File(snap).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    val footer =
      try rd.getFooter.getFileMetaData.getSchema.toString
      finally rd.close()
    assert(footer.contains("VARIANT") && footer.contains("typed_value"),
      s"snapshot must be shredded variant parquet:\n$footer")
    // PushVariantIntoScan rewrites the variant_get extractions into
    // scan-level struct fields: the scan's ReadSchema carries a
    // struct of the requested paths, NOT a variant binary — the
    // per-row parse is gone from the plan itself
    val df = SparkEntry.queries("json_variant_shredded")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("ReadSchema: [^\\n]*props_v:struct<[^\\n]*bigint".r
      .findFirstIn(plan).isDefined &&
      !plan.contains("props_v:variant"),
      s"extractions must be pushed into the scan:\n${plan.take(2000)}")
    assert(!plan.contains("variant_get"),
      "no variant_get may survive above the shredded scan")
    assert(df.count() > 0)
  }
}
