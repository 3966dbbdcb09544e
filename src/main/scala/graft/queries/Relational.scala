package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Core relational queries: scan / filter / project / aggregate / sort.
  *
  * Realizes SURVEY.md §2 rows S1, F1–F4, G1, G3, O1. The flagship
  * `pricing_summary` is a TPC-H-Q1-style aggregation: a pushed-down
  * timestamp filter, a low-cardinality groupBy (partial → shuffle →
  * final HashAggregate — 6 groups regardless of input size, so the
  * shuffle is O(partitions), not O(rows), at any scale), and a global
  * sort of a tiny result.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "pricing_summary" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "filter_project" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // F1/F2/F4: conjunctive predicates + derived projection; the
      // filter and the 4-column read schema both reach the Parquet scan.
      Tables.lineitem(s, dir)
        .filter($"l_quantity" > 45 && $"l_discount" <= 0.02 &&
          $"l_returnflag" =!= "A")
        .select(
          $"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1) - $"l_discount")).as("net_price"),
          $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "global_sort" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // O1: total order via range-partitioned sort (samples bounds, no
      // single-node sort at scale).
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
    }),

    // §3 SQL path: the same engine through the SQL parser — text →
    // AstBuilder → the identical Catalyst pipeline the DataFrame API
    // feeds. Same quantization recipe, same oracle semantics.
    "sql_surface" -> ((s: SparkSession, dir: String) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag,
          |  CAST(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)) AS DOUBLE)
          |    / 10000.0 AS revenue,
          |  COUNT(*) AS n_items
          |FROM lineitem_v
          |WHERE l_quantity > 5
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // F4 completion: the full predicate algebra — IN, BETWEEN, LIKE,
    // RLIKE, IS (NOT) NULL, OR, NOT — in one pushdown-friendly filter.
    "filter_predicates" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.part(s, dir)
        .filter(
          ($"p_brand".isin("Brand#1", "Brand#2", "Brand#3") ||
            $"p_type".like("%a%")) &&
            $"p_size".between(10, 40) &&
            $"p_name".rlike("^[a-m]") &&
            $"p_retailprice".isNotNull &&
            !($"p_size" === 13))
        .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    }),

    // S7: CSV + JSON sources with declared schemas. The fixture tables
    // are materialized to /tmp in those formats ONCE per sf dir
    // (derived from the parquet fixtures — never hand-synthesized; the
    // _SUCCESS marker gates re-writes so the timed query measures the
    // READ path, not repeated file materialization), then read back
    // through the schema-declared readers and joined; the oracle reads
    // the same rows straight from parquet, so the round trip is what's
    // verified.
    "csv_json_source" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.sources.FileSources
      val tmp = s"/tmp/graft_sources/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$tmp/nation_csv/_SUCCESS").exists())
        Tables.nation(s, dir).write.mode("overwrite")
          .option("header", "true").csv(s"$tmp/nation_csv")
      if (!new java.io.File(s"$tmp/region_json/_SUCCESS").exists())
        Tables.region(s, dir).write.mode("overwrite").json(s"$tmp/region_json")
      val nation = FileSources.csv(s, s"$tmp/nation_csv", FileSources.nationSchema)
      val region = FileSources.json(s, s"$tmp/region_json", FileSources.regionSchema)
      nation.join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name", $"r_name")
        .orderBy($"n_nationkey")
    }),

    // S13: hive-partitioned layout + STATIC partition pruning — the
    // directory-level skip that precedes every row-group zone-map
    // (Y3): documents written partitionBy(lang) once per dir (same
    // _SUCCESS gate as csv_json_source), read back with a partition
    // filter. At 100 TB a lang='en' scan lists ONLY the en=...
    // directory — the other partitions are never opened, which the
    // plan proves via PartitionFilters (pinned in RelationalSpec);
    // the oracle verifies the round trip + filter semantics from the
    // original parquet.
    "partitioned_source" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = s"/tmp/graft_sources/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$tmp/docs_by_lang/_SUCCESS").exists())
        Tables.documents(s, dir).write.mode("overwrite")
          .partitionBy("lang").parquet(s"$tmp/docs_by_lang")
      s.read.parquet(s"$tmp/docs_by_lang")
        .filter($"lang" === "en")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"source")
    }),

    // S7 (columnar beyond parquet): ORC source/sink round trip — the
    // same once-per-dir materialization gate; ORC is self-describing,
    // so the read declares no schema (embedded, like parquet).
    "orc_source" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val tmp = s"/tmp/graft_sources/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$tmp/supplier_orc/_SUCCESS").exists())
        Tables.supplier(s, dir).write.mode("overwrite").orc(s"$tmp/supplier_orc")
      val sup = s.read.orc(s"$tmp/supplier_orc")
      sup.join(broadcast(Tables.nation(s, dir)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"n_name")
        .orderBy($"s_suppkey")
    }),

    // S16: bad-record quarantine channel — production ingestion never
    // gets clean files: a 100 TB CSV drop has rows that fail the
    // schema, and the job must split them into a quarantine relation
    // WITHOUT failing (FAILFAST) or silently dropping them (DROPMALFORMED).
    // PERMISSIVE mode + columnNameOfCorruptRecord is the Spark
    // spelling: the malformed raw line lands in `_corrupt`, parsed
    // fields that survived stay usable, and both channels come out of
    // ONE scan. The dirty file derives from the parquet fixture (rows
    // with c_custkey ≡ 0 mod 37 get a non-numeric acctbal —
    // deterministic, _SUCCESS-gated like csv_json_source), so the
    // oracle replays the corruption rule exactly.
    "quarantine_channel" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val tmp = s"/tmp/graft_sources/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$tmp/customer_dirty/_SUCCESS").exists())
        Tables.customer(s, dir)
          .select(concat_ws(",",
            $"c_custkey", $"c_name", $"c_nationkey",
            when($"c_custkey" % 37 === 0, lit("N/A"))
              .otherwise($"c_acctbal".cast("string")),
            $"c_mktsegment").as("value"))
          .write.mode("overwrite").text(s"$tmp/customer_dirty")
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", LongType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType),
        StructField("_corrupt", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(s"$tmp/customer_dirty")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          count($"_corrupt").as("n_quarantined"),
          dsum(coalesce($"c_acctbal", lit(0.0))).as("clean_bal"))
        .orderBy($"c_mktsegment")
    }),

    // Data-quality audit: orphan-key rates per foreign-key edge — the
    // referential-integrity check an ingestion pipeline runs before
    // trusting a snapshot. Each edge is ONE pass: left join the child
    // keys against the DISTINCT parent keys (16-byte rows; the parent
    // side ships only its key) and count misses. SQL-standard NULL
    // semantics: a NULL foreign key is not a violation on either
    // engine. The fixture is fully consistent, so probe rows with
    // non-existent user ids carry the orphan mechanism on edge 4.
    "ri_audit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame =
        child.select(col(ck).as("k"))
          .join(parent.select(col(pk).as("k")).distinct()
            .withColumn("__hit", lit(1)), Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            count(when(col("__hit").isNull && col("k").isNotNull, 1))
              .as("n_orphans"))
          .select(lit(name).as("edge"), $"n_child", $"n_orphans")
      val ev = Tables.events(s, dir).select($"user_id")
        .unionAll(Seq(999991L, 999992L, 999993L).toDF("user_id"))
      edge("1_lineitem_orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")
        .unionAll(edge("2_orders_customer", Tables.orders(s, dir),
          "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .unionAll(edge("3_lineitem_part", Tables.lineitem(s, dir),
          "l_partkey", Tables.part(s, dir), "p_partkey"))
        .unionAll(edge("4_events_customer", ev, "user_id",
          Tables.customer(s, dir), "c_custkey"))
        .orderBy($"edge")
    }),

    // S2: in-memory table — a literal mapping relation created in the
    // session (no storage), broadcast into a join like any dimension.
    "inmem_lookup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val prio = Seq(
        ("1-URGENT", 1L), ("2-HIGH", 2L), ("3-MEDIUM", 3L),
        ("4-NOT SPECIFIED", 4L), ("5-LOW", 5L)).toDF("p", "prio_rank")
      Tables.orders(s, dir)
        .join(broadcast(prio), $"o_orderpriority" === $"p")
        .groupBy($"prio_rank")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
        .orderBy($"prio_rank")
    }),

    // F5: unpivot/melt — wide→long reshaping (the inverse of G6
    // pivot): lineitem's four measure columns melt into (metric,
    // value) rows, then a per-metric profile. Spark's Expand-based
    // unpivot emits the long rows map-side — one narrow generator,
    // one map-combinable aggregation; nothing shuffles wide rows.
    "unpivot_melt" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .unpivot(
          Array($"l_orderkey"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          "metric", "value")
        .groupBy($"metric")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total"),
          min($"value").as("min_v"), max($"value").as("max_v"))
        .orderBy($"metric")
    }),

    // S12: whole-catalog profile — the one-shot ANALYZE inventory a
    // pipeline runs against a new data drop: every table's row count
    // and column count in one relation. Counts are independent
    // map-combinable scans unioned AFTER aggregation (10 one-row
    // frames — the union never moves data rows); column counts come
    // from the embedded schemas.
    "catalog_profile" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.Tables.all.map { t =>
        val df = if (t == "events") graft.Tables.events(s, dir)
          else graft.Tables(s, dir, t)
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), $"n_rows",
            lit(df.columns.length.toLong).as("n_cols"))
      }.reduce(_ unionAll _).orderBy($"table_name")
    }),

    // S15: metadata-only aggregates — MIN/MAX/COUNT over a 100 TB
    // table answered from parquet FOOTER statistics, zero data pages
    // read, when DSv2 aggregate pushdown is on
    // (`spark.sql.parquet.aggregatePushdown`; the scan node reports
    // `PushedAggregation`, pinned in RelationalSpec). The conf rides
    // an isolated `newSession` (same SparkContext, own SQLConf) so
    // the flag cannot leak into other queries' plans; the result is
    // conf-independent — the oracle checks values, the spec checks
    // that the plan is the footer-only shape.
    "metadata_agg" -> ((s: SparkSession, dir: String) => {
      val ns = s.newSession()
      ns.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      // aggregate pushdown lives in the DSv2 scan path only; parquet
      // defaults to the V1 FileScan, so route this session through V2
      ns.conf.set("spark.sql.sources.useV1SourceList", "")
      import ns.implicits._
      // long + double columns only: parquet footer min/max for
      // timestamps is not a pushable type (Spark excludes it), and one
      // unpushable aggregate blocks the whole list
      graft.Tables.lineitem(ns, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          min($"l_orderkey").as("min_key"),
          max($"l_orderkey").as("max_key"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    }),
  )

  val oracle: Map[String, String] = Map(
    // portable UNION ALL spelling of the melt; same per-metric profile
    "unpivot_melt" ->
      s"""WITH m AS (
         |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         |  UNION ALL
         |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
         |  UNION ALL
         |  SELECT 'l_discount', l_discount FROM lineitem
         |  UNION ALL
         |  SELECT 'l_tax', l_tax FROM lineitem)
         |SELECT metric, COUNT(*) AS n, ${sqlDsum("value")} AS total,
         |  MIN(value) AS min_v, MAX(value) AS max_v
         |FROM m GROUP BY metric ORDER BY metric""".stripMargin,

    // column counts pinned from the fixture schemas (FIXTURES.md) —
    // a column-set drift fails this row loudly, which is the point of
    // a catalog check
    "catalog_profile" -> {
      val cols = Map("region" -> 2, "nation" -> 3, "customer" -> 5,
        "supplier" -> 4, "part" -> 6, "orders" -> 6, "lineitem" -> 11,
        "events" -> 6, "documents" -> 5, "embeddings" -> 3)
      graft.Tables.all.map { t =>
        s"""SELECT '$t' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(${cols(t)} AS BIGINT) AS n_cols FROM $t""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    // replay of the deterministic corruption rule from the clean
    // parquet: quarantined ⟺ c_custkey ≡ 0 (mod 37)
    "quarantine_channel" ->
      s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN c_custkey % 37 = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_quarantined,
         |  ${sqlDsum("CASE WHEN c_custkey % 37 = 0 THEN 0.0 ELSE c_acctbal END")} AS clean_bal
         |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "metadata_agg" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    // NULL-excluding orphan predicate on both sides (SQL-standard RI);
    // parent NULL keys filtered so NOT IN can't collapse to NULL
    "ri_audit" ->
      """SELECT '1_lineitem_orders' AS edge,
        |  (SELECT COUNT(*) FROM lineitem) AS n_child,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
        |     AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                            WHERE o_orderkey IS NOT NULL)) AS n_orphans
        |UNION ALL
        |SELECT '2_orders_customer',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
        |     AND o_custkey NOT IN (SELECT c_custkey FROM customer
        |                           WHERE c_custkey IS NOT NULL))
        |UNION ALL
        |SELECT '3_lineitem_part',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NOT NULL
        |     AND l_partkey NOT IN (SELECT p_partkey FROM part
        |                           WHERE p_partkey IS NOT NULL))
        |UNION ALL
        |SELECT '4_events_customer',
        |  (SELECT COUNT(*) + 3 FROM events),
        |  (SELECT COUNT(*) FROM (
        |     SELECT user_id FROM events
        |     UNION ALL SELECT * FROM (VALUES (999991), (999992), (999993)) p(user_id)) e
        |   WHERE user_id IS NOT NULL
        |     AND user_id NOT IN (SELECT c_custkey FROM customer
        |                         WHERE c_custkey IS NOT NULL))
        |ORDER BY edge""".stripMargin,

    "pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS net_price,
        |  l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount <= 0.02 AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "global_sort" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

    "sql_surface" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 10000.0 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_quantity > 5
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "filter_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') OR p_type LIKE '%a%')
        |  AND p_size BETWEEN 10 AND 40
        |  AND regexp_matches(p_name, '^[a-m]')
        |  AND p_retailprice IS NOT NULL
        |  AND NOT (p_size = 13)
        |ORDER BY p_partkey""".stripMargin,

    "csv_json_source" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "orc_source" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,

    "partitioned_source" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,

    "inmem_lookup" ->
      s"""SELECT CAST(prio_rank AS BIGINT) AS prio_rank, COUNT(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
         |             ('4-NOT SPECIFIED', 4), ('5-LOW', 5)) AS v(p, prio_rank)
         |  ON o_orderpriority = p
         |GROUP BY prio_rank
         |ORDER BY prio_rank""".stripMargin,
  )
}
