package graft.queries

import graft.Tables
import graft.operators.{Bucketing, OutputSizing, ZOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Y-family: storage-layout arithmetic as oracle-gated queries. The
  * layout WRITERS ([[graft.operators.OutputSizing]], [[graft.operators
  * .ZOrder.writeZOrdered]]) are file-system effects pinned by specs;
  * the layout KEYS they cluster on are pure integer expressions, and
  * those are what the oracle can hash-check exactly.
  */
object Layout {

  /** bits per dimension for the orders z-map: custkey < 2^16 and
    * epoch-day < 2^16 hold at every fixture sf (and the operator masks
    * above them by contract). */
  private val ZBits = 16

  private val sqlDay =
    "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Y1: the z-order cell map of orders over (customer, order day) —
    // the profiling query behind a zorder-layout decision: how many
    // rows land in each coarse z cell (cell = z >> 20, i.e. 2^20 of
    // z-space ≈ a 1024×1024 rectangle in (custkey, day)). Pure
    // codegen'd bit arithmetic on the scan, one map-combinable count.
    "zorder_cells" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val day = datediff($"o_orderdate".cast("date"),
        to_date(lit("1970-01-01")))
      Tables.orders(s, dir)
        .select(ZOrder.zvalue($"o_custkey", day, ZBits).as("z"))
        .groupBy(shiftright($"z", 20).as("cell"))
        .agg(count(lit(1)).as("n_orders"),
          min($"z").as("min_z"), max($"z").as("max_z"))
        .orderBy($"cell")
    }),

    // J8/Y: the bucket map behind Bucketing.writeBucketed — for each of
    // the 8 buckets orders would hash into, its row count and key
    // range. This is the layout-planning query (are buckets balanced?
    // what key range does a bucket-pruned scan touch?) AND a driver-
    // checked pin of the bucket-id arithmetic itself: the oracle
    // recomputes murmur3_x86_32 from the public spec with no shared
    // code (Bucketing.bucketMapSql). BucketingSpec ties the same
    // expression to the physical file suffixes a bucketed write emits.
    "bucket_layout" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_orderkey")
        .groupBy(Bucketing.bucketId($"o_orderkey", 8).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
        .orderBy($"bucket")
    }),

    // L33: the grid-clustered file map behind OutputSizing
    // .writeGridClustered — one row per output file the writer emits:
    // its cell, row count, and exact key range. Cells are disjoint
    // contiguous ranges BY ARITHMETIC (cell = key div width), so the
    // oracle replays the whole layout relation; OutputSizingSpec pins
    // the writer to this same map (one file per occupied cell,
    // footer-pruned reads). Width 4096 over o_orderkey.
    "clustered_file_map" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy(OutputSizing.gridCell($"o_orderkey", 4096L).as("cell"))
        .agg(count(lit(1)).as("n_rows"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
        .orderBy($"cell")
    }),

    // Y1 at d=3: the cell map of the (custkey, day, totalprice-unit)
    // three-way interleave with UNEQUAL budgets (16, 10, 10) — the
    // profiling query behind a writeZOrderedN layout. The oracle
    // replays the exact slot layout via the shared zvalueNSql
    // generator, so the round-robin budgeted interleave itself is
    // driver-checked.
    "zorder3_cells" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val day = datediff($"o_orderdate".cast("date"),
        to_date(lit("1970-01-01")))
      Tables.orders(s, dir)
        .select(ZOrder.zvalueN(Seq(
          $"o_custkey" -> 16, day -> 10,
          floor($"o_totalprice" / 1000.0).cast("long") -> 10)).as("z"))
        .groupBy(shiftright($"z", 24).as("cell"))
        .agg(count(lit(1)).as("n_orders"),
          min($"z").as("min_z"), max($"z").as("max_z"))
        .orderBy($"cell")
    }),

    // Y3: zone-map pruning effectiveness audit — the data-skipping
    // report a layout decision is judged by: for three derived range
    // probes (~1%, ~20%, 100% of key space), how many grid-clustered
    // files would the scan planner touch, how many rows ride along,
    // and how many actually match. files = the 4096-wide grid cells
    // of clustered_file_map (one file per cell by construction of
    // OutputSizing.writeGridClustered); "touched" = file [min,max]
    // overlaps the probe — exactly the parquet row-group min/max skip
    // rule. The probe relation is 3 rows broadcast over the bounded
    // per-file stats relation (the real pruning planner's cost shape:
    // linear in FILES, never in rows).
    "prune_audit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables.orders(s, dir).select($"o_orderkey")
      val stats = o
        .groupBy(OutputSizing.gridCell($"o_orderkey", 4096L).as("cell"))
        .agg(count(lit(1)).as("n_rows"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
      val probes = o.agg(max($"o_orderkey").as("mx"))
        .select(explode(array(
          struct(lit(1L).as("probe_id"), expr("mx DIV 100").as("lo"),
            expr("2 * (mx DIV 100)").as("hi")),
          struct(lit(2L).as("probe_id"), expr("mx DIV 10").as("lo"),
            expr("3 * (mx DIV 10)").as("hi")),
          struct(lit(3L).as("probe_id"), lit(0L).as("lo"),
            $"mx".as("hi")))).as("p"))
        .select($"p.probe_id".as("probe_id"), $"p.lo".as("lo"),
          $"p.hi".as("hi"))
      val totals = stats.agg(count(lit(1)).as("n_files_total"))
      val touched = stats.crossJoin(broadcast(probes))
        .filter($"min_key" <= $"hi" && $"max_key" >= $"lo")
        .groupBy($"probe_id", $"lo", $"hi")
        .agg(count(lit(1)).as("n_files_touched"),
          sum($"n_rows").as("n_rows_scanned"))
      val matching = o.crossJoin(broadcast(probes))
        .filter($"o_orderkey" >= $"lo" && $"o_orderkey" <= $"hi")
        .groupBy($"probe_id")
        .agg(count(lit(1)).as("n_rows_matching"))
      touched.join(matching, Seq("probe_id"))
        .crossJoin(broadcast(totals))
        .select($"probe_id", $"lo", $"hi", $"n_files_touched",
          $"n_files_total", $"n_rows_scanned", $"n_rows_matching")
        .orderBy($"probe_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "prune_audit" ->
      s"""WITH o AS (SELECT o_orderkey FROM orders),
         |stats AS (
         |  SELECT ${OutputSizing.gridCellSql("o_orderkey", 4096L)} AS cell,
         |    COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
         |    MAX(o_orderkey) AS max_key
         |  FROM o GROUP BY 1),
         |mxv AS (SELECT MAX(o_orderkey) AS mx FROM o),
         |probes(probe_id, lo, hi) AS (
         |  SELECT CAST(1 AS BIGINT), mx // 100, 2 * (mx // 100) FROM mxv
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), mx // 10, 3 * (mx // 10) FROM mxv
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT), mx FROM mxv),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files_total
         |        FROM stats),
         |touched AS (
         |  SELECT probe_id, lo, hi,
         |    CAST(COUNT(*) AS BIGINT) AS n_files_touched,
         |    CAST(SUM(n_rows) AS BIGINT) AS n_rows_scanned
         |  FROM stats JOIN probes
         |    ON min_key <= hi AND max_key >= lo
         |  GROUP BY 1, 2, 3),
         |matching AS (
         |  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_rows_matching
         |  FROM o JOIN probes ON o_orderkey >= lo AND o_orderkey <= hi
         |  GROUP BY 1)
         |SELECT t.probe_id, t.lo, t.hi, t.n_files_touched,
         |  tot.n_files_total, t.n_rows_scanned, m.n_rows_matching
         |FROM touched t JOIN matching m USING (probe_id) CROSS JOIN tot
         |ORDER BY probe_id""".stripMargin,

    // identical unrolled interleave (ZOrder.zvalueSql) — engine and
    // oracle share the term generator, so the bit arithmetic cannot
    // drift
    "zorder_cells" ->
      s"""SELECT (z >> 20) AS cell, COUNT(*) AS n_orders,
         |  MIN(z) AS min_z, MAX(z) AS max_z
         |FROM (SELECT ${ZOrder.zvalueSql(
              "CAST(o_custkey AS BIGINT)", sqlDay, ZBits)} AS z
         |      FROM orders)
         |GROUP BY 1 ORDER BY cell""".stripMargin,

    // independent murmur3_x86_32 reimplementation — see bucketMapSql
    "bucket_layout" ->
      s"""SELECT bucket, COUNT(*) AS n_rows,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
         |FROM ${Bucketing.bucketMapSql("o_orderkey", 8, "orders")}
         |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "clustered_file_map" ->
      s"""SELECT ${OutputSizing.gridCellSql("o_orderkey", 4096L)} AS cell,
         |  COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
         |  MAX(o_orderkey) AS max_key
         |FROM orders GROUP BY 1 ORDER BY cell""".stripMargin,

    "zorder3_cells" ->
      s"""SELECT (z >> 24) AS cell, COUNT(*) AS n_orders,
         |  MIN(z) AS min_z, MAX(z) AS max_z
         |FROM (SELECT ${ZOrder.zvalueNSql(Seq(
              "CAST(o_custkey AS BIGINT)" -> 16, sqlDay -> 10,
              "CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)" -> 10))} AS z
         |      FROM orders)
         |GROUP BY 1 ORDER BY cell""".stripMargin,
  )
}
