package graft.queries

import graft.Tables
import graft.operators.{BloomSet, Bucketing, Hilbert, OutputSizing, PrefixSum, ZOrder}
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

    // Y4: per-file BLOOM skip index — the point-lookup complement of
    // Y3's zone maps: l_partkey is uncorrelated with the orderkey
    // clustering, so min/max stats prune nothing for a partkey
    // lookup; a per-cell bloom does (the Delta/Iceberg bloom-filter
    // index). The index is a plain DISTRIBUTED relation — one row
    // per (cell, bitset word), built by a map-combinable bit_or,
    // never collected or broadcast — and probes reach it through a
    // word-keyed equi-join. Output per derived probe key: cells the
    // bloom would scan vs cells truly containing the key vs total —
    // with the one-sided contract (maybe ⊇ actual) checked. The
    // bloom counts are engine facts (seeded-FNV lanes have no DuckDB
    // twin) interpolated into the oracle, which replays probes,
    // actual containment, totals, and the bound (the cms pattern).
    "bloom_file_skip" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cells = Tables.lineitem(s, dir)
        .select(OutputSizing.gridCell($"l_orderkey", BloomCellW).as("cell"),
          $"l_partkey")
        .distinct()
      val index = BloomSet.buildGroupedIndex(cells, Seq($"cell"),
        $"l_partkey", BloomBits, BloomK)
      val probes = Tables.lineitem(s, dir)
        .agg(min($"l_partkey").as("mn"), max($"l_partkey").as("mx"))
        .select(explode(array(
          struct(lit(1L).as("probe_id"), $"mn".as("sk")),
          struct(lit(2L).as("probe_id"),
            expr("(mn + mx) DIV 2").as("sk")),
          struct(lit(3L).as("probe_id"), $"mx".as("sk")))).as("p"))
        .select($"p.probe_id".as("probe_id"), $"p.sk".as("sk"))
      val pw = probes.select($"probe_id", $"sk",
          explode(BloomSet.probeWordMasks($"sk", BloomBits, BloomK))
            .as("pm"))
        .select($"probe_id", $"sk", $"pm.w".as("w"), $"pm.m".as("m"))
      val nw = pw.groupBy($"probe_id").agg(count(lit(1)).as("n_words"))
      val maybeN = pw.join(index, "w")
        .filter($"bits".bitwiseAND($"m") === $"m")
        .groupBy($"probe_id", $"cell").agg(count(lit(1)).as("ok"))
        .join(broadcast(nw), "probe_id").filter($"ok" === $"n_words")
        .groupBy($"probe_id").agg(count(lit(1)).as("n_files_maybe"))
      val actual = probes
        .join(cells, probes("sk") === cells("l_partkey"), "left_outer")
        .groupBy($"probe_id", $"sk")
        .agg(countDistinct($"cell").as("n_files_actual"))
      val total = cells.select($"cell").distinct()
        .agg(count(lit(1)).as("n_files_total"))
      val out = actual
        .join(maybeN, Seq("probe_id"), "left_outer")
        .crossJoin(broadcast(total))
        .select($"probe_id", $"sk".as("partkey"),
          coalesce($"n_files_maybe", lit(0L)).as("n_files_maybe"),
          $"n_files_actual", $"n_files_total",
          when(coalesce($"n_files_maybe", lit(0L)) >= $"n_files_actual" &&
            coalesce($"n_files_maybe", lit(0L)) <= $"n_files_total", 1L)
            .otherwise(0L).as("skip_sound"))
        .orderBy($"probe_id")
      bloomSkipCache.get(s, dir)(
        _ => out.select($"probe_id", $"n_files_maybe"))
      lastOracleDir = Some(dir)
      out
    }),

    // Y6: d=2 HILBERT cell map over the same (custkey, day) domain as
    // Y1's z-map — the locality-optimal space-filling curve:
    // consecutive Hilbert indices are ALWAYS grid neighbors
    // (HilbertSpec pins the adjacency invariant exhaustively), where
    // consecutive z values jump across the plane at power-of-two
    // boundaries, so a range probe's rectangle cuts fewer file
    // boundaries under Hilbert clustering (the reason lakehouse
    // OPTIMIZE implementations offer it next to Z-order). Engine side
    // is the codegen'd HilbertIndex2 bit descent; the oracle replays
    // it as a recursive-CTE — two independent implementations of the
    // curve arithmetic, driver-compared.
    "hilbert_cells" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val day = datediff($"o_orderdate".cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
      Tables.orders(s, dir)
        .select(Hilbert.hvalue($"o_custkey", day, ZBits).as("h"))
        .groupBy(shiftright($"h", 20).as("cell"))
        .agg(count(lit(1)).as("n_orders"),
          min($"h").as("min_h"), max($"h").as("max_h"))
        .orderBy($"cell")
    }),

    // Y7: space-filling-curve decision harness — Y3 said "the skip
    // ratio is the measurement"; this row applies that to the CURVE
    // CHOICE itself: the same (custkey, day) domain scaled onto a
    // 10-bit grid, clustered once under Z-order and once under
    // Hilbert (128 cells each), probed with three rectangle shapes.
    // Measured at sf0.01: the square probe ties (2 vs 2 files), the
    // full-custkey/narrow-day band favors Z (16 vs 22 — Z's bit
    // layout privileges its first dimension along that axis), the
    // narrow-custkey/full-day band favors Hilbert (26 vs 32 —
    // Hilbert treats the axes symmetrically). That trade IS the
    // decision data a
    // layout choice needs; neither curve dominates, which is why
    // lakehouses offer both. All arithmetic integer (exact scaling =
    // the scaleTo formula inline over broadcast bounds); per-curve
    // stats relations are file-count-sized; probes are a 3-row
    // broadcast (the prune_audit shape, PlanAudit-allowlisted).
    "curve_compare" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bits = 10
      val shift = 13
      val day = datediff($"o_orderdate".cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
      val bounds = Tables.orders(s, dir)
        .agg(min($"o_custkey").as("cmin"), max($"o_custkey").as("cmax"),
          min(day).as("dmin"), max(day).as("dmax"))
      val base = Tables.orders(s, dir)
        .select($"o_custkey".as("c"), day.as("d"))
        .crossJoin(broadcast(bounds))
        .select($"c", $"d",
          expr(s"((c - cmin) * ${1L << bits}) DIV (cmax - cmin + 1)")
            .as("sx"),
          expr(s"((d - dmin) * ${1L << bits}) DIV (dmax - dmin + 1)")
            .as("sy"))
      val cells = base.select(lit("hilbert").as("curve"),
          shiftright(Hilbert.hvalue($"sx", $"sy", bits), shift).as("cell"),
          $"c", $"d")
        .unionAll(base.select(lit("zorder").as("curve"),
          shiftright(ZOrder.zvalue($"sx", $"sy", bits), shift).as("cell"),
          $"c", $"d"))
      val stats = cells.groupBy($"curve", $"cell")
        .agg(count(lit(1)).as("n_rows"),
          min($"c").as("minc"), max($"c").as("maxc"),
          min($"d").as("mind"), max($"d").as("maxd"))
      val probes = bounds.select(explode(array(
          struct(lit(1L).as("probe_id"),
            expr("cmin + (cmax - cmin) * 40 DIV 100").as("cl"),
            expr("cmin + (cmax - cmin) * 50 DIV 100").as("ch"),
            expr("dmin + (dmax - dmin) * 40 DIV 100").as("dl"),
            expr("dmin + (dmax - dmin) * 50 DIV 100").as("dh")),
          struct(lit(2L).as("probe_id"), $"cmin".as("cl"), $"cmax".as("ch"),
            expr("dmin + (dmax - dmin) * 45 DIV 100").as("dl"),
            expr("dmin + (dmax - dmin) * 55 DIV 100").as("dh")),
          struct(lit(3L).as("probe_id"),
            expr("cmin + (cmax - cmin) * 45 DIV 100").as("cl"),
            expr("cmin + (cmax - cmin) * 55 DIV 100").as("ch"),
            $"dmin".as("dl"), $"dmax".as("dh")))).as("p"))
        .select($"p.probe_id".as("probe_id"), $"p.cl".as("cl"),
          $"p.ch".as("ch"), $"p.dl".as("dl"), $"p.dh".as("dh"))
      val totals = stats.groupBy($"curve")
        .agg(count(lit(1)).as("n_files_total"))
      stats.crossJoin(broadcast(probes))
        .filter($"minc" <= $"ch" && $"maxc" >= $"cl" &&
          $"mind" <= $"dh" && $"maxd" >= $"dl")
        .groupBy($"probe_id", $"curve")
        .agg(count(lit(1)).as("n_files_touched"),
          sum($"n_rows").as("n_rows_scanned"))
        .join(broadcast(totals), "curve")
        .select($"probe_id", $"curve", $"n_files_touched",
          $"n_files_total", $"n_rows_scanned")
        .orderBy($"probe_id", $"curve")
    }),

    // Y8: the Y6 curve at d=3 — hvalueN (the Skilling general-d
    // transform) over (custkey, day, price-unit) scaled onto equal
    // 8-bit grids: the cell map of a writeZOrderedN-style layout
    // under the locality-optimal curve, at the dimensionality Y2
    // already covers for Z-order. The oracle replays the transform as
    // a recursive CTE (inverse-undo rounds as data, the n sequential
    // within-plane sub-steps as a constant-depth lateral-alias chain,
    // the t-fold in closed form) — two independent implementations of
    // the d=3 curve arithmetic, driver-compared. Scaling bounds ride
    // a one-row broadcast (allowlisted).
    "hilbert3_cells" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val B = 8
      val day = datediff($"o_orderdate".cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
      val unit = floor($"o_totalprice" / lit(1000.0)).cast("long")
      val bounds = Tables.orders(s, dir)
        .agg(min($"o_custkey").as("cmin"), max($"o_custkey").as("cmax"),
          min(day).as("dmin"), max(day).as("dmax"),
          min(unit).as("umin"), max(unit).as("umax"))
      Tables.orders(s, dir)
        .select($"o_custkey".as("c"), day.as("d"), unit.as("u"))
        .crossJoin(broadcast(bounds))
        .select(Hilbert.hvalueN(Seq(
          expr(s"((c - cmin) * ${1L << B}) DIV (cmax - cmin + 1)"),
          expr(s"((d - dmin) * ${1L << B}) DIV (dmax - dmin + 1)"),
          expr(s"((u - umin) * ${1L << B}) DIV (umax - umin + 1)")), B)
          .as("h"))
        .groupBy(shiftright($"h", 16).as("cell"))
        .agg(count(lit(1)).as("n_orders"),
          min($"h").as("min_h"), max($"h").as("max_h"))
        .orderBy($"cell")
    }),

    // Y9: the Y7 curve-decision harness at d=3 — the question Y7
    // itself motivates ("which curve for THIS workload") answered at
    // the dimensionality real layouts use: the same (custkey, day,
    // price-unit) domain scaled onto 7-bit grids, clustered once
    // under the d=3 Z interleave and once under the d=3 Hilbert
    // (128 cells each), probed with the three predicate FAMILIES a
    // 3-dim layout serves: a 3-dim box, a 2-dim box (third dimension
    // unconstrained), and a 1-dim band. files-touched per curve per
    // probe is the decision data. All arithmetic integer; per-curve
    // stats relations are file-count-sized; probes and bounds are
    // tiny broadcasts (the prune_audit shape, allowlisted).
    "curve_compare3" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val B = 7
      val shift = 14
      val day = datediff($"o_orderdate".cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
      val unit = floor($"o_totalprice" / lit(1000.0)).cast("long")
      val bounds = Tables.orders(s, dir)
        .agg(min($"o_custkey").as("cmin"), max($"o_custkey").as("cmax"),
          min(day).as("dmin"), max(day).as("dmax"),
          min(unit).as("umin"), max(unit).as("umax"))
      val base = Tables.orders(s, dir)
        .select($"o_custkey".as("c"), day.as("d"), unit.as("u"))
        .crossJoin(broadcast(bounds))
        .select($"c", $"d", $"u",
          expr(s"((c - cmin) * ${1L << B}) DIV (cmax - cmin + 1)")
            .as("sx"),
          expr(s"((d - dmin) * ${1L << B}) DIV (dmax - dmin + 1)")
            .as("sy"),
          expr(s"((u - umin) * ${1L << B}) DIV (umax - umin + 1)")
            .as("su"))
      val cells = base.select(lit("hilbert").as("curve"),
          shiftright(Hilbert.hvalueN(Seq($"sx", $"sy", $"su"), B), shift)
            .as("cell"), $"c", $"d", $"u")
        .unionAll(base.select(lit("zorder").as("curve"),
          shiftright(ZOrder.zvalueN(Seq($"sx" -> B, $"sy" -> B,
            $"su" -> B)), shift).as("cell"), $"c", $"d", $"u"))
      val stats = cells.groupBy($"curve", $"cell")
        .agg(count(lit(1)).as("n_rows"),
          min($"c").as("minc"), max($"c").as("maxc"),
          min($"d").as("mind"), max($"d").as("maxd"),
          min($"u").as("minu"), max($"u").as("maxu"))
      val probes = bounds.select(explode(array(
          struct(lit(1L).as("probe_id"),
            expr("cmin + (cmax - cmin) * 40 DIV 100").as("cl"),
            expr("cmin + (cmax - cmin) * 55 DIV 100").as("ch"),
            expr("dmin + (dmax - dmin) * 40 DIV 100").as("dl"),
            expr("dmin + (dmax - dmin) * 55 DIV 100").as("dh"),
            expr("umin + (umax - umin) * 40 DIV 100").as("ul"),
            expr("umin + (umax - umin) * 55 DIV 100").as("uh")),
          struct(lit(2L).as("probe_id"),
            expr("cmin + (cmax - cmin) * 45 DIV 100").as("cl"),
            expr("cmin + (cmax - cmin) * 55 DIV 100").as("ch"),
            expr("dmin + (dmax - dmin) * 45 DIV 100").as("dl"),
            expr("dmin + (dmax - dmin) * 55 DIV 100").as("dh"),
            $"umin".as("ul"), $"umax".as("uh")),
          struct(lit(3L).as("probe_id"),
            expr("cmin + (cmax - cmin) * 45 DIV 100").as("cl"),
            expr("cmin + (cmax - cmin) * 55 DIV 100").as("ch"),
            $"dmin".as("dl"), $"dmax".as("dh"),
            $"umin".as("ul"), $"umax".as("uh")))).as("p"))
        .select($"p.probe_id".as("probe_id"), $"p.cl".as("cl"),
          $"p.ch".as("ch"), $"p.dl".as("dl"), $"p.dh".as("dh"),
          $"p.ul".as("ul"), $"p.uh".as("uh"))
      val totals = stats.groupBy($"curve")
        .agg(count(lit(1)).as("n_files_total"))
      stats.crossJoin(broadcast(probes))
        .filter($"minc" <= $"ch" && $"maxc" >= $"cl" &&
          $"mind" <= $"dh" && $"maxd" >= $"dl" &&
          $"minu" <= $"uh" && $"maxu" >= $"ul")
        .groupBy($"probe_id", $"curve")
        .agg(count(lit(1)).as("n_files_touched"),
          sum($"n_rows").as("n_rows_scanned"))
        .join(broadcast(totals), "curve")
        .select($"probe_id", $"curve", $"n_files_touched",
          $"n_files_total", $"n_rows_scanned")
        .orderBy($"probe_id", $"curve")
    }),

    // Y5: small-file compaction plan — the maintenance op behind
    // Delta OPTIMIZE / Iceberg rewriteDataFiles: coalesce ADJACENT
    // undersized files (the 256-wide grid cells, ~60 rows each at
    // sf0.01) into jobs of ≈ CompactTarget rows. Grouping only
    // adjacent cells is the load-bearing choice: output files stay
    // range-disjoint, so the clustering (and every zone-map prune of
    // Y3) survives compaction. job = exclusive-prefix-rows DIV
    // target — integer-exact greedy bin packing; the running sum runs
    // over the FILE-STATS relation (bounded, one row per file — the
    // planner cost shape, linear in files never rows) through the
    // two-phase PrefixSum, never a single-task global window.
    "compaction_plan" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val stats = Tables.orders(s, dir)
        .groupBy(OutputSizing.gridCell($"o_orderkey", 256L).as("cell"))
        .agg(count(lit(1)).as("n_rows"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
      PrefixSum.withRunningSum(stats, Seq.empty, $"cell", $"n_rows", "cum")
        .withColumn("job", expr(s"(cum - n_rows) DIV $CompactTarget"))
        .groupBy($"job")
        .agg(count(lit(1)).as("n_files"), sum($"n_rows").as("n_rows"),
          min($"min_key").as("min_key"), max($"max_key").as("max_key"))
        .orderBy($"job")
    }),
  )

  /** Y5 target rows per compaction job. */
  private val CompactTarget = 1000L

  /** Y4 bloom-index shape: 64-order cells (so a cell's part set is a
    * SELECTIVE subset of the part domain — the point of a bloom
    * index; the orderkey zone map handles the clustered key) and
    * 4096 bits x 4 lanes per cell ≈ 64 longs — a few hundred bytes
    * per file, the Iceberg default class. */
  private val BloomCellW = 64L
  private val BloomBits = 4096L
  private val BloomK = 4

  private val bloomSkipCache = new SessionCache[DataFrame]
  private val bloomSkipSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var lastOracleDir: Option[String] = None

  /** DuckDB mirror of `bloom_file_skip`: the engine's maybe-counts as
    * VALUES literals; probes, true containment, totals, and the
    * one-sided bound recomputed from DuckDB's own aggregation. */
  private def bloomSkipSql(rows: Array[(Long, Long)]): String = {
    val vals = rows.sortBy(_._1)
      .map { case (p, m) => s"($p, $m)" }.mkString(",\n    ")
    s"""WITH cells AS (
       |  SELECT DISTINCT ${OutputSizing.gridCellSql("l_orderkey", BloomCellW)}
       |    AS cell, l_partkey
       |  FROM lineitem),
       |bounds AS (SELECT MIN(l_partkey) AS mn, MAX(l_partkey) AS mx
       |           FROM lineitem),
       |probes AS (
       |  SELECT CAST(1 AS BIGINT) AS probe_id, mn AS sk FROM bounds
       |  UNION ALL SELECT CAST(2 AS BIGINT), (mn + mx) // 2 FROM bounds
       |  UNION ALL SELECT CAST(3 AS BIGINT), mx FROM bounds),
       |est(probe_id, n_files_maybe) AS (VALUES
       |    $vals),
       |act AS (
       |  SELECT p.probe_id, p.sk,
       |    CAST(COUNT(DISTINCT c.cell) AS BIGINT) AS n_files_actual
       |  FROM probes p LEFT JOIN cells c ON c.l_partkey = p.sk
       |  GROUP BY 1, 2),
       |tot AS (SELECT CAST(COUNT(DISTINCT cell) AS BIGINT)
       |          AS n_files_total FROM cells)
       |SELECT a.probe_id, a.sk AS partkey,
       |  CAST(e.n_files_maybe AS BIGINT) AS n_files_maybe,
       |  a.n_files_actual, tot.n_files_total,
       |  CASE WHEN e.n_files_maybe >= a.n_files_actual
       |    AND e.n_files_maybe <= tot.n_files_total
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS skip_sound
       |FROM act a JOIN est e USING (probe_id) CROSS JOIN tot
       |ORDER BY probe_id""".stripMargin
  }

  /** Static oracles plus the data-dependent bloom entry for `dir`
    * once its query has been constructed (the Aggregates.oracleFor
    * contract). */
  def oracleFor(dir: String): Map[String, String] =
    staticOracle ++ bloomSkipCache.peek(dir).map { f =>
      Map("bloom_file_skip" -> bloomSkipSqlCache.computeIfAbsent(dir, _ =>
        bloomSkipSql(f.collect()
          .map(r => (r.getLong(0), r.getLong(1))))))
    }.getOrElse(Map.empty)

  def oracle: Map[String, String] =
    lastOracleDir.map(oracleFor).getOrElse(staticOracle)

  private val staticOracle: Map[String, String] = Map(
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

    // both curves replayed independently: zvalueSql's unrolled
    // interleave + the Hilbert recursive CTE over the same scaled
    // coordinates and probes
    "curve_compare" -> {
      val B = 10
      val day = sqlDay
      s"""WITH b AS (
         |  SELECT CAST(MIN(o_custkey) AS BIGINT) AS cmin,
         |    CAST(MAX(o_custkey) AS BIGINT) AS cmax,
         |    MIN($day) AS dmin, MAX($day) AS dmax
         |  FROM orders),
         |base AS (
         |  SELECT o_orderkey AS rk, CAST(o_custkey AS BIGINT) AS c,
         |    $day AS d,
         |    ((o_custkey - cmin) * ${1L << B}) // (cmax - cmin + 1) AS sx,
         |    (($day - dmin) * ${1L << B}) // (dmax - dmin + 1) AS sy
         |  FROM orders CROSS JOIN b),
         |zc AS (
         |  SELECT rk, ${ZOrder.zvalueSql("sx", "sy", B)} AS idx
         |  FROM base),
         |hc AS ${Hilbert.hvalueRecSql(
             "SELECT rk, sx AS hx, sy AS hy FROM base", B)},
         |cells AS (
         |  SELECT 'hilbert' AS curve, (hc.h >> 13) AS cell, c, d
         |  FROM hc JOIN base USING (rk)
         |  UNION ALL
         |  SELECT 'zorder', (zc.idx >> 13), c, d
         |  FROM zc JOIN base USING (rk)),
         |stats AS (
         |  SELECT curve, cell, COUNT(*) AS n_rows,
         |    MIN(c) AS minc, MAX(c) AS maxc,
         |    MIN(d) AS mind, MAX(d) AS maxd
         |  FROM cells GROUP BY 1, 2),
         |probes(probe_id, cl, ch, dl, dh) AS (
         |  SELECT CAST(1 AS BIGINT), cmin + (cmax - cmin) * 40 // 100,
         |    cmin + (cmax - cmin) * 50 // 100,
         |    dmin + (dmax - dmin) * 40 // 100,
         |    dmin + (dmax - dmin) * 50 // 100 FROM b
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), cmin, cmax,
         |    dmin + (dmax - dmin) * 45 // 100,
         |    dmin + (dmax - dmin) * 55 // 100 FROM b
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), cmin + (cmax - cmin) * 45 // 100,
         |    cmin + (cmax - cmin) * 55 // 100, dmin, dmax FROM b),
         |tot AS (
         |  SELECT curve, CAST(COUNT(*) AS BIGINT) AS n_files_total
         |  FROM stats GROUP BY 1)
         |SELECT p.probe_id, s.curve AS curve,
         |  CAST(COUNT(*) AS BIGINT) AS n_files_touched,
         |  tot.n_files_total,
         |  CAST(SUM(s.n_rows) AS BIGINT) AS n_rows_scanned
         |FROM stats s
         |JOIN probes p ON s.minc <= p.ch AND s.maxc >= p.cl
         |  AND s.mind <= p.dh AND s.maxd >= p.dl
         |JOIN tot ON s.curve = tot.curve
         |GROUP BY 1, 2, 4
         |ORDER BY p.probe_id, s.curve""".stripMargin
    },

    // independent recursive-CTE replay of the Hilbert bit descent
    "hilbert_cells" ->
      s"""SELECT (h >> 20) AS cell, COUNT(*) AS n_orders,
         |  MIN(h) AS min_h, MAX(h) AS max_h
         |FROM ${Hilbert.hvalueRecSql(
             s"SELECT o_orderkey AS rk, CAST(o_custkey AS BIGINT) AS hx, " +
               s"$sqlDay AS hy FROM orders", ZBits)} t
         |GROUP BY 1 ORDER BY cell""".stripMargin,

    "compaction_plan" ->
      s"""WITH stats AS (
         |  SELECT ${OutputSizing.gridCellSql("o_orderkey", 256L)} AS cell,
         |    COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
         |    MAX(o_orderkey) AS max_key
         |  FROM orders GROUP BY 1),
         |cum AS (
         |  SELECT *, SUM(n_rows) OVER (ORDER BY cell
         |    ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM stats)
         |SELECT CAST(cum - n_rows AS BIGINT) // $CompactTarget AS job,
         |  CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
         |  MIN(min_key) AS min_key, MAX(max_key) AS max_key
         |FROM cum GROUP BY 1 ORDER BY job""".stripMargin,

    "zorder3_cells" ->
      s"""SELECT (z >> 24) AS cell, COUNT(*) AS n_orders,
         |  MIN(z) AS min_z, MAX(z) AS max_z
         |FROM (SELECT ${ZOrder.zvalueNSql(Seq(
              "CAST(o_custkey AS BIGINT)" -> 16, sqlDay -> 10,
              "CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)" -> 10))} AS z
         |      FROM orders)
         |GROUP BY 1 ORDER BY cell""".stripMargin,

    // independent recursive-CTE replay of the d=3 Skilling transform
    "hilbert3_cells" -> {
      val B = 8
      s"""WITH b AS (
         |  SELECT CAST(MIN(o_custkey) AS BIGINT) AS cmin,
         |    CAST(MAX(o_custkey) AS BIGINT) AS cmax,
         |    MIN($sqlDay) AS dmin, MAX($sqlDay) AS dmax,
         |    MIN(CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)) AS umin,
         |    MAX(CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)) AS umax
         |  FROM orders),
         |base AS (
         |  SELECT o_orderkey AS rk,
         |    ((o_custkey - cmin) * ${1L << B}) // (cmax - cmin + 1) AS x0,
         |    (($sqlDay - dmin) * ${1L << B}) // (dmax - dmin + 1) AS x1,
         |    ((CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) - umin)
         |      * ${1L << B}) // (umax - umin + 1) AS x2
         |  FROM orders CROSS JOIN b),
         |hc AS ${Hilbert.hvalueNRecSql(
             "SELECT rk, x0, x1, x2 FROM base", B, 3)}
         |SELECT (h >> 16) AS cell, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  MIN(h) AS min_h, MAX(h) AS max_h
         |FROM hc GROUP BY 1 ORDER BY cell""".stripMargin
    },

    // both d=3 curves replayed independently over the same scaled
    // coordinates and probes
    "curve_compare3" -> {
      val B = 7
      val day = sqlDay
      val unit = "CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)"
      s"""WITH b AS (
         |  SELECT CAST(MIN(o_custkey) AS BIGINT) AS cmin,
         |    CAST(MAX(o_custkey) AS BIGINT) AS cmax,
         |    MIN($day) AS dmin, MAX($day) AS dmax,
         |    MIN($unit) AS umin, MAX($unit) AS umax
         |  FROM orders),
         |base AS (
         |  SELECT o_orderkey AS rk, CAST(o_custkey AS BIGINT) AS c,
         |    $day AS d, $unit AS u,
         |    ((o_custkey - cmin) * ${1L << B}) // (cmax - cmin + 1) AS sx,
         |    (($day - dmin) * ${1L << B}) // (dmax - dmin + 1) AS sy,
         |    (($unit - umin) * ${1L << B}) // (umax - umin + 1) AS su
         |  FROM orders CROSS JOIN b),
         |zc AS (
         |  SELECT rk, ${ZOrder.zvalueNSql(Seq(
              "sx" -> B, "sy" -> B, "su" -> B))} AS idx
         |  FROM base),
         |hc AS ${Hilbert.hvalueNRecSql(
             "SELECT rk, sx AS x0, sy AS x1, su AS x2 FROM base", B, 3)},
         |cells AS (
         |  SELECT 'hilbert' AS curve, (hc.h >> 14) AS cell, c, d, u
         |  FROM hc JOIN base USING (rk)
         |  UNION ALL
         |  SELECT 'zorder', (zc.idx >> 14), c, d, u
         |  FROM zc JOIN base USING (rk)),
         |stats AS (
         |  SELECT curve, cell, COUNT(*) AS n_rows,
         |    MIN(c) AS minc, MAX(c) AS maxc,
         |    MIN(d) AS mind, MAX(d) AS maxd,
         |    MIN(u) AS minu, MAX(u) AS maxu
         |  FROM cells GROUP BY 1, 2),
         |probes(probe_id, cl, ch, dl, dh, ul, uh) AS (
         |  SELECT CAST(1 AS BIGINT), cmin + (cmax - cmin) * 40 // 100,
         |    cmin + (cmax - cmin) * 55 // 100,
         |    dmin + (dmax - dmin) * 40 // 100,
         |    dmin + (dmax - dmin) * 55 // 100,
         |    umin + (umax - umin) * 40 // 100,
         |    umin + (umax - umin) * 55 // 100 FROM b
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), cmin + (cmax - cmin) * 45 // 100,
         |    cmin + (cmax - cmin) * 55 // 100,
         |    dmin + (dmax - dmin) * 45 // 100,
         |    dmin + (dmax - dmin) * 55 // 100, umin, umax FROM b
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), cmin + (cmax - cmin) * 45 // 100,
         |    cmin + (cmax - cmin) * 55 // 100, dmin, dmax, umin, umax
         |  FROM b),
         |tot AS (
         |  SELECT curve, CAST(COUNT(*) AS BIGINT) AS n_files_total
         |  FROM stats GROUP BY 1)
         |SELECT p.probe_id, s.curve AS curve,
         |  CAST(COUNT(*) AS BIGINT) AS n_files_touched,
         |  tot.n_files_total,
         |  CAST(SUM(s.n_rows) AS BIGINT) AS n_rows_scanned
         |FROM stats s
         |JOIN probes p ON s.minc <= p.ch AND s.maxc >= p.cl
         |  AND s.mind <= p.dh AND s.maxd >= p.dl
         |  AND s.minu <= p.uh AND s.maxu >= p.ul
         |JOIN tot ON s.curve = tot.curve
         |GROUP BY 1, 2, 4
         |ORDER BY p.probe_id, s.curve""".stripMargin
    },
  )
}
