package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Aggregation depth — SURVEY.md §2 rows G3–G9.
  *
  * Engine-exact determinism for the statistical moments: variance /
  * stddev are derived from quantized integer power sums (exact DECIMAL
  * partials, associative and map-side combinable — the same recipe as
  * [[QueryUtil.dsum]], see its scaladoc), then finished with an
  * identical double formula in Spark and the oracle. A native
  * `stddev_samp` would differ from DuckDB in final ulps because
  * partial-aggregation order differs; exact integer partials cannot.
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // G3 + G9: min/max + exact-deterministic variance/stddev + filtered
    // (conditional) aggregates, one pass over lineitem.
    "agg_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val q = floor($"l_quantity" * lit(10000.0) + lit(0.5))
      val qd = q.cast("decimal(19,0)")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          sum(qd).cast("double").as("s1"),
          sum(qd * qd).cast("double").as("s2"),
          sum(when($"l_quantity" > 25, 1L).otherwise(0L)).as("n_bulk"),
          dsum(when($"l_discount" > 0.05, $"l_extendedprice").otherwise(lit(0.0)))
            .as("discounted_rev"))
        .select($"l_returnflag", $"n_rows", $"min_qty", $"max_qty",
          q6(($"s2" - $"s1" * $"s1" / $"n_rows") / ($"n_rows" - 1) / lit(1.0e8))
            .as("var_qty"),
          q6(sqrt(($"s2" - $"s1" * $"s1" / $"n_rows") / ($"n_rows" - 1) / lit(1.0e8)))
            .as("std_qty"),
          $"n_bulk", $"discounted_rev")
        .orderBy($"l_returnflag")
    }),

    // G3 (correlation/covariance): derived from exact quantized
    // DECIMAL cross sums — same determinism argument as agg_stats
    // (native corr/covar_samp would differ from DuckDB in final ulps).
    "agg_corr" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val qx = floor($"l_quantity" * lit(10000.0) + lit(0.5)).cast("decimal(19,0)")
      val qy = floor($"l_extendedprice" * lit(10000.0) + lit(0.5)).cast("decimal(19,0)")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          max(abs(qx)).as("qxmax"),
          max(abs(qy)).as("qymax"),
          sum(qx).cast("double").as("sx"),
          sum(qy).cast("double").as("sy"),
          sum(qx * qx).cast("double").as("sxx"),
          sum(qy * qy).cast("double").as("syy"),
          sum(qx * qy).cast("double").as("sxy"))
        .select($"l_returnflag", $"n",
          // envelope fail-fast (the agg_moments convention): within
          // n ≤ 1e9, |qx| ≤ 1e7, |qy| ≤ 3e9 every product sum stays
          // ≤ 9e27 — far under both widened-decimal lanes (Spark
          // decimal(38,0), DuckDB HUGEINT), so the integer sums are
          // provably exact; casts beyond 2^53 stay bitwise
          // cross-engine (MomentsBoundary spec)
          when($"n" > MomentsNMax || $"qxmax" > MomentsQMax ||
              $"qymax" > CorrQyMax,
            expr("raise_error('agg_corr: exactness envelope exceeded " +
              "(n > 1e9, |x| > 1e3 or |y| > 3e5); raise the " +
              "quantization unit or shard the group')").cast("double"))
            .otherwise(
              q6(($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1) / lit(1.0e8)))
            .as("covar_qty_price"),
          q6(($"n" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
              sqrt($"n" * $"syy" - $"sy" * $"sy"))).as("corr_qty_price"))
        .orderBy($"l_returnflag")
    }),

    // G3 (first/last): deterministic via min_by/max_by over the UNIQUE
    // o_orderkey (argmin/argmax over a non-unique ordinate would be
    // engine-arbitrary).
    "agg_firstlast" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          min_by($"o_totalprice", $"o_orderkey").as("first_price"),
          max_by($"o_totalprice", $"o_orderkey").as("last_price"),
          min($"o_orderkey").as("first_key"),
          max($"o_orderkey").as("last_key"))
        .orderBy($"o_orderpriority")
    }),

    // G4: exact distinct counts — single- and multi-column.
    // G23: exact per-group MODE with a deterministic tie-break —
    // Spark's builtin mode() leaves ties engine-arbitrary, so it can
    // never be hash-compared; the portable spelling is an argmax over
    // the bounded (group × value) count relation: highest count wins,
    // smallest value breaks ties. Two map-combinable aggregations —
    // the count shuffle is (group, value)-keyed and the argmax rides
    // a min_by over a (-count, value) struct ordering; window-free,
    // one pass over the counts.
    "agg_mode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val counts = Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_quantity")
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy($"l_returnflag")
        .agg(min_by($"l_quantity", struct((-$"cnt").as("nc"),
            $"l_quantity".as("v"))).as("mode_quantity"),
          max($"cnt").as("n_mode"),
          sum($"cnt").as("n_total"))
        .select($"l_returnflag", $"mode_quantity", $"n_mode", $"n_total",
          q6($"n_mode".cast("double") / $"n_total".cast("double"))
            .as("mode_share"))
        .orderBy($"l_returnflag")
    }),

    // G27: Mann–Whitney U rank-sum drift test — the third lens of the
    // drift trio (L86 PSI sees binned mass moves, G26 KS sees the max
    // CDF gap, MW sees a LOCATION shift with full rank power and no
    // normality assumption). Exactness: tie mid-ranks are exact in
    // DOUBLED integer units (2·mid = 2·cumAll − c + 1 — never a .5),
    // the rank cumulatives ride the PrefixSum two-phase running sum,
    // and 2·R1, 2·U1 and the tie term Σ(c³−c) are exact integers; the
    // tie-corrected normal z lands on the q6 grid via one identically-
    // spelled double expression, so the |z| > 1.96 decision compares
    // grid values. Envelope: 2·R1 ≤ 2N² must stay in long — N ≤ 2·10⁹
    // rows per test window, beyond which the terms move to decimals.
    "mannwhitney_drift" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      // the distinct-value relation materializes ONCE
      // (localCheckpoint): both the rank cumulatives and the
      // n1/n2/tie totals read it — Spark shares no subtree without a
      // persist, so the bare spelling re-ran the events scan + groupBy
      // per consumer (one extra full scan at 100 TB for three numbers)
      val byVal = Tables.events(s, dir)
        .select($"value", ($"ts" < split).as("inA"))
        .groupBy($"value")
        .agg(sum(when($"inA", 1L).otherwise(0L)).as("c1"),
          sum(when(!$"inA", 1L).otherwise(0L)).as("c2"))
        .withColumn("c", $"c1" + $"c2")
        .localCheckpoint()
      val cums = graft.operators.PrefixSum.withRunningSum(
        byVal, Seq.empty, $"value", $"c", "cumAll")
      val tot = broadcast(byVal.agg(sum($"c1").as("n1"),
        sum($"c2").as("n2"),
        sum($"c" * $"c" * $"c" - $"c").as("tieT")))
      val z = (($"u1x2".cast("double") / lit(2.0)) -
          $"n1".cast("double") * $"n2" / lit(2.0)) /
        sqrt($"n1".cast("double") * $"n2" / lit(12.0) *
          (($"n1" + $"n2" + lit(1L)).cast("double") -
            $"tieT".cast("double") /
              (($"n1" + $"n2").cast("double") * ($"n1" + $"n2" - lit(1L)))))
      cums.crossJoin(tot)
        .groupBy($"n1", $"n2", $"tieT")
        .agg(sum($"c1" * (lit(2L) * $"cumAll" - $"c" + lit(1L)))
          .as("r1x2"))
        .withColumn("u1x2", $"r1x2" - $"n1" * ($"n1" + lit(1L)))
        .select($"n1", $"n2", $"u1x2", $"tieT", q6(z).as("z"))
        .withColumn("reject_05",
          when(abs($"z") > lit(1.96), 1L).otherwise(0L))
    }),

    // G26: exact two-sample Kolmogorov–Smirnov drift test — the
    // distribution-shift detector next to L86's binned PSI: KS needs
    // NO bins (it is the max gap between the two empirical CDFs over
    // the merged value order), so it catches shape drift PSI's fixed
    // bins smear. Split = first half-month vs rest over events.value.
    // Exactness: per distinct value, conditional counts (c1, c2) are
    // map-combinable integers; BOTH cumulative counts ride the
    // PrefixSum two-phase running sum (range-partition + per-partition
    // window + tiny offset relation — no SinglePartition scan over the
    // value domain, the 100 TB shape); the gap maximized is the exact
    // integer |cum1·n2 − cum2·n1|. The reported statistic and the
    // α=0.05 critical value 1.358·√((n1+n2)/(n1·n2)) are q6 doubles
    // computed identically in both engines, so the reject decision is
    // a comparison of two grid values — never a raw-double compare.
    "ks_drift" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      // one events scan: the distinct-value relation (tiny — the value
      // domain) materializes once and feeds both CDF cumulatives AND
      // the n1/n2 totals (see mannwhitney_drift)
      val byVal = Tables.events(s, dir)
        .select($"value", ($"ts" < split).as("inA"))
        .groupBy($"value")
        .agg(sum(when($"inA", 1L).otherwise(0L)).as("c1"),
          sum(when(!$"inA", 1L).otherwise(0L)).as("c2"))
        .localCheckpoint()
      val cum1 = graft.operators.PrefixSum.withRunningSum(
        byVal, Seq.empty, $"value", $"c1", "cum1")
      val cums = graft.operators.PrefixSum.withRunningSum(
        cum1, Seq.empty, $"value", $"c1" + $"c2", "cumAll")
      val tot = broadcast(byVal.agg(sum($"c1").as("n1"),
        sum($"c2").as("n2")))
      val gaps = cums.crossJoin(tot)
        .select(abs($"cum1" * $"n2" - ($"cumAll" - $"cum1") * $"n1")
          .as("gap"), $"n1", $"n2")
      gaps.groupBy($"n1", $"n2")
        .agg(max($"gap").as("d_num"))
        .select($"n1", $"n2", $"d_num",
          q6($"d_num".cast("double") /
            ($"n1".cast("double") * $"n2".cast("double"))).as("ks_stat"),
          q6(lit(1.358) * sqrt(($"n1" + $"n2").cast("double") /
            ($"n1".cast("double") * $"n2".cast("double"))))
            .as("crit_05"))
        .withColumn("reject_05",
          when($"ks_stat" > $"crit_05", 1L).otherwise(0L))
    }),

    // G25: Benford first-digit forensics — the classic fabricated-data
    // audit (Benford 1938; the fraud-detection staple): the first
    // significant digit of naturally-occurring amounts follows
    // P(d) = log10(1 + 1/d); a synthetic or doctored column does not
    // (this fixture's uniform prices flunk it loudly — that IS the
    // report). Exactness: amounts quantize to integer cents via
    // floor(x·100 + 0.5) (the q-grid recipe — never engine-specific
    // rounding), and the first digit is pure integer arithmetic:
    // cents DIV 10^(len(str(cents)) − 1) — integer string length is
    // portable where double formatting is not. Shares are q6; the
    // Benford reference shares are the same ln constants both engines
    // evaluate identically. Shape: one map-combinable count keyed by
    // 9 digits; totals ride a one-row broadcast (allowlisted).
    "benford_audit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val obs = Tables.orders(s, dir)
        .filter($"o_totalprice" > 0)
        .select(floor($"o_totalprice" * lit(100.0) + lit(0.5))
          .cast("long").as("cents"))
        .select(expr("cents DIV CAST(power(10, " +
          "length(CAST(cents AS STRING)) - 1) AS BIGINT)").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n"))
      val tot = broadcast(obs.agg(sum($"n").as("total")))
      obs.crossJoin(tot)
        .select($"digit", $"n",
          q6($"n".cast("double") / $"total".cast("double"))
            .as("obs_share"),
          q6(log(lit(1.0) + lit(1.0) / $"digit".cast("double")) /
            log(lit(10.0))).as("benford_share"))
        .orderBy($"digit")
    }),

    // G24: exact Gini concentration — the one-number answer to "how
    // skewed is the mixture" that mixture owners read before L21/L79
    // rebalancing: over the bounded source domain, the Gini index of
    // token mass and of doc mass (0 = perfectly even, →1 = one source
    // carries everything). Exact: the holders relation is rank-ordered
    // ascending with a deterministic (mass, key) tiebreak and
    //   G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)
    // is computed as one LONG numerator over exact integers, finished
    // by a single q6 double division. Shape: one map-combinable
    // per-source agg over the fact table; everything after runs on the
    // source-domain relation (n = #sources) — the rank window's single
    // partition holds ≤ n rows BY CONSTRUCTION (an unbounded holder
    // domain, e.g. per-user, swaps in the PrefixSum two-phase ranking,
    // same formula).
    "gini_concentration" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      def gini(holders: DataFrame, dim: String): DataFrame =
        holders
          .withColumn("i", row_number()
            .over(Window.orderBy($"x", $"k")).cast("long"))
          .agg(count(lit(1)).as("n"), sum($"x").as("mass"),
            sum($"i" * $"x").as("ixsum"))
          .select(lit(dim).as("dimension"), $"n", $"mass",
            q6((lit(2L) * $"ixsum" - ($"n" + lit(1L)) * $"mass")
              .cast("double") / ($"n" * $"mass").cast("double"))
              .as("gini"))
      val docs = Tables.documents(s, dir)
      val tokMass = docs
        .select($"source".as("k"),
          size(split($"text", " ")).cast("long").as("t"))
        .groupBy($"k").agg(sum($"t").as("x"))
      val docMass = docs.groupBy($"source".as("k"))
        .agg(count(lit(1)).as("x"))
      gini(tokMass, "token_mass_by_source")
        .unionByName(gini(docMass, "docs_by_source"))
        .orderBy($"dimension")
    }),

    // G28: χ² independence audit — the CATEGORICAL drift lens
    // completing the numeric drift family (PSI/KS/MW/CUSUM all watch a
    // numeric column; this one asks whether two categorical factors —
    // event type and day-of-week — are independent, the standard "did
    // the traffic mix shift by weekday" audit and the classic
    // contingency-table test). Exactness: the per-cell deviation
    // obs·N − rowΣ·colΣ is an EXACT long (envelope obs·N < 2⁶³,
    // documented); the cell term dev²/(N·rowΣ·colΣ) quantizes to
    // micro-units before the order-free sum, so χ² is a grid value and
    // Cramér's V = √(χ²/(N·min(R−1, C−1))) is one identically-spelled
    // q6 double. ZERO-observation cells are included (the full R×C
    // grid comes from crossing the two bounded margin relations — a
    // cells-only sum understates χ² by exactly the missing expected
    // mass). Day-of-week is engine-neutral integer arithmetic
    // ((epoch_day + 3) mod 7, Monday = 0) — never the engines'
    // off-by-one dayofweek builtins. Shape: ONE map-combinable
    // (type, dow) count over the fact table; margins, the R×C grid
    // (≤ 35 cells) and the one-row totals are all bounded broadcasts
    // (allowlisted).
    "chi2_independence" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val obs = Tables.events(s, dir)
        .select($"event_type",
          pmod(datediff($"ts".cast("date"), to_date(lit("1970-01-01")))
            + lit(3), lit(7)).cast("long").as("dow"))
        .groupBy($"event_type", $"dow").agg(count(lit(1)).as("n"))
      val rowT = obs.groupBy($"event_type").agg(sum($"n").as("nt"))
      val colT = obs.groupBy($"dow").agg(sum($"n").as("nc"))
      val tot = broadcast(obs.agg(sum($"n").as("nn"),
        countDistinct($"event_type").as("r"),
        countDistinct($"dow").as("c")))
      val dev = $"n" * $"nn" - $"nt" * $"nc"
      val term = floor((dev.cast("double") * dev.cast("double") /
        ($"nn".cast("double") * $"nt".cast("double") *
          $"nc".cast("double"))) * lit(1000000.0) + lit(0.5))
        .cast("long")
      rowT.crossJoin(broadcast(colT))
        .join(obs, Seq("event_type", "dow"), "left_outer")
        .na.fill(0L, Seq("n"))
        .crossJoin(tot)
        .select(term.as("t"), $"nn", $"r", $"c")
        .groupBy($"nn", $"r", $"c")
        .agg((sum($"t").cast("double") / lit(1000000.0)).as("chi2"))
        .select($"nn".as("n_events"), $"r".as("n_types"),
          $"c".as("n_dows"),
          (($"r" - lit(1L)) * ($"c" - lit(1L))).as("df"), $"chi2",
          q6(sqrt($"chi2" / ($"nn".cast("double") *
            least($"r" - lit(1L), $"c" - lit(1L)).cast("double"))))
            .as("cramers_v"))
    }),

    // G29: one-way ANOVA F — the k-SAMPLE member of the drift/segment
    // family (MW/Welch compare two windows; ANOVA asks "does the
    // metric differ ACROSS the k segments at all", the gate before
    // any pairwise drill-down). Values quantize to integer cents
    // (floor(v·100 + ½) — the Benford recipe), so every group sum and
    // sum-of-squares is an EXACT long and SSB/SSW assemble from exact
    // integers in one identically-spelled double expression; F and
    // the group table are q6. Envelope: Σv_c² < 2⁶³ (cents² ~ 2.4e9
    // per row → ~4e9 rows; past it the sums move to the decimal
    // lane). Shape: ONE map-combinable per-type agg over the fact
    // table; the F assembly runs on the k-row group relation with a
    // one-row grand-total broadcast (allowlisted).
    "anova_f" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val g = Tables.events(s, dir)
        .select($"event_type",
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("v"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("ng"), sum($"v").as("sg"),
          sum($"v" * $"v").as("qg"))
      val tot = broadcast(g.agg(sum($"ng").as("nn"), sum($"sg").as("ss"),
        sum($"qg").as("qq"), count(lit(1)).as("k")))
      // SSB = Σ s_g²/n_g − S²/N, SSW = Q − Σ s_g²/n_g. The per-group
      // term s_g²/n_g is computed once per group in doubles (identical
      // IEEE ops in both engines) and FLOORED TO A LONG before the
      // cross-group sum — a raw double sum over groups would be
      // summation-order-dependent; longs are order-free (envelope
      // s_g²/n_g < 2⁶³ cents² documented)
      val j = g.crossJoin(tot)
        .groupBy($"nn", $"ss", $"qq", $"k")
        .agg(sum(floor($"sg".cast("double") * $"sg".cast("double") /
          $"ng".cast("double") + lit(0.5)).cast("long")).as("sb"))
      val ssb = $"sb".cast("double") -
        $"ss".cast("double") * $"ss".cast("double") / $"nn".cast("double")
      val ssw = $"qq".cast("double") - $"sb".cast("double")
      val f = (ssb / ($"k" - lit(1L)).cast("double")) /
        (ssw / ($"nn" - $"k").cast("double"))
      j.select($"k".as("n_groups"), $"nn".as("n_rows"),
        ($"k" - lit(1L)).as("df_between"),
        ($"nn" - $"k").as("df_within"),
        q6(ssb / lit(10000.0)).as("ss_between"),
        q6(ssw / lit(10000.0)).as("ss_within"),
        q6(f).as("f_stat"))
    }),

    // G30: Welch's unequal-variance t-test — the PARAMETRIC two-window
    // mean comparison next to G27's rank-based MW (MW sees any
    // location shift; Welch quantifies the mean difference in value
    // units with the Welch–Satterthwaite df, no equal-variance
    // assumption — the A/B-testing default). Same half-month split as
    // the drift family. Values quantize to integer cents so both
    // windows' sums/sums-of-squares are exact longs; t, df and the
    // decision are identically-spelled q6 doubles (grid compares).
    // Shape: one map-combinable two-window agg; the test is one row.
    "welch_ttest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val agg = Tables.events(s, dir)
        .select(($"ts" < split).as("inA"),
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("v"))
        .agg(
          sum(when($"inA", 1L).otherwise(0L)).as("n1"),
          sum(when($"inA", $"v").otherwise(0L)).as("s1"),
          sum(when($"inA", $"v" * $"v").otherwise(0L)).as("q1"),
          sum(when(!$"inA", 1L).otherwise(0L)).as("n2"),
          sum(when(!$"inA", $"v").otherwise(0L)).as("s2"),
          sum(when(!$"inA", $"v" * $"v").otherwise(0L)).as("q2"))
      def mean(sc: Column, n: Column) = sc.cast("double") / n.cast("double")
      // unbiased per-window variance: the sums are exact longs but the
      // n·q and s² PRODUCTS would overflow 2⁶³ at scale, so they
      // multiply in doubles — identical IEEE ops in both engines
      def va(n: Column, sc: Column, q: Column) =
        (n.cast("double") * q.cast("double") -
          sc.cast("double") * sc.cast("double")) /
          (n.cast("double") * (n - lit(1L)).cast("double"))
      val se1 = va($"n1", $"s1", $"q1") / $"n1".cast("double")
      val se2 = va($"n2", $"s2", $"q2") / $"n2".cast("double")
      // degenerate windows (n < 2) zero the variance DENOMINATOR —
      // Spark /0 yields NULL where DuckDB yields Inf/NaN — so both
      // engines report t = df = 0, spelled identically
      val degenerate = $"n1" < 2L || $"n2" < 2L
      val t = when(degenerate, lit(0.0)).otherwise(
        (mean($"s1", $"n1") - mean($"s2", $"n2")) / sqrt(se1 + se2))
      val df = when(degenerate, lit(0.0)).otherwise(
        (se1 + se2) * (se1 + se2) /
          (se1 * se1 / ($"n1" - lit(1L)).cast("double") +
            se2 * se2 / ($"n2" - lit(1L)).cast("double")))
      agg.select($"n1", $"n2",
          q6(mean($"s1", $"n1") / lit(100.0)).as("mean_a"),
          q6(mean($"s2", $"n2") / lit(100.0)).as("mean_b"),
          q6(t).as("t_stat"), q6(df).as("welch_df"))
        .withColumn("reject_05",
          when(abs($"t_stat") > lit(1.96), 1L).otherwise(0L))
    }),

    // G31: Spearman rank correlation — the MONOTONE-association
    // measure next to G3's Pearson (agg_corr): per event type, ρ
    // between the daily event count and the daily value mass over the
    // shared day axis. Rank-based, so one outlier day cannot fake or
    // break the association (the reason it is the data-audit default:
    // "does volume track spend" should not hinge on Black Friday).
    // Exactness: ties take the textbook mid-rank, carried as the
    // DOUBLED mid-rank 2·RANK() + ct − 1 (an exact integer — the G27
    // doubled-unit trick; the common 2× scale cancels in ρ), so every
    // Pearson-over-ranks sum is an exact long on the bounded day
    // relation (n ≤ days, ranks ≤ 2n — no envelope needed); ρ is one
    // identically-spelled q6 double with the degenerate-variance
    // branch (a constant series) reporting 0, the ADVICE-r12 rule.
    // Shape: one map-combinable daily agg; ranks and sums run on the
    // bounded (type × day) relation.
    "spearman_corr" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .select($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"),
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("v"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("x"), sum($"v").as("y"))
      graft.operators.SeriesStats.spearman(daily, "event_type", "x", "y")
        .select($"event_type", $"n_obs".as("n_days"), $"rho")
        .orderBy($"event_type")
    }),

    "agg_distinct" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_custkey").as("n_custs"),
          countDistinct($"o_custkey", $"o_orderstatus").as("n_cust_status"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    // G6 (rollup): per (lang, source) + per-lang subtotals + grand
    // total over documents, with grouping_id disambiguating the levels.
    "agg_rollup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .rollup($"lang", $"source")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .select($"lang", $"source", $"gid", $"n_docs", $"total_chars")
        .orderBy($"gid", $"lang".asc_nulls_first, $"source".asc_nulls_first)
    }),

    // G6 (cube): all four grouping combinations over orders.
    "agg_cube" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .cube($"o_orderpriority", $"o_orderstatus")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
        .select($"o_orderpriority", $"o_orderstatus", $"gid", $"n_orders", $"total")
        .orderBy($"gid", $"o_orderpriority".asc_nulls_first,
          $"o_orderstatus".asc_nulls_first)
    }),

    // G6 companion: pivot — rows to columns with EXPLICIT values (the
    // only 100 TB-safe spelling: value discovery would scan the input
    // twice and make the output schema data-dependent). Missing
    // (priority, status) combos fill 0 like the oracle's SUM(CASE).
    "agg_pivot" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"o_orderpriority")
    }),

    // G6 (explicit GROUPING SETS): the literal SQL spelling — rollup and
    // cube above exercise the same Expand machinery, this pins the
    // SQL-surface claim with an asymmetric set list.
    "agg_grouping_sets" -> ((s: SparkSession, dir: String) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents_gs")
      s.sql(
        """SELECT lang, source, CAST(grouping_id(lang, source) AS BIGINT) AS gid,
          |  COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
          |FROM documents_gs
          |GROUP BY GROUPING SETS ((lang, source), (lang), ())
          |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin)
    }),

    // G1/G4 under skew (SURVEY §4 scale note): exact COUNT(DISTINCT)
    // that no hot key can stall — phase 1 counts per (key, value-hash
    // salt lane), phase 2 sums the disjoint lane counts. l_returnflag
    // has 3 values over the whole table, the canonical hot-key shape.
    "skew_salted_distinct" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Salting.skewSafeCountDistinct(
        Tables.lineitem(s, dir), Seq("l_returnflag"), "l_orderkey", salts = 8)
        .orderBy($"l_returnflag")
    }),

    // G8: percentile. Spark's percentile_approx with accuracy >> n is
    // exact and returns actual data values — the same nearest-rank
    // contract as DuckDB's quantile_disc. Flattened to scalar columns
    // (array-typed outputs defeat the oracle's row sort).
    "agg_percentile" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_quantity",
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(1000000))
          .as("qs"))
        .select($"l_returnflag",
          element_at($"qs", 1).as("q25"), element_at($"qs", 2).as("q50"),
          element_at($"qs", 3).as("q75"), element_at($"qs", 4).as("q95"))
        .orderBy($"l_returnflag")
    }),

    // G18: per-group least-squares fit from EXACT integer power sums —
    // the one-pass distributed regression (price ~ quantity per
    // returnflag): slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), every
    // sum an exact quantized integer (the agg_stats recipe), the final
    // division the only double op — engine-exact, map-combinable,
    // associative. The closed form IS the scale answer: no gradient
    // loop, no driver matrix, one HashAggregate whatever n is.
    "ols_fit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val qx = floor($"l_quantity" * lit(10000.0) + lit(0.5))
        .cast("decimal(19,0)")
      val qy = floor($"l_extendedprice" * lit(10000.0) + lit(0.5))
        .cast("decimal(19,0)")
      val slope = ($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          max(abs(qx)).as("qxmax"),
          max(abs(qy)).as("qymax"),
          sum(qx).cast("double").as("sx"),
          sum(qy).cast("double").as("sy"),
          sum(qx * qy).cast("double").as("sxy"),
          sum(qx * qx).cast("double").as("sxx"))
        .select($"l_returnflag", $"n",
          // slope is unit-free (the 1e4 quantization cancels);
          // intercept carries it once. Envelope fail-fast = the
          // agg_corr convention (same lanes, same bounds).
          when($"n" > MomentsNMax || $"qxmax" > MomentsQMax ||
              $"qymax" > CorrQyMax,
            expr("raise_error('ols_fit: exactness envelope exceeded " +
              "(n > 1e9, |x| > 1e3 or |y| > 3e5); raise the " +
              "quantization unit or shard the group')").cast("double"))
            .otherwise(q6(slope)).as("slope_q6"),
          q6((($"sy" - slope * $"sx") / $"n") / lit(10000.0))
            .as("intercept_q6"))
        .orderBy($"l_returnflag")
    }),

    // G17: EXACT order statistics WITHOUT sorting the group — G8's
    // approx_percentile trades exactness for one pass; the classic
    // exact spelling (rank window over each group) sorts entire
    // groups in single tasks, which dies when a group is the whole
    // fact table. Two-pass bucket-prune selection instead: pass 1 is
    // a map-combinable (group, bucket) histogram + a tiny cumulative
    // scan over ~100 bucket rows per group that locates the bucket
    // holding the k-th value; pass 2 ranks ONLY that bucket's rows
    // (~1% of the group at SelWidth). Targets are exact integer
    // ranks — k50 = ceil(n/2), k90 = ceil(9n/10) — so the selected
    // VALUE is deterministic under ties whatever the tie order.
    "exact_median_2pass" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = Tables.lineitem(s, dir)
        .select($"l_returnflag".as("g"), $"l_extendedprice".as("v"))
      val withB = base
        .withColumn("b", floor($"v" / lit(SelWidth)).cast("long"))
      val hist = withB.groupBy($"g", $"b").agg(count(lit(1)).as("c"))
      val tot = hist.groupBy($"g").agg(sum($"c").as("n"))
      val targets = tot.select($"g", $"n",
        expr("(n + 1) DIV 2").as("k50"),
        expr("(9 * n + 9) DIV 10").as("k90"))
      val wcum = Window.partitionBy($"g").orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist
        .withColumn("bbase", coalesce(sum($"c").over(wcum), lit(0L)))
      def pick(kCol: String, label: String) =
        cum.join(targets.select($"g", col(kCol).as("k")), "g")
          .filter($"bbase" < $"k" && $"bbase" + $"c" >= $"k")
          .select($"g", lit(label).as("quantile"), $"k", $"b", $"bbase")
      val sel = pick("k50", "p50").unionAll(pick("k90", "p90"))
      val wRank = Window.partitionBy($"g", $"quantile").orderBy($"v")
      withB.join(sel, Seq("g", "b"))
        .withColumn("rn", row_number().over(wRank))
        .filter($"rn" === $"k" - $"bbase")
        .join(tot, "g")
        .select($"g".as("l_returnflag"), $"quantile", $"n".as("n_rows"),
          $"v".as("value"))
        .orderBy($"l_returnflag", $"quantile")
    }),

    // G22: engine-exact skewness / kurtosis — Spark's built-in
    // skewness()/kurtosis() are order-dependent double folds (never
    // hash-comparable across engines); this row computes both from
    // EXACT integer power sums (the agg_corr recipe extended to 3rd
    // and 4th moments): per-row micro-quantized q, then S1..S4 as
    // exact wide-integer sums (q² fits a long; q³/q⁴ ride
    // decimal(38,0) — headroom to |x| ~ 6e4 at 10⁹ rows), and the
    // central-moment algebra is the ONLY double math, spelled
    // identically in both engines on identical operands. Skew and
    // kurtosis are scale-invariant, so the ×10⁴ quantization unit
    // cancels exactly.
    "agg_moments" -> ((s: SparkSession, dir: String) =>
      momentsOf(Tables.events(s, dir), "event_type", "value")),

    // G21: exact MAD outlier audit — the ROBUST per-group outlier
    // flag (median absolute deviation resists the contamination that
    // drags mean/stddev z-scores toward the outliers they should
    // flag): med = exact group median, mad = exact median of
    // |v − med|, outlier ⇔ |v − med| > 3·MAD. Both medians ride the
    // G17 bucket-prune selection (never a group sort); the base
    // relation is scanned once per pass — the documented two-pass
    // price of exact order statistics at 100 TB. All compares are on
    // exactly-reproduced doubles (picked medians, IEEE subtraction),
    // so the flag is engine-exact; the oracle is the independent
    // full-window spelling of both medians.
    "mad_outliers" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // events.value is the fixture's heavy-tailed measure (the
      // uniform price columns never exceed 3·MAD — max deviation on
      // a uniform is 2·MAD — so they cannot exercise the flag)
      val base = Tables.events(s, dir)
        .select($"event_type".as("g"), $"value".as("v"))
      val med = bucketMedian(base, width = 4.0)
      val dev = base.join(med, "g").withColumn("dv", abs($"v" - $"med"))
      val mad = bucketMedian(dev.select($"g", $"dv".as("v")), width = 4.0)
        .withColumnRenamed("med", "mad")
      val isOut = $"dv" > lit(3.0) * $"mad"
      dev.join(mad, "g")
        .groupBy($"g", $"med", $"mad")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
          dsum(when(isOut, $"v").otherwise(0.0)).as("outlier_mass"))
        .select($"g".as("event_type"), $"n_rows", $"med", $"mad",
          $"n_outliers", $"outlier_mass")
        .orderBy($"event_type")
    }),

    // G19: EXACT weighted order statistic without a group sort — the
    // skew-robust "typical price" where each row carries a weight
    // (shipped quantity): min v with cumweight(≤ v) ≥ ⌈(W+1)/2⌉,
    // deterministic under value ties whatever the tie order. Same
    // bucket-prune selection as G17 generalized to weights: pass 1 =
    // map-combinable (group, bucket) WEIGHT histogram + the bounded
    // ~100-bucket cum scan locating the target bucket; pass 2
    // aggregates only that bucket's per-VALUE weight sums (the value
    // window runs over one bucket's distinct values, never the
    // group). Integer weights (the dsum quantization of quantity)
    // make target and crossing engine-exact; the oracle is the
    // independent full-window spelling over every value.
    "weighted_median_2pass" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = Tables.lineitem(s, dir)
        .select($"l_returnflag".as("g"), $"l_extendedprice".as("v"),
          floor($"l_quantity" * lit(10000.0) + lit(0.5)).cast("long")
            .as("wt"))
      val withB = base.withColumn("b", floor($"v" / lit(SelWidth)).cast("long"))
      val hist = withB.groupBy($"g", $"b").agg(sum($"wt").as("c"))
      val tot = hist.groupBy($"g").agg(sum($"c").as("w"))
      val targets = tot.select($"g", $"w", expr("(w + 1) DIV 2").as("k"))
      val wcum = Window.partitionBy($"g").orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sel = hist
        .withColumn("bbase", coalesce(sum($"c").over(wcum), lit(0L)))
        .join(targets, "g")
        .filter($"bbase" < $"k" && $"bbase" + $"c" >= $"k")
        .select($"g", $"k", $"b", $"bbase")
      val wv = Window.partitionBy($"g").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withB.join(sel, Seq("g", "b"))
        .groupBy($"g", $"v", $"k", $"bbase").agg(sum($"wt").as("wv"))
        .withColumn("cw", sum($"wv").over(wv))
        .filter($"cw" >= $"k" - $"bbase")
        .groupBy($"g").agg(min($"v").as("wmedian"))
        .join(tot, "g")
        .select($"g".as("l_returnflag"), $"w".as("total_weight"),
          $"wmedian")
        .orderBy($"l_returnflag")
    }),

    // G7: group → sorted array, serialized to a stable string (both
    // engines agree on a comma-joined sorted set; raw array compare
    // would hinge on engine-internal ordering).
    "agg_collect" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"lang")
        .agg(
          array_join(sort_array(collect_set($"source")), ",").as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy($"lang")
    }),

    // G10: equal-width numeric histogram — the profiling aggregate
    // behind every "distribution of X" question. min/max ride a
    // one-row broadcast (the scalar-subquery shape); the bin id is
    // pure per-row IEEE arithmetic with identical expression shape in
    // both engines (floor is exact; the top edge folds into the last
    // bin via least), so the histogram is engine-exact. Scale shape:
    // one all-partition min/max agg (two doubles) + one map-side-
    // combinable count keyed by the 10-valued bin id.
    "agg_histogram" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bounds = broadcast(Tables.orders(s, dir)
        .agg(min($"o_totalprice").as("mn"), max($"o_totalprice").as("mx")))
      Tables.orders(s, dir)
        .select($"o_totalprice")
        .crossJoin(bounds)
        .select(least(floor(($"o_totalprice" - $"mn") * lit(10.0) /
          ($"mx" - $"mn")), lit(9L)).as("bin"))
        .groupBy($"bin").agg(count(lit(1)).as("n_orders"))
        .orderBy($"bin")
    }),

    // G14: equi-depth histogram — the NDV-aware companion of the
    // equal-width G10: per group, 8 buckets holding ~n/8 rows each.
    // Two-pass shape that survives scale: pass 1 derives the 7
    // interior cut points as DISCRETE order statistics (value at rank
    // ceil(j/8·n) — the L47 ceil-index recipe, value-at-rank is
    // deterministic under ties because the sorted price multiset is;
    // the rank window runs per bounded stratum at test scale and is
    // the one piece a 100 TB run swaps for approx_percentile — the
    // binning pass below stays EXACT whatever produced the cuts).
    // Pass 2 is map-side only: one broadcast join of the 3-row cut
    // table, bucket = 1 + Σ (price > c_j) in pure integer arithmetic,
    // then a map-combinable count — the fact table is never globally
    // sorted.
    "agg_histogram_eqdepth" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      eqDepthHistogram(s, dir).orderBy($"flag", $"bucket")
    }),

    // G15: histogram-driven selectivity bounds — the reason an
    // optimizer keeps G14's histogram: estimate |price <= C| per
    // group from bucket stats alone. Buckets wholly below C give the
    // certain LOWER bound; straddling buckets add their full count
    // for the UPPER bound; the true count must sit inside [lo, hi] BY
    // CONSTRUCTION — and that containment is what the driver checks
    // (both bounds, the actual, and the bucket stats are all exact
    // integers). Shape: the G14 two-pass histogram + one
    // map-combinable conditional agg over its 24-row output + the
    // exact count (one scan).
    "selectivity_bounds" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cutoff = 50000.0
      val hist = eqDepthHistogram(s, dir)
      val bounds = hist.groupBy($"flag")
        .agg(sum(when($"max_price" <= cutoff, $"n_rows").otherwise(0L))
          .as("lower_est"),
          sum(when($"min_price" <= cutoff, $"n_rows").otherwise(0L))
            .as("upper_est"))
      val actual = Tables.lineitem(s, dir)
        .filter($"l_extendedprice" <= cutoff)
        .groupBy($"l_returnflag".as("flag"))
        .agg(count(lit(1)).as("actual"))
      bounds.join(actual, Seq("flag"), "left")
        .select($"flag", coalesce($"actual", lit(0L)).as("actual"),
          $"lower_est", $"upper_est")
        .orderBy($"flag")
    }),

    // G11: one-pass table profile — the ANALYZE-style data-quality
    // snapshot (row count, per-column non-null counts, exact distinct
    // cardinalities, numeric/date ranges) a pipeline runs before
    // trusting a new snapshot. Multiple exact distincts in one agg
    // plan via Spark's Expand (rows × #distinct-columns shuffle of
    // slim (gid, key) tuples) — one logical pass, map-side partials,
    // no driver state.
    "column_profile" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count($"o_custkey").as("nn_custkey"),
        count_distinct($"o_custkey").as("ndv_custkey"),
        count_distinct($"o_orderstatus").as("ndv_status"),
        count_distinct($"o_orderpriority").as("ndv_priority"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"),
        min($"o_orderdate").as("min_date"),
        max($"o_orderdate").as("max_date"))
    }),

    // G13: exact join-size estimate — |orders ⋈ lineitem| on the key
    // WITHOUT running the join: Σ_k cA(k)·cB(k) over the two key-count
    // relations. The planner statistic behind broadcast/skew/AQE
    // decisions, and the guard a pipeline runs before a join it
    // suspects is quadratic (pairs with G12's spectrum). Two
    // partial-aggregated counts + one join of count relations
    // (distinct keys, not rows) + one scalar sum.
    "join_size_estimate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ca = Tables.orders(s, dir)
        .groupBy($"o_orderkey".as("k")).agg(count(lit(1)).as("ca"))
      val cb = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("cb"))
      ca.join(cb, "k")
        .agg(sum($"ca" * $"cb").as("join_rows"),
          count(lit(1)).as("matched_keys"),
          max($"ca" * $"cb").as("max_key_contrib"))
    }),

    // G12: join-key skew spectrum — the diagnosis query behind every
    // salting / broadcast / AQE-skew decision: for each multiplicity
    // m, how many l_orderkey values occur m times. Two partial-
    // aggregated shuffles, output bounded by distinct multiplicities
    // (tiny); the tail of this relation IS the skew report (a key at
    // m = 10^6 means a 10^12-row join blowup on that key).
    "key_skew_spectrum" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("mult"))
        .groupBy($"mult").agg(count(lit(1)).as("n_keys"))
        .orderBy($"mult")
    }),
  )

  /** G5: HLL approximate distinct. The sketch itself is not
    * DuckDB-replicable (different algorithm), so the estimate rides
    * into the oracle as an interpolated literal while everything
    * checkable IS checked: the query also emits the exact distinct
    * count and a `within_bound` flag (|approx − exact| ≤ 3·rsd·exact,
    * rsd = 0.02), and [[oracleFor]] replays the exact count, the row
    * count, AND the bound check from DuckDB's own COUNT(DISTINCT) —
    * so a drifting estimate flips `within_bound` on the oracle side
    * and fails the hash compare. AggregatesSpec asserts the bound
    * directly as well. */
  val approxQueries: Map[String, Q] = Map(
    "agg_approx" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          approx_count_distinct($"o_custkey", 0.02).as("approx_custs"),
          countDistinct($"o_custkey").as("exact_custs"),
          count(lit(1)).as("n_orders"))
      approxFrameCache.get(s, dir)(
        _ => base.select($"o_orderpriority", $"approx_custs"))
      lastOracleDir = Some(dir)
      base
        .withColumn("within_bound",
          abs($"approx_custs" - $"exact_custs") <=
            lit(ApproxBoundFactor) * $"exact_custs")
        .orderBy($"o_orderpriority")
    }),

    // G16: count-min sketch — the mergeable point-frequency sketch
    // (Cormode & Muthukrishnan, J. Algorithms 2005) next to the HLL
    // (G5: distinct), Misra–Gries (L36: heavy hitters), and Bloom
    // (L34: membership) family members. The sketch IS a DataFrame —
    // one map-combinable count per (row, bucket) cell over d seeded
    // FNV lanes — so updates distribute and two sketches merge by
    // adding cells; estimates = MIN over a key's d cells. Output: the
    // top-20 keys' exact count, estimate, and the CMS contract check
    // (est ≥ exact always; overshoot ≤ 3·N/w here) — the oracle
    // replays probe selection, exact counts, N, and the bound from
    // the engine's interpolated estimates (the agg_approx pattern;
    // the hash itself is the only non-replayable piece).
    "cms_freq" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      def cellArr = cmsCellArr _
      val li = Tables.lineitem(s, dir).select($"l_partkey")
      val cells = li.select(cellArr($"l_partkey").as("cell"))
        .groupBy($"cell.r".as("r"), $"cell.b".as("b"))
        .agg(count(lit(1)).as("c"))
      val exact = li.groupBy($"l_partkey").agg(count(lit(1)).as("exact_cnt"))
      val probes = exact.orderBy($"exact_cnt".desc, $"l_partkey")
        .limit(CmsProbeK)
      val total = li.agg(count(lit(1)).as("n"))
      val out = probes
        .select($"l_partkey", $"exact_cnt", cellArr($"l_partkey").as("cell"))
        .select($"l_partkey", $"exact_cnt",
          $"cell.r".as("r"), $"cell.b".as("b"))
        .join(cells, Seq("r", "b"))
        .groupBy($"l_partkey", $"exact_cnt")
        .agg(min($"c").as("est_cnt"))
        .crossJoin(broadcast(total))
        .withColumn("within_bound",
          when($"est_cnt" >= $"exact_cnt" &&
            $"est_cnt" <= $"exact_cnt" + expr(s"(3 * n) DIV $CmsWidth"),
            1L).otherwise(0L))
        .select($"l_partkey", $"exact_cnt", $"est_cnt", $"within_bound")
        .orderBy($"exact_cnt".desc, $"l_partkey")
      cmsFrameCache.get(s, dir)(
        _ => out.select($"l_partkey", $"est_cnt"))
      lastOracleDir = Some(dir)
      out
    }),

    // G20: KMV / theta sketch — the DISTINCT-INTERSECTION member of
    // the sketch family (Beyer et al., SIGMOD'07), the one HLL cannot
    // give: inclusion–exclusion over per-set HLLs loses all precision
    // when the overlap is small relative to the union, while KMV
    // estimates the intersection directly. Sketch = each set's k
    // smallest distinct hash values in UNSIGNED order (the sign bit
    // flipped so BoundedMinSetAgg's signed minima ARE unsigned
    // minima); for a pair, θ = min of the two k-th values, estimate =
    // |{common values < θ}| / frac(θ). Sketches are mergeable
    // (bounded_min_set of a union = min-merge), k·8 bytes per source
    // whatever the corpus. Output per source pair: exact token
    // overlap (computed exactly by a vocab-keyed join — also in the
    // engine), the KMV estimate, and a bound flag; the oracle replays
    // exact overlaps and the bound check from the interpolated
    // micro-integer estimates (the cms_freq pattern — the seeded
    // hash is the only non-replayable piece).
    "kmv_overlap" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // universe = word-3-gram shingle hashes (the near-dup identity;
      // per-source gram vocabularies run ~1.1–1.5k at sf0.01, so the
      // k=256 sketches are genuinely in estimator mode there)
      val th = Tables.documents(s, dir)
        .select($"source",
          explode(graft.functions.GraftFunctions.shingle_hash_set($"text"))
            .as("h0"))
        .distinct()
      val hashed = th.select($"source",
        $"h0".bitwiseXOR(lit(Long.MinValue)).as("h"))
      val sk = hashed.groupBy($"source")
        .agg(graft.functions.GraftFunctions.bounded_min_set($"h", KmvK)
          .as("sk"))
        .select($"source", $"sk.cnt".as("nd"), $"sk.ids".as("ids"))
      def theta(nd: Column, ids: Column): Column =
        when(nd <= KmvK.toLong, lit(Long.MaxValue))
          .otherwise(element_at(ids, KmvK))
      def frac(c: Column): Column =
        (c.cast("double") + lit(9.223372036854776E18)) /
          lit(1.8446744073709552E19)
      val a = sk.select($"source".as("src_a"), $"nd".as("nd_a"),
        $"ids".as("ids_a"))
      val b = sk.select($"source".as("src_b"), $"nd".as("nd_b"),
        $"ids".as("ids_b"))
      val est = a.join(b, $"src_a" < $"src_b") // bounded source-domain cross
        .withColumn("theta",
          least(theta($"nd_a", $"ids_a"), theta($"nd_b", $"ids_b")))
        .withColumn("common",
          size(filter(array_intersect($"ids_a", $"ids_b"),
            x => x < $"theta")).cast("long"))
        .withColumn("est_micro",
          floor($"common".cast("double") / frac($"theta") * lit(1000000.0) +
            lit(0.5)).cast("long"))
        .select($"src_a", $"src_b", $"est_micro")
      val exact = th.select($"source".as("src_a"), $"h0")
        .join(th.select($"source".as("src_b"), $"h0"), "h0")
        .filter($"src_a" < $"src_b")
        .groupBy($"src_a", $"src_b")
        .agg(count(lit(1)).as("exact_overlap"))
      val out = exact.join(est, Seq("src_a", "src_b"))
        .withColumn("within_bound",
          when(abs($"est_micro".cast("double") / lit(1000000.0) -
            $"exact_overlap".cast("double")) <=
            greatest(lit(KmvBoundRel) * $"exact_overlap".cast("double"),
              lit(KmvBoundRel) * ($"est_micro".cast("double") /
                lit(1000000.0))) + lit(KmvBoundAbs), 1L).otherwise(0L))
        .select($"src_a", $"src_b", $"exact_overlap", $"est_micro",
          $"within_bound")
        .orderBy($"src_a", $"src_b")
      kmvFrameCache.get(s, dir)(
        _ => out.select($"src_a", $"src_b", $"est_micro"))
      lastOracleDir = Some(dir)
      out
    }),
  )

  /** G17 bucket width for the two-pass exact selection: the
    * l_extendedprice domain (~[900, 105k] at every sf) spans ~100
    * buckets, so pass 2 ranks ~1% of each group instead of all of it. */
  private val SelWidth = 1024.0

  /** Exact lower-median per group via the G17 bucket-prune selection
    * — (group, bucket) histogram + bounded cum scan locates the
    * target bucket, then only THAT bucket's rows are ranked (the
    * value window spans ~1/width of the group, never the group).
    * Input (g, v) → output (g, med). `width` must match the input's
    * domain or every row lands in one bucket and pass 2 degenerates
    * to the group sort this recipe exists to avoid — callers pick it
    * per column (SelWidth for the ~1e5-range price columns, ~4 for
    * events.value's 0–490). */
  private def bucketMedian(df: DataFrame, width: Double): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val withB = df.withColumn("b", floor($"v" / lit(width)).cast("long"))
    val hist = withB.groupBy($"g", $"b").agg(count(lit(1)).as("c"))
    val targets = hist.groupBy($"g").agg(sum($"c").as("n"))
      .select($"g", expr("(n + 1) DIV 2").as("k"))
    val wcum = Window.partitionBy($"g").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sel = hist
      .withColumn("bbase", coalesce(sum($"c").over(wcum), lit(0L)))
      .join(targets, "g")
      .filter($"bbase" < $"k" && $"bbase" + $"c" >= $"k")
      .select($"g", $"k", $"b", $"bbase")
    val wRank = Window.partitionBy($"g").orderBy($"v")
    withB.join(sel, Seq("g", "b"))
      .withColumn("rn", row_number().over(wRank))
      .filter($"rn" === $"k" - $"bbase")
      .select($"g", $"v".as("med"))
  }

  /** CMS shape: d seeded FNV lanes × w buckets. w = 2048 keeps the
    * additive overshoot bound 3·N/w comfortably above the fixture's
    * collision noise at every sf while the sketch (d·w cells) stays
    * ~100× smaller than the sf0.1 key space. */
  private val CmsDepth = 4
  private val CmsWidth = 2048L
  private val CmsProbeK = 20

  /** The CMS update: a key's d (row, bucket) cells. Shared by
    * `cms_freq` and its streaming twin (StreamingCurationSpec) — the
    * sketch is a plain streaming-aggregable relation, so incremental
    * maintenance is just `groupBy(r, b).count` in update/complete
    * mode. */
  private[graft] def cmsCellArr(key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    explode(array((1 to CmsDepth).map(i =>
      struct(lit(i).as("r"),
        pmod(graft.functions.GraftFunctions.fnv1a_seeded(i.toLong, key),
          lit(CmsWidth)).as("b"))): _*))

  private val cmsFrameCache = new SessionCache[DataFrame]
  private val cmsSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** G20 KMV shape: k = 256 minima per source (2 KiB/sketch) gives
    * rse ≈ 1/√(k−2) ≈ 6% on the UNION; the INTERSECTION estimator
    * conditions on the |common < θ| sample count, which at the
    * fixture's smallest overlaps is ~5 samples — so the contract band
    * is wide and symmetric (50% of max(exact, est) + 40 absolute;
    * worst observed across all sfs needs ~0.5·exact + 21). At corpus
    * scale the production setting (k = 4096, overlaps in the
    * thousands) tightens the same estimator to a few percent — k is
    * the knob, the shuffle shape does not change. */
  private val KmvK = 256
  private val KmvBoundRel = 0.5
  private val KmvBoundAbs = 40.0

  private val kmvFrameCache = new SessionCache[DataFrame]
  private val kmvSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DuckDB mirror of `kmv_overlap`: the engine's micro-integer
    * estimates as VALUES literals; exact overlaps and the bound check
    * recomputed from DuckDB's own distinct-token join. */
  private def kmvOverlapSql(rows: Array[(String, String, Long)]): String = {
    val vals = rows.sortBy(r => (r._1, r._2))
      .map { case (a, b, m) => s"('$a', '$b', $m)" }.mkString(",\n    ")
    s"""WITH est(src_a, src_b, est_micro) AS (VALUES
       |    $vals),
       |sh AS (
       |  SELECT source,
       |    CASE WHEN len(ws) >= 3 THEN
       |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                     for i in range(1, len(ws) - 1)])
       |    ELSE [text] END AS s
       |  FROM (SELECT source, text, string_split(text, ' ') AS ws
       |        FROM documents)),
       |d AS (SELECT DISTINCT source, unnest(s) AS g FROM sh),
       |ov AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    CAST(COUNT(*) AS BIGINT) AS exact_overlap
       |  FROM d a JOIN d b ON a.g = b.g AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT o.src_a, o.src_b, o.exact_overlap,
       |  CAST(e.est_micro AS BIGINT) AS est_micro,
       |  CASE WHEN ABS(CAST(e.est_micro AS DOUBLE) / 1000000.0 -
       |      CAST(o.exact_overlap AS DOUBLE)) <=
       |      GREATEST($KmvBoundRel * CAST(o.exact_overlap AS DOUBLE),
       |        $KmvBoundRel * (CAST(e.est_micro AS DOUBLE) / 1000000.0))
       |      + $KmvBoundAbs
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
       |    AS within_bound
       |FROM ov o JOIN est e ON o.src_a = e.src_a AND o.src_b = e.src_b
       |ORDER BY o.src_a, o.src_b""".stripMargin
  }

  /** DuckDB mirror of `cms_freq`: the engine's estimates as VALUES
    * literals; probe selection, exact counts, N, and the bound check
    * recomputed from DuckDB's own aggregation. */
  private def cmsFreqSql(rows: Array[(Long, Long)]): String = {
    val vals = rows.sortBy(_._1)
      .map { case (k, e) => s"($k, $e)" }.mkString(",\n    ")
    s"""WITH est(l_partkey, est_cnt) AS (VALUES
       |    $vals),
       |ex AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
       |  FROM lineitem GROUP BY 1),
       |probes AS (SELECT l_partkey, exact_cnt FROM ex
       |  ORDER BY exact_cnt DESC, l_partkey LIMIT $CmsProbeK),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
       |SELECT p.l_partkey, p.exact_cnt, CAST(est.est_cnt AS BIGINT) AS est_cnt,
       |  CASE WHEN est.est_cnt >= p.exact_cnt
       |    AND est.est_cnt <= p.exact_cnt + (3 * n) // $CmsWidth
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS within_bound
       |FROM probes p JOIN est USING (l_partkey) CROSS JOIN tot
       |ORDER BY exact_cnt DESC, l_partkey""".stripMargin
  }

  /** 3·rsd with rsd = 0.02 — the SAME double literal the oracle SQL
    * casts from, so both engines compare against bit-identical
    * thresholds. */
  /** Exactness-envelope bounds for the power-sum aggregate family
    * (agg_moments / agg_corr / ols_fit): within n ≤ MomentsNMax rows
    * per group and micro-quantized magnitudes ≤ MomentsQMax (value/x
    * lane, |v| ≤ 1e3) / CorrQyMax (price lane, |y| ≤ 3e5), every
    * integer power sum stays ≥ 10× under its exact lane's cap (Spark
    * widened decimal, DuckDB HUGEINT) — provably no silent overflow —
    * and the only inexact step left is the final correctly-rounded
    * decimal→double cast, bitwise equal across engines
    * (MomentsBoundary spec pins the 2^53 boundary). Violations
    * raise_error in-query instead of silently degrading. */
  private[graft] val MomentsNMax = 1000000000L
  private[graft] val MomentsQMax = 10000000L
  private[graft] val CorrQyMax = 3000000000L

  /** The G22 power-sum moments pipeline over (group, value), shared
    * by `agg_moments` and MomentsBoundarySpec so the envelope test
    * exercises the exact production spelling: micro-quantized q,
    * exact integer power sums S1..S4 (q² long, q³/q⁴ decimal(38,0)),
    * central-moment algebra as the ONLY double math. The
    * exactness-envelope fail-fast is woven into the kept `mean`
    * column (never prunable): within n ≤ 1e9 and |q| ≤ 1e7 the q⁴
    * sum is ≤ 1e37 — the decimal(38,0) lane is provably exact — and
    * the decimal→double casts beyond 2^53 stay bitwise cross-engine
    * because both engines round correctly to nearest-even
    * (MomentsBoundarySpec pins Spark to the IEEE reference at the
    * boundary; the oracle gate exercises ~1e22 sums). Outside the
    * envelope: raise the quantization unit or shard the group. */
  private[graft] def momentsOf(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val q = floor(col(valueCol) * lit(10000.0) + lit(0.5)).cast("long")
    val qd = q.cast("decimal(38,0)")
    val q2 = (q * q).cast("decimal(38,0)")
    val base = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(abs(q)).as("qmax"),
        sum(qd).cast("double").as("s1"),
        sum(q2).cast("double").as("s2"),
        sum(q2 * qd).cast("double").as("s3"),
        sum(q2 * q2).cast("double").as("s4"))
    val nD = $"n".cast("double")
    val mu = $"s1" / nD
    val m2 = $"s2" / nD - mu * mu
    val m3 = $"s3" / nD - lit(3.0) * mu * ($"s2" / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = $"s4" / nD - lit(4.0) * mu * ($"s3" / nD) +
      lit(6.0) * mu * mu * ($"s2" / nD) -
      lit(3.0) * mu * mu * mu * mu
    val guarded = when(
      $"n" > MomentsNMax || $"qmax" > MomentsQMax,
      expr("raise_error('agg_moments: exactness envelope exceeded " +
        "(n > 1e9 or |value| > 1e3); raise the quantization unit or " +
        "shard the group')").cast("double"))
      .otherwise(q6(mu / lit(10000.0)))
    base.select(col(groupCol), $"n",
      guarded.as("mean"),
      q6(m3 / (m2 * sqrt(m2))).as("skew_q6"),
      q6(m4 / (m2 * m2) - lit(3.0)).as("kurt_q6"))
      .orderBy(col(groupCol))
  }

  private val ApproxBoundFactor = 0.06

  private val approxFrameCache = new SessionCache[DataFrame]
  private val approxSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var lastOracleDir: Option[String] = None

  /** DuckDB mirror of `agg_approx`: the engine's HLL estimates as
    * VALUES literals; exact counts, row counts, and the 3·rsd bound
    * check recomputed from DuckDB's own aggregation. */
  private def aggApproxSql(rows: Array[(String, Long)]): String = {
    val vals = rows.sortBy(_._1)
      .map { case (p, a) => s"('$p', $a)" }.mkString(",\n    ")
    s"""WITH est(o_orderpriority, approx_custs) AS (VALUES
       |    $vals),
       |ex AS (SELECT o_orderpriority,
       |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       |    CAST(COUNT(*) AS BIGINT) AS n_orders
       |  FROM orders GROUP BY 1)
       |SELECT ex.o_orderpriority, CAST(est.approx_custs AS BIGINT) AS approx_custs,
       |  ex.exact_custs, ex.n_orders,
       |  abs(est.approx_custs - ex.exact_custs)
       |    <= CAST($ApproxBoundFactor AS DOUBLE) * ex.exact_custs AS within_bound
       |FROM ex JOIN est USING (o_orderpriority)
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** [[staticOracle]] plus the data-dependent `agg_approx` entry for
    * `dir`, present once that dir's query has been constructed (which
    * warms its cache) — the Pipeline.oracleFor contract. */
  def oracleFor(dir: String): Map[String, String] =
    staticOracle ++ approxFrameCache.peek(dir).map { f =>
      Map("agg_approx" -> approxSqlCache.computeIfAbsent(dir, _ =>
        aggApproxSql(f.collect()
          .map(r => (r.getString(0), r.getLong(1))))))
    }.getOrElse(Map.empty) ++ cmsFrameCache.peek(dir).map { f =>
      Map("cms_freq" -> cmsSqlCache.computeIfAbsent(dir, _ =>
        cmsFreqSql(f.collect()
          .map(r => (r.getLong(0), r.getLong(1))))))
    }.getOrElse(Map.empty) ++ kmvFrameCache.peek(dir).map { f =>
      Map("kmv_overlap" -> kmvSqlCache.computeIfAbsent(dir, _ =>
        kmvOverlapSql(f.collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))))))
    }.getOrElse(Map.empty)

  def oracle: Map[String, String] =
    lastOracleDir.map(oracleFor).getOrElse(staticOracle)

  /** The G14 two-pass equi-depth histogram shared by
    * `agg_histogram_eqdepth` and `selectivity_bounds`:
    * (flag, bucket, n_rows, min_price, max_price), 8 buckets per
    * l_returnflag over l_extendedprice. Pass 1 derives the 7 interior
    * cut points as discrete order statistics (the L47 ceil-index
    * recipe — value-at-rank is deterministic under ties); pass 2 bins
    * map-side against the broadcast cut table. */
  private def eqDepthHistogram(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
      .select($"l_returnflag".as("flag"), $"l_extendedprice".as("price"))
    // The 7 interior cut points are DISCRETE order statistics (value
    // at rank ⌈j/8·n⌉), located with the bucketMedian two-pass instead
    // of a whole-partition rank window: pass 1 is a map-combinable
    // (flag, bucket) count histogram + the bounded cum scan that finds
    // each target rank's bucket; the rank window then runs over the
    // LOCATED buckets only (~1% of the group at SelWidth), never the
    // group — same cut values (order statistics are
    // algorithm-independent; bucket-local rank = global rank − bbase
    // because floor(price/width) is monotone in price), the
    // exact_median_2pass / weighted_median_2pass scale shape.
    val withB = li.withColumn("b", floor($"price" / lit(SelWidth)).cast("long"))
    val hist = withB.groupBy($"flag", $"b").agg(count(lit(1)).as("c"))
    val targets = hist.groupBy($"flag").agg(sum($"c").as("n"))
      .select($"flag", explode(array((1 to 7).map(j =>
        struct(lit(j).as("j"), greatest(lit(1L),
          ceil(lit(j / 8.0) * $"n").cast("long")).as("k"))): _*)).as("t"))
      .select($"flag", $"t.j".as("j"), $"t.k".as("k"))
    val wcum = Window.partitionBy($"flag").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val located = hist
      .withColumn("bbase", coalesce(sum($"c").over(wcum), lit(0L)))
      .join(targets, "flag")
      .filter($"bbase" < $"k" && $"bbase" + $"c" >= $"k")
      .select($"flag", $"j", $"k", $"b", $"bbase")
    val wRank = Window.partitionBy($"flag", $"b").orderBy($"price")
    val cutRows = withB
      .join(broadcast(located.select($"flag", $"b").distinct()),
        Seq("flag", "b"))
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .join(broadcast(located), Seq("flag", "b"))
      .filter($"rn" === $"k" - $"bbase")
      .select($"flag", $"j", $"price")
    val cutCols = (1 to 7).map { j =>
      max(when($"j" === j, $"price")).as(s"c$j")
    }
    val cuts = broadcast(
      cutRows.groupBy($"flag").agg(cutCols.head, cutCols.tail: _*))
    val bucket = (1 to 7)
      .map(j => ($"price" > col(s"c$j")).cast("int"))
      .reduce(_ + _) + lit(1)
    li.join(cuts, "flag")
      .select($"flag", bucket.as("bucket"), $"price")
      .groupBy($"flag", $"bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"price").as("min_price"), max($"price").as("max_price"))
  }

  /** Shared DuckDB CTE chain of the G14 histogram (`d`, `r`, `cw`,
    * `h`) — one spelling for the histogram oracle and the
    * selectivity-bounds oracle so cut points cannot drift. */
  private val eqDepthCtes: String = {
    val cutSelects = (1 to 7).map { j =>
      s"""    MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(${j / 8.0} * n)
         |      AS BIGINT)) THEN price END) AS c$j""".stripMargin
    }.mkString(",\n")
    val bucketExpr = (1 to 7)
      .map(j => s"CAST(price > c$j AS INT)").mkString(" + ")
    s"""d AS (
       |  SELECT l_returnflag AS flag, l_extendedprice AS price
       |  FROM lineitem),
       |r AS (
       |  SELECT flag, price,
       |    CAST(row_number() OVER (PARTITION BY flag ORDER BY price)
       |      AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY flag) AS BIGINT) AS n
       |  FROM d),
       |cw AS (
       |  SELECT flag,
       |$cutSelects
       |  FROM r GROUP BY flag),
       |h AS (
       |  SELECT d.flag, 1 + $bucketExpr AS bucket,
       |    COUNT(*) AS n_rows, MIN(price) AS min_price,
       |    MAX(price) AS max_price
       |  FROM d JOIN cw ON d.flag = cw.flag
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val staticOracle: Map[String, String] = Map(
    "join_size_estimate" ->
      """WITH ca AS (SELECT o_orderkey AS k, COUNT(*) AS ca
        |            FROM orders GROUP BY 1),
        |cb AS (SELECT l_orderkey AS k, COUNT(*) AS cb
        |       FROM lineitem GROUP BY 1)
        |SELECT CAST(SUM(ca * cb) AS BIGINT) AS join_rows,
        |  COUNT(*) AS matched_keys,
        |  CAST(MAX(ca * cb) AS BIGINT) AS max_key_contrib
        |FROM ca JOIN cb USING (k)""".stripMargin,

    "key_skew_spectrum" ->
      """SELECT mult, COUNT(*) AS n_keys FROM (
        |  SELECT l_orderkey, COUNT(*) AS mult
        |  FROM lineitem GROUP BY 1)
        |GROUP BY 1 ORDER BY mult""".stripMargin,

    "column_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(o_custkey) AS nn_custkey,
        |  COUNT(DISTINCT o_custkey) AS ndv_custkey,
        |  COUNT(DISTINCT o_orderstatus) AS ndv_status,
        |  COUNT(DISTINCT o_orderpriority) AS ndv_priority,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  CAST(MIN(o_orderdate) AS TIMESTAMP) AS min_date,
        |  CAST(MAX(o_orderdate) AS TIMESTAMP) AS max_date
        |FROM orders""".stripMargin,

    // identical per-row arithmetic: (x - mn) * 10.0 / (mx - mn),
    // floored, top edge folded into bin 9
    "agg_histogram" ->
      """WITH b AS (
        |  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        |  FROM orders)
        |SELECT LEAST(CAST(FLOOR((o_totalprice - mn) * 10.0 / (mx - mn))
        |    AS BIGINT), 9) AS bin,
        |  COUNT(*) AS n_orders
        |FROM orders CROSS JOIN b
        |GROUP BY 1 ORDER BY bin""".stripMargin,

    // same discrete ceil-index cut points (the L47 recipe) and the
    // same integer bucket arithmetic 1 + Σ (price > c_j)
    "agg_histogram_eqdepth" ->
      s"""WITH $eqDepthCtes
         |SELECT flag, bucket, n_rows, min_price, max_price
         |FROM h ORDER BY 1, 2""".stripMargin,

    // the histogram's PURPOSE made driver-checkable: certain
    // lower/upper selectivity bounds from bucket stats, with the
    // exact count proven inside them
    "selectivity_bounds" ->
      s"""WITH $eqDepthCtes,
         |bd AS (
         |  SELECT flag,
         |    CAST(SUM(CASE WHEN max_price <= 50000.0 THEN n_rows
         |      ELSE 0 END) AS BIGINT) AS lower_est,
         |    CAST(SUM(CASE WHEN min_price <= 50000.0 THEN n_rows
         |      ELSE 0 END) AS BIGINT) AS upper_est
         |  FROM h GROUP BY 1),
         |a AS (
         |  SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS actual
         |  FROM lineitem WHERE l_extendedprice <= 50000.0 GROUP BY 1)
         |SELECT bd.flag, COALESCE(a.actual, 0) AS actual,
         |  lower_est, upper_est
         |FROM bd LEFT JOIN a ON bd.flag = a.flag
         |ORDER BY 1""".stripMargin,

    "agg_stats" ->
      s"""SELECT l_returnflag, n_rows, min_qty, max_qty,
         |  ${sqlQ6("(s2 - s1 * s1 / n_rows) / (n_rows - 1) / 1.0e8")} AS var_qty,
         |  ${sqlQ6("sqrt((s2 - s1 * s1 / n_rows) / (n_rows - 1) / 1.0e8)")} AS std_qty,
         |  n_bulk, discounted_rev
         |FROM (
         |  SELECT l_returnflag,
         |    COUNT(*) AS n_rows,
         |    MIN(l_quantity) AS min_qty,
         |    MAX(l_quantity) AS max_qty,
         |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))
         |           * CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS s2,
         |    CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
         |    ${sqlDsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END")} AS discounted_rev
         |  FROM lineitem GROUP BY l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,

    "agg_corr" ->
      s"""SELECT l_returnflag, n,
        |  CASE WHEN n > 1000000000 OR qxmax > 10000000
        |      OR qymax > 3000000000
        |    THEN error('agg_corr: exactness envelope exceeded')
        |    ELSE ${sqlQ6("(sxy - sx * sy / n) / (n - 1) / 1.0e8")}
        |    END AS covar_qty_price,
        |  ${sqlQ6("(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))")} AS corr_qty_price
        |FROM (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    MAX(ABS(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT))) AS qxmax,
        |    MAX(ABS(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT))) AS qymax,
        |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))
        |           * CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS DECIMAL(19,0))
        |           * CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))
        |           * CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "ols_fit" ->
      s"""SELECT l_returnflag, n,
        |  CASE WHEN n > 1000000000 OR qxmax > 10000000
        |      OR qymax > 3000000000
        |    THEN error('ols_fit: exactness envelope exceeded')
        |    ELSE ${sqlQ6("(n * sxy - sx * sy) / (n * sxx - sx * sx)")}
        |    END AS slope_q6,
        |  ${sqlQ6("((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) / 10000.0")} AS intercept_q6
        |FROM (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    MAX(ABS(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT))) AS qxmax,
        |    MAX(ABS(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT))) AS qymax,
        |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))
        |           * CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))
        |           * CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "agg_firstlast" ->
      """SELECT o_orderpriority,
        |  arg_min(o_totalprice, o_orderkey) AS first_price,
        |  arg_max(o_totalprice, o_orderkey) AS last_price,
        |  min(o_orderkey) AS first_key,
        |  max(o_orderkey) AS last_key
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // window spelling as the independent mirror of the min_by argmax
    "agg_mode" ->
      s"""WITH c AS (
         |  SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM lineitem GROUP BY 1, 2),
         |r AS (
         |  SELECT l_returnflag, l_quantity, cnt,
         |    row_number() OVER (PARTITION BY l_returnflag
         |      ORDER BY cnt DESC, l_quantity) AS rn,
         |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS tot
         |  FROM c)
         |SELECT l_returnflag, l_quantity AS mode_quantity,
         |  cnt AS n_mode, CAST(tot AS BIGINT) AS n_total,
         |  ${sqlQ6("CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)")} AS mode_share
         |FROM r WHERE rn = 1
         |ORDER BY l_returnflag""".stripMargin,

    // identical doubled-unit mid-ranks, integer 2R1/2U1/tie sums, and
    // the one identically-spelled tie-corrected z
    "mannwhitney_drift" ->
      s"""WITH byval AS (
         |  SELECT value,
         |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
         |      THEN 0 ELSE 1 END) AS BIGINT) AS c2
         |  FROM events GROUP BY 1),
         |cums AS (
         |  SELECT value, c1, c2, c1 + c2 AS c,
         |    SUM(c1 + c2) OVER (ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumAll
         |  FROM byval),
         |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2,
         |    CAST(SUM((c1+c2)*(c1+c2)*(c1+c2) - (c1+c2)) AS BIGINT)
         |      AS tieT
         |  FROM byval),
         |agg AS (
         |  SELECT n1, n2, tieT,
         |    CAST(SUM(c1 * (2*cumAll - c + 1)) AS BIGINT) AS r1x2
         |  FROM cums CROSS JOIN tot GROUP BY 1, 2, 3),
         |u AS (SELECT n1, n2, tieT,
         |        CAST(r1x2 - n1*(n1+1) AS BIGINT) AS u1x2 FROM agg)
         |SELECT n1, n2, u1x2, tieT,
         |  ${sqlQ6("(CAST(u1x2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0) / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 * (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tieT AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))")} AS z,
         |  CAST(CASE WHEN ABS(
         |    ${sqlQ6("(CAST(u1x2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0) / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 * (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tieT AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))")})
         |    > 1.96 THEN 1 ELSE 0 END AS BIGINT) AS reject_05
         |FROM u""".stripMargin,

    // identical conditional counts, window cumulatives over the value
    // order, integer cross-multiplied gap, q6 statistic and critical
    // value
    "ks_drift" ->
      s"""WITH byval AS (
         |  SELECT value,
         |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
         |      THEN 0 ELSE 1 END) AS BIGINT) AS c2
         |  FROM events GROUP BY 1),
         |cums AS (
         |  SELECT value, c1, c2,
         |    SUM(c1) OVER w AS cum1, SUM(c1 + c2) OVER w AS cumAll
         |  FROM byval WINDOW w AS (ORDER BY value
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |               CAST(SUM(c2) AS BIGINT) AS n2 FROM byval),
         |g AS (
         |  SELECT n1, n2,
         |    MAX(ABS(cum1 * n2 - (cumAll - cum1) * n1)) AS d_num
         |  FROM cums CROSS JOIN tot GROUP BY 1, 2)
         |SELECT n1, n2, CAST(d_num AS BIGINT) AS d_num,
         |  ${sqlQ6("CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))")} AS ks_stat,
         |  ${sqlQ6("1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))")} AS crit_05,
         |  CAST(CASE WHEN
         |    ${sqlQ6("CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))")} >
         |    ${sqlQ6("1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))")}
         |    THEN 1 ELSE 0 END AS BIGINT) AS reject_05
         |FROM g""".stripMargin,

    // identical integer-cents quantization, string-length digit
    // extraction, and q6 shares
    "benford_audit" ->
      s"""WITH c AS (
         |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
         |    AS cents
         |  FROM orders WHERE o_totalprice > 0),
         |f AS (
         |  SELECT cents // CAST(power(10,
         |    length(CAST(cents AS VARCHAR)) - 1) AS BIGINT) AS digit
         |  FROM c),
         |obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
         |        FROM f GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
         |SELECT digit, n,
         |  ${sqlQ6("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)")}
         |    AS obs_share,
         |  ${sqlQ6("ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)")}
         |    AS benford_share
         |FROM obs CROSS JOIN tot ORDER BY digit""".stripMargin,

    // identical ascending (mass, key) ranking and LONG numerator; the
    // only double is the final q6 division
    "gini_concentration" ->
      s"""WITH tm AS (
         |  SELECT source AS k,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS x
         |  FROM documents GROUP BY 1),
         |dm AS (
         |  SELECT source AS k, CAST(COUNT(*) AS BIGINT) AS x
         |  FROM documents GROUP BY 1),
         |g1 AS (
         |  SELECT 'token_mass_by_source' AS dimension,
         |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS mass,
         |    CAST(SUM(i * x) AS BIGINT) AS ixsum
         |  FROM (SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM tm)),
         |g2 AS (
         |  SELECT 'docs_by_source' AS dimension,
         |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS mass,
         |    CAST(SUM(i * x) AS BIGINT) AS ixsum
         |  FROM (SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM dm))
         |SELECT dimension, n, mass,
         |  ${sqlQ6("CAST(2 * ixsum - (n + 1) * mass AS DOUBLE) " +
             "/ CAST(n * mass AS DOUBLE)")} AS gini
         |FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
         |ORDER BY dimension""".stripMargin,

    // identical cents quantization, per-group floored s²/n terms
    // (order-free long sum), one identically-spelled F assembly
    "anova_f" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(v) AS BIGINT) AS sg,
         |    CAST(SUM(v * v) AS BIGINT) AS qg
         |  FROM (SELECT event_type,
         |          CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
         |        FROM events)
         |  GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(ng) AS BIGINT) AS nn,
         |    CAST(SUM(sg) AS BIGINT) AS ss,
         |    CAST(SUM(qg) AS BIGINT) AS qq,
         |    CAST(COUNT(*) AS BIGINT) AS k
         |  FROM g),
         |sb AS (
         |  SELECT nn, ss, qq, k,
         |    CAST(SUM(CAST(FLOOR(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
         |      / CAST(ng AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS sb
         |  FROM g CROSS JOIN tot GROUP BY 1, 2, 3, 4)
         |SELECT k AS n_groups, nn AS n_rows,
         |  k - 1 AS df_between, nn - k AS df_within,
         |  ${sqlQ6("(CAST(sb AS DOUBLE) - CAST(ss AS DOUBLE) * " +
             "CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) / 10000.0")}
         |    AS ss_between,
         |  ${sqlQ6("(CAST(qq AS DOUBLE) - CAST(sb AS DOUBLE)) / 10000.0")}
         |    AS ss_within,
         |  ${sqlQ6("((CAST(sb AS DOUBLE) - CAST(ss AS DOUBLE) * " +
             "CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) / " +
             "CAST(k - 1 AS DOUBLE)) / ((CAST(qq AS DOUBLE) - " +
             "CAST(sb AS DOUBLE)) / CAST(nn - k AS DOUBLE))")} AS f_stat
         |FROM sb""".stripMargin,

    // identical cents quantization and exact-long window sums; t/df
    // are one identically-spelled q6 double each
    "welch_ttest" ->
      s"""WITH a AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN inA THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN inA THEN v ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(SUM(CASE WHEN inA THEN v * v ELSE 0 END) AS BIGINT)
         |      AS q1,
         |    CAST(SUM(CASE WHEN NOT inA THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2,
         |    CAST(SUM(CASE WHEN NOT inA THEN v ELSE 0 END) AS BIGINT)
         |      AS s2,
         |    CAST(SUM(CASE WHEN NOT inA THEN v * v ELSE 0 END) AS BIGINT)
         |      AS q2
         |  FROM (SELECT ts < TIMESTAMP '2024-01-16 00:00:00' AS inA,
         |          CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
         |        FROM events)),
         |z AS (
         |  SELECT n1, n2, s1, s2,
         |    (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) -
         |     CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
         |      (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) /
         |      CAST(n1 AS DOUBLE) AS se1,
         |    (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) -
         |     CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) /
         |      (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)) /
         |      CAST(n2 AS DOUBLE) AS se2
         |  FROM a),
         |r AS (
         |  SELECT n1, n2,
         |    ${sqlQ6("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0")}
         |      AS mean_a,
         |    ${sqlQ6("CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0")}
         |      AS mean_b,
         |    ${sqlQ6("CASE WHEN n1 < 2 OR n2 < 2 THEN 0.0 ELSE " +
             "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
             "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt(se1 + se2)" +
             " END")}
         |      AS t_stat,
         |    ${sqlQ6("CASE WHEN n1 < 2 OR n2 < 2 THEN 0.0 ELSE " +
             "(se1 + se2) * (se1 + se2) / (se1 * se1 / " +
             "CAST(n1 - 1 AS DOUBLE) + se2 * se2 / CAST(n2 - 1 AS DOUBLE))" +
             " END")}
         |      AS welch_df
         |  FROM z)
         |SELECT n1, n2, mean_a, mean_b, t_stat, welch_df,
         |  CAST(CASE WHEN abs(t_stat) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
         |    AS reject_05
         |FROM r""".stripMargin,

    // identical doubled mid-ranks (2·RANK + ties − 1, exact
    // integers), exact-long Pearson-over-ranks sums, guarded q6 ρ
    "spearman_corr" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x,
         |    CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |ranked AS (
         |  SELECT event_type,
         |    2 * RANK() OVER (PARTITION BY event_type ORDER BY x) +
         |      COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
         |    2 * RANK() OVER (PARTITION BY event_type ORDER BY y) +
         |      COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS ry
         |  FROM daily),
         |agg AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(rx) AS BIGINT) AS sx,
         |    CAST(SUM(ry) AS BIGINT) AS sy,
         |    CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         |    CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         |    CAST(SUM(ry * ry) AS BIGINT) AS syy
         |  FROM ranked GROUP BY 1)
         |SELECT event_type, n AS n_days,
         |  ${sqlQ6("CASE WHEN n * sxx - sx * sx = 0 OR " +
             "n * syy - sy * sy = 0 THEN 0.0 ELSE " +
             "CAST(n * sxy - sx * sy AS DOUBLE) / " +
             "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
             "sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END")} AS rho
         |FROM agg ORDER BY event_type""".stripMargin,

    // identical exact long deviations, zero-cells included via the
    // margin cross, per-cell micro quantization before the sum
    "chi2_independence" ->
      s"""WITH obs AS (
         |  SELECT event_type,
         |    CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      + 3) % 7 AS BIGINT) AS dow,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt
         |       FROM obs GROUP BY 1),
         |ct AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS nc
         |       FROM obs GROUP BY 1),
         |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
         |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         |    CAST(COUNT(DISTINCT dow) AS BIGINT) AS c
         |  FROM obs),
         |grid AS (
         |  SELECT rt.event_type, ct.dow, nt, nc,
         |    COALESCE(obs.n, CAST(0 AS BIGINT)) AS n
         |  FROM rt CROSS JOIN ct
         |  LEFT JOIN obs ON obs.event_type = rt.event_type
         |    AND obs.dow = ct.dow),
         |terms AS (
         |  SELECT CAST(FLOOR((CAST(n * nn - nt * nc AS DOUBLE) *
         |      CAST(n * nn - nt * nc AS DOUBLE) /
         |      (CAST(nn AS DOUBLE) * CAST(nt AS DOUBLE) *
         |       CAST(nc AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS t,
         |    nn, r, c
         |  FROM grid CROSS JOIN tt)
         |SELECT nn AS n_events, r AS n_types, c AS n_dows,
         |  (r - 1) * (c - 1) AS df,
         |  CAST(SUM(t) AS DOUBLE) / 1000000.0 AS chi2,
         |  ${sqlQ6("sqrt((CAST(SUM(t) AS DOUBLE) / 1000000.0) / " +
             "(CAST(nn AS DOUBLE) * CAST(LEAST(r - 1, c - 1) AS DOUBLE)))")}
         |    AS cramers_v
         |FROM terms GROUP BY nn, r, c""".stripMargin,

    "agg_distinct" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_custs,
        |  COUNT(DISTINCT (o_custkey, o_orderstatus)) AS n_cust_status,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_rollup" ->
      """SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    "agg_cube" ->
      s"""SELECT o_orderpriority, o_orderstatus,
         |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
         |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), ())
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    "skew_salted_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.25) AS q25,
        |  quantile_disc(l_quantity, 0.5) AS q50,
        |  quantile_disc(l_quantity, 0.75) AS q75,
        |  quantile_disc(l_quantity, 0.95) AS q95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // rank-window spelling — the semantics, not the engine's two-pass
    // plan; identical integer rank targets
    "exact_median_2pass" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT g AS l_returnflag, q.quantile, CAST(MAX(n) AS BIGINT)
        |    AS n_rows,
        |  MAX(CASE WHEN q.quantile = 'p50' AND rn = (n + 1) // 2 THEN v
        |           WHEN q.quantile = 'p90' AND rn = (9 * n + 9) // 10 THEN v
        |      END) AS value
        |FROM r CROSS JOIN (VALUES ('p50'), ('p90')) q(quantile)
        |GROUP BY 1, 2 ORDER BY l_returnflag, quantile""".stripMargin,

    "agg_collect" ->
      """SELECT lang,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // same integer power sums (HUGEINT lane), central-moment algebra
    // spelled in the identical double-op order
    "agg_moments" ->
      s"""WITH b AS (
         |  SELECT event_type,
         |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS q
         |  FROM events),
         |a AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    MAX(ABS(q)) AS qmax,
         |    CAST(SUM(CAST(q AS HUGEINT)) AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(q * q AS HUGEINT)) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST(q * q AS HUGEINT) * q) AS DOUBLE) AS s3,
         |    CAST(SUM(CAST(q * q AS HUGEINT) * CAST(q * q AS HUGEINT))
         |      AS DOUBLE) AS s4
         |  FROM b GROUP BY 1),
         |m AS (
         |  SELECT event_type, n, qmax, s1 / n AS mu, s2 / n AS r2,
         |    s3 / n AS r3, s4 / n AS r4
         |  FROM a)
         |SELECT event_type, n,
         |  CASE WHEN n > 1000000000 OR qmax > 10000000
         |    THEN error('agg_moments: exactness envelope exceeded')
         |    ELSE ${sqlQ6("mu / 10000.0")} END AS mean,
         |  ${sqlQ6("(r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu) / " +
            "((r2 - mu * mu) * sqrt(r2 - mu * mu))")} AS skew_q6,
         |  ${sqlQ6("(r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - " +
            "3.0 * mu * mu * mu * mu) / " +
            "((r2 - mu * mu) * (r2 - mu * mu)) - 3.0")} AS kurt_q6
         |FROM m ORDER BY event_type""".stripMargin,

    // independent spelling: both medians as full row_number windows
    // over the whole group — verifies the two bucket-prune passes
    "mad_outliers" ->
      s"""WITH b AS (
         |  SELECT event_type AS g, value AS v FROM events),
         |r AS (
         |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n
         |  FROM b),
         |med AS (SELECT g, v AS med FROM r WHERE rn = (n + 1) // 2),
         |dev AS (
         |  SELECT b.g, b.v, med.med, ABS(b.v - med.med) AS dv
         |  FROM b JOIN med ON b.g = med.g),
         |r2 AS (
         |  SELECT g, dv, row_number() OVER (PARTITION BY g ORDER BY dv) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n
         |  FROM dev),
         |mad AS (SELECT g, dv AS mad FROM r2 WHERE rn = (n + 1) // 2)
         |SELECT d.g AS event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MAX(d.med) AS med, MAX(m.mad) AS mad,
         |  CAST(SUM(CASE WHEN d.dv > 3.0 * m.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers,
         |  ${sqlDsum("CASE WHEN d.dv > 3.0 * m.mad THEN d.v ELSE 0.0 END")}
         |    AS outlier_mass
         |FROM dev d JOIN mad m ON d.g = m.g
         |GROUP BY 1 ORDER BY event_type""".stripMargin,

    // independent spelling: full per-value window over the WHOLE
    // group (no bucket pruning) — verifies the two-pass selection
    "weighted_median_2pass" ->
      """WITH w AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |    CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT) AS wt
        |  FROM lineitem),
        |tot AS (SELECT g, CAST(SUM(wt) AS BIGINT) AS w FROM w GROUP BY 1),
        |pv AS (SELECT g, v, CAST(SUM(wt) AS BIGINT) AS wv
        |       FROM w GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, SUM(wv) OVER (PARTITION BY g ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS cw
        |  FROM pv)
        |SELECT c.g AS l_returnflag, tot.w AS total_weight,
        |  MIN(c.v) AS wmedian
        |FROM cum c JOIN tot ON c.g = tot.g
        |WHERE c.cw >= (tot.w + 1) // 2
        |GROUP BY 1, 2 ORDER BY l_returnflag""".stripMargin,
  )
}
