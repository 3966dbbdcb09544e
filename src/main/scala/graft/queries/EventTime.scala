package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._

/** Event-time analytics over `events` — the batch twins of the
  * streaming operators (SURVEY.md §2.H note: the same window /
  * session_window / dedup logic runs under Structured Streaming in
  * graft.streaming; batch mode is what the DuckDB oracle can check
  * deterministically).
  *
  * The oracle mirrors Spark's epoch-aligned window grid; sessions are
  * reproduced in ANSI SQL with a gaps-and-islands rewrite; every
  * timestamp output is µs (events.ts is µs-aligned nanos, see Tables).
  */
object EventTime {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // T1: tumbling 1-hour event-time aggregation.
    "tumbling_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select($"w.start".as("window_start"), $"w.end".as("window_end"),
          $"event_type", $"n_events", $"total_value")
        .orderBy($"window_start", $"event_type")
    }),

    // T2: sliding 1-hour window, 30-minute hop — every event lands in
    // exactly two windows; the oracle unions the two candidate window
    // starts per event on the same epoch-aligned grid.
    "sliding_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select($"w.start".as("window_start"), $"w.end".as("window_end"),
          $"n_events", $"total_value")
        .orderBy($"window_start")
    }),

    // T3: 30-minute-gap session windows per user. Session end is
    // last-event + gap (Spark's session_window contract).
    "session_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select($"user_id", $"w.start".as("session_start"),
          $"w.end".as("session_end"), $"n_events", $"total_value")
        .orderBy($"user_id", $"session_start")
    }),

    // T5 batch twin: keyed dedup with a deterministic winner (min
    // event_id) — the batch semantics of dropDuplicatesWithinWatermark.
    "event_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id", $"event_type",
          date_trunc("hour", $"ts").as("hour_bucket"))
        .agg(min($"event_id").as("keeper_event_id"), count(lit(1)).as("n_dups"))
        .orderBy($"user_id", $"event_type", $"hour_bucket")
    }),

    // T7 batch twin: the SAME EventStreams.enrichStatic that runs under
    // readStream, fed batch events + the customer dimension (broadcast —
    // the stream-static enrichment plan at any scale keeps the stream
    // side unmoved).
    "stream_static_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val dim = Tables.customer(s, dir)
        .select($"c_custkey".as("user_id"), $"c_mktsegment".as("segment"))
      graft.streaming.EventStreams
        .enrichStatic(Tables.events(s, dir), dim, "user_id")
        .select($"event_id", $"user_id", $"event_type", $"segment")
        .orderBy($"event_id")
    }),

    // T8 batch twin: the SAME EventStreams.followWithin5Min stream-stream
    // interval self-join (withWatermark is a no-op on a batch plan, so
    // this is literally the streaming operator's logic under the oracle).
    "stream_stream_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      graft.streaming.EventStreams.followWithin5Min(ev, ev)
        .orderBy($"event_id", $"followup_id")
    }),

    // T10: ordered funnel — view -> click -> purchase with strict
    // min-chaining (each stage's time is the EARLIEST event strictly
    // after the previous stage) and a 1-day horizon anchored at the
    // first stage, i.e. windowFunnel semantics (sized so every stage
    // fires on the fixture: 150 -> 60 -> 14 users at sf0.01). Every
    // step is a slim aggregation or equi-join keyed by user_id — ONE
    // key for the whole query, so the per-user frames co-partition
    // and AQE coalesces the tiny tails; nothing is ordered globally
    // and no per-user event array is ever collected.
    // T11: weekly cohort retention — the funnel's sibling: users
    // grouped by signup week (cohort), a cell counts the cohort's
    // distinct users active in week N after signup, plus the q6
    // retention rate. Week arithmetic stays in whole days / 7 (both
    // engines truncate weeks to Monday, so the day diff is an exact
    // multiple of 7 — never engine-specific 'week' diffs, whose
    // boundary counting differs). Same scale shape as funnel: slim
    // per-user aggregations and equi-joins; the distinct-activity
    // relation is (user, week), never raw events.
    "cohort_retention" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"user_id", $"ts", $"event_type")
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("st"))
        .select($"user_id", date_trunc("week", $"st").as("cw"))
      val active = ev.select($"user_id", date_trunc("week", $"ts").as("w"))
        .distinct()
      val cells = active.join(cohort, "user_id")
        .filter($"w" >= $"cw")
        .withColumn("week_no",
          (datediff($"w", $"cw") / 7).cast("int"))
        .groupBy($"cw", $"week_no")
        .agg(count_distinct($"user_id").as("n_active"))
      val sizes = cohort.groupBy($"cw").agg(count(lit(1)).as("cohort_size"))
      cells.join(sizes, "cw")
        .select($"cw".as("cohort_week"), $"week_no".cast("bigint").as("week_no"),
          $"n_active", $"cohort_size",
          q6($"n_active".cast("double") / $"cohort_size").as("retention"))
        .orderBy($"cohort_week", $"week_no")
    }),

    // T12: top session paths — the path-analysis sibling of the
    // funnel: sessionize per user (the T3 session_window semantics,
    // 30-min gap), write each session as its (ts, event_id)-ordered
    // event-type sequence, and rank paths by session count. Scale
    // shape: the per-session list is bounded by the session (never a
    // per-user history), built by one keyed aggregation; the path
    // ranking is a TakeOrderedAndProject over the (small) distinct
    // path relation. Deterministic everywhere: event_id breaks ts
    // ties in the sequence; (count DESC, path) totally orders the
    // top-k boundary.
    // T17: inter-event gap spectrum — the histogram that JUSTIFIES a
    // session timeout (the 30-minute threshold in T3/T12 should come
    // from the knee of this distribution, not folklore): per log2
    // bucket of gap seconds, how many adjacent event pairs. One
    // user-partitioned lag window + a bounded-key count (≤ 64
    // buckets); the corpus shuffles once on user_id.
    "session_gaps" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id")
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .filter($"prev_ts".isNotNull)
        .select((unix_timestamp($"ts") - unix_timestamp($"prev_ts"))
          .as("gap_s"))
        .filter($"gap_s" >= 0)
        // floor(log2) via binary-string length — EXACT integer
        // arithmetic (a libm log2 would flip floor at power-of-two
        // boundaries by one ulp between engines)
        .groupBy(when($"gap_s" === 0, lit(-1L))
          .otherwise((length(bin($"gap_s")) - 1).cast("long"))
          .as("log2_bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min($"gap_s").as("min_gap"), max($"gap_s").as("max_gap"))
        .orderBy($"log2_bucket")
    }),

    // T20: duration-capped sessionization — inactivity sessions (6-hour
    // gap) additionally SPLIT at a 2-hour duration cap
    // measured from the session start (the "no infinite session" rule
    // every production sessionizer carries: a bot that pings every
    // minute forever must not accrete one unbounded session, which is
    // both an analytics artifact and unbounded per-key streaming
    // state). The cap assignment is closed-form — sub-session =
    // floor(elapsed-since-session-start / cap) — so it stays two
    // windows + two map-combinable aggregations; nothing iterates.
    // Scale shape: everything partitions by user_id; per-user series
    // are tiny at any corpus size.
    "capped_sessions" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sessioned = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id")
        .withColumn("prev_ts", lag($"ts", 1).over(wSeq))
        .withColumn("is_new",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") >= 21600, 1L)
            .otherwise(0L))
        .withColumn("sess", sum($"is_new").over(wSeq))
      val wSess = Window.partitionBy($"user_id", $"sess")
      val perCapped = sessioned
        .withColumn("sess_start", min($"ts").over(wSess))
        .withColumn("sub", floor(
          (unix_timestamp($"ts") - unix_timestamp($"sess_start")) /
            lit(7200.0)).cast("long"))
        .groupBy($"user_id", $"sess", $"sub")
        .agg(count(lit(1)).as("cnt"))
      perCapped.groupBy($"user_id")
        .agg(max($"sess").as("n_sessions"),
          count(lit(1)).as("n_capped"),
          sum($"cnt").as("n_events"),
          max($"cnt").as("max_capped_events"))
        .orderBy($"user_id")
    }),

    // T15: trailing-window time-series aggregate — per user, daily
    // event counts with the trailing-7-day running total (the feature
    // column behind "activity in the last week" models). One
    // map-combinable (user, day) count, then ONE user-partitioned
    // RANGE window over integer day offsets — at 100 TB each user's
    // series is tiny; the shuffle key is user_id, never the corpus.
    // T23: time-weighted average over IRREGULAR samples — the
    // TWAP/VWAP-family statistic a plain AVG gets wrong on uneven
    // arrival: each reading holds until the next one, so it weighs by
    // its holding time. Per (event_type, day): Σ value·Δt / Σ Δt with
    // Δt = seconds to the day's next event (the day's last reading
    // has no holding interval and is excluded — both engines agree by
    // construction). Integer-exact: micro-quantized value × whole-
    // second Δt products sum as longs; the one double division runs
    // on two exactly-reproduced operands. Window is partition-local
    // per (type, day) with a deterministic (ts, event_id) tie-break.
    "twap_daily" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type", $"day")
        .orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select($"event_type", $"ts", $"event_id",
          $"ts".cast("date").as("day"),
          floor($"value" * lit(10000.0) + lit(0.5)).cast("long")
            .as("v_micro"))
        .withColumn("dt",
          unix_timestamp(lead($"ts", 1).over(w)) - unix_timestamp($"ts"))
        .filter($"dt".isNotNull)
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dt").as("held_seconds"),
          sum($"v_micro" * $"dt").as("mass"))
        .filter($"held_seconds" > 0L)
        .select($"event_type", $"day".cast("timestamp").as("day"),
          $"n_intervals", $"held_seconds",
          ($"mass".cast("double") / $"held_seconds".cast("double") /
            lit(10000.0)).as("twap"))
        .orderBy($"event_type", $"day")
    }),

    "rolling_7d" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"user_id",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rangeBetween(-6, 0)
      daily
        .withColumn("n_7d", sum($"n_events").over(w))
        .orderBy($"user_id", $"day")
    }),

    // T24: position-based (U-shaped) multi-touch attribution — the
    // marketing-analytics contract behind "which touchpoint earns the
    // purchase": each purchase's value is split across the user's
    // touch events in the 7 days before it — 40% to the first touch,
    // 40% to the last, the remaining 20% shared by the middles — in
    // EXACT INTEGER micro-units with largest-remainder distribution
    // (the penny_allocation discipline: Σ credit ≡ purchase value,
    // bit-for-bit, whatever the partitioning). Degenerate forms
    // documented in the spelling: a solo touch takes everything; with
    // no middles the residual rides the LAST touch. Shape: one
    // user-keyed equi join (range residual rides it), one
    // per-conversion window — conversions partition the window, so no
    // group ever exceeds one user's 7-day activity; output bounded by
    // touch-type × position.
    "touch_attribution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val conv = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("conv_id"),
          $"ts".as("conv_ts"),
          floor($"value" * lit(10000.0) + lit(0.5)).cast("long")
            .as("v_micro"))
      val touches = ev.filter($"event_type" =!= "purchase")
        .select($"user_id", $"event_id", $"ts", $"event_type")
      val joined = touches.join(conv, "user_id")
        .filter($"ts" < $"conv_ts" &&
          $"ts" >= $"conv_ts" - expr("INTERVAL 7 DAYS"))
      val w = Window.partitionBy($"conv_id").orderBy($"ts", $"event_id")
      val pos = joined
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy($"conv_id")))
      // all-integer allocation (DIV/%, never `/` — Spark's `/` on
      // longs is double division); spelled as one SQL CASE so the
      // oracle replays it token-for-token
      val credit = expr("""CASE
        WHEN cnt = 1 THEN v_micro
        WHEN rn = 1 THEN (v_micro * 40) DIV 100
        WHEN rn = cnt THEN CASE WHEN cnt = 2
          THEN v_micro - ((v_micro * 40) DIV 100)
          ELSE (v_micro * 40) DIV 100 END
        ELSE (v_micro - 2 * ((v_micro * 40) DIV 100)) DIV (cnt - 2)
          + CASE WHEN rn - 1 <=
              (v_micro - 2 * ((v_micro * 40) DIV 100)) % (cnt - 2)
            THEN 1 ELSE 0 END
        END""")
      val position =
        when($"cnt" === 1L, "solo")
          .when($"rn" === 1L, "first")
          .when($"rn" === $"cnt", "last")
          .otherwise("middle")
      pos
        .select($"event_type", position.as("touch_position"),
          credit.as("credit_micro"))
        .groupBy($"event_type", $"touch_position")
        .agg(count(lit(1)).as("n_touches"),
          sum($"credit_micro").as("credit_micro"))
        .select($"event_type", $"touch_position", $"n_touches",
          ($"credit_micro".cast("double") / 10000.0).as("credit"))
        .orderBy($"event_type", $"touch_position")
    }),

    // T25: day-of-week seasonality profile — the weekly-cycle audit
    // behind capacity planning and anomaly baselines: per event
    // class, each weekday's share of events and its seasonality
    // index against the flat-week expectation (share × 7; 1.0 = no
    // weekly cycle). Counts and shares are exact integer ratios
    // (q6); day-of-week uses Spark's 1=Sunday..7 convention, which
    // the oracle mirrors as DuckDB's dayofweek + 1. One scan, two
    // map-combinable aggs over a ≤ types×7 domain.
    "dow_seasonality" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cells = Tables.events(s, dir)
        .select($"event_type", dayofweek($"ts").cast("long").as("dow"),
          $"value")
        .groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("value_sum"))
      val totals = cells.groupBy($"event_type")
        .agg(sum($"n_events").as("n_total"))
      cells.join(totals, "event_type")
        .select($"event_type", $"dow", $"n_events",
          q6($"n_events".cast("double") / $"n_total".cast("double"))
            .as("share"),
          q6($"n_events".cast("double") * lit(7.0) /
            $"n_total".cast("double")).as("seasonality"),
          $"value_sum")
        .orderBy($"event_type", $"dow")
    }),

    // T16: time-decayed activity score — Σ exp(−Δdays/7) per user at
    // the corpus's last-event reference time: the recency-weighted
    // engagement feature. Per-event terms are quantized to the 1e-4
    // grid BEFORE the order-free integer sum (the dsum recipe), so
    // cross-engine libm/apply-order differences cannot leak into the
    // result. One broadcast scalar (reference day), one keyed agg.
    "decayed_activity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val day = datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
        .cast("long")
      val ref = Tables.events(s, dir).agg(max(day).as("ref_day"))
      Tables.events(s, dir)
        .select($"user_id", day.as("day"))
        .crossJoin(broadcast(ref))
        .select($"user_id",
          floor(exp(($"day" - $"ref_day").cast("double") / 7.0) * 10000.0
            + 0.5).cast("long").as("qterm"))
        .groupBy($"user_id")
        .agg((sum($"qterm").cast("double") / 10000.0).as("decayed_score"),
          count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }),

    // T14: event-type transition matrix — P(next | current) per user
    // stream, the Markov-chain profile behind "what do users do after
    // X" and the input to next-event models. One user-partitioned
    // window (lead) — the corpus shuffles once on user_id, counts are
    // map-combinable, output bounded by #types². Probabilities are
    // quantized integer-count ratios, engine-exact.
    "event_transitions" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
      val counts = pairs
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy($"from_type").agg(sum($"n").as("__tot"))
      counts.join(totals, "from_type")
        .select($"from_type", $"to_type", $"n",
          q6($"n".cast("double") / $"__tot").as("p"))
        .orderBy($"from_type", $"to_type")
    }),

    "event_paths" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val paths = Tables.events(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(array_join(transform(
          sort_array(collect_list(struct($"ts", $"event_id", $"event_type"))),
          e => e.getField("event_type")), ">").as("path"))
      paths.groupBy($"path")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy($"n_sessions".desc, $"path")
        .limit(20)
    }),

    // T10 via the reusable operator: windowFunnel gives per-user
    // depth; a stage's user count is |level >= i| (an entity at
    // level i completed every earlier stage by construction, so the
    // counts equal the per-stage frames of the unrolled spelling —
    // FunnelSpec pins the operator's semantics on a 4-stage chain).
    "funnel" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val lv = graft.operators.Funnel.windowFunnel(
        Tables.events(s, dir).select($"user_id", $"ts", $"event_type"),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
      Seq(1 -> "1_view", 2 -> "2_click", 3 -> "3_purchase")
        .map { case (i, name) =>
          lv.filter($"level" >= i).agg(count(lit(1)).as("n_users"))
            .select(lit(name).as("stage"), $"n_users")
        }.reduce(_ unionAll _)
        .orderBy($"stage")
    }),

    // T13: regular-grid resampling + gap fill — the time-series
    // normalization step feeding any chart/model that expects one row
    // per (entity, period): snap events to 1-day buckets, materialize
    // EVERY day between an entity's first and last active day
    // (sequence + explode — the grid is generated distributed, per
    // key, never on the driver), zero-fill empty days' counts, and
    // carry the last observed daily value forward across gaps.
    // Scale shape: one (user, day) aggregation (map-combinable), one
    // tiny per-user min/max agg that explodes into the grid, one
    // co-partitioned left join, and a per-user window whose partition
    // is bounded by the date span — never a global sort.
    "time_resample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .filter($"user_id" % 25 === 3)
        .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("day_value"))
      val grid = daily.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id",
          explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day",
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"day_value", lit(0.0)).as("day_value"),
          last($"day_value", ignoreNulls = true).over(w).as("ffill_value"))
        .orderBy($"user_id", $"day")
    }),

    // T19: cumulative distinct users over time — the growth curve
    // behind every "total users to date" dashboard. The naive
    // spelling (per day, COUNT(DISTINCT user) over all history) is
    // quadratic in days×users; the scale-safe rewrite is FIRST-TOUCH
    // + PREFIX SUM: one per-user min (map-combinable), one per-day
    // count of first touches, one running sum over the day axis —
    // the global window runs over #days rows (bounded by the date
    // span, the time_resample contract), never over events.
    "cumulative_uniques" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val firstTouch = Tables.events(s, dir)
        .groupBy($"user_id").agg(min(date_trunc("day", $"ts")).as("day"))
        .groupBy($"day").agg(count(lit(1)).as("new_users"))
      val days = Tables.events(s, dir)
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(firstTouch, Seq("day"), "left")
        .select($"day", $"n_events",
          coalesce($"new_users", lit(0L)).as("new_users"))
        .withColumn("cum_users", sum($"new_users").over(w))
        .orderBy($"day")
    }),

    // T18/J11: interval-overlap join via bin replication
    // ([[graft.operators.IntervalJoin]]) — for each even-user session,
    // how many odd-user sessions were concurrently active ("concurrent
    // load" analytics). Sessions are the 30-min-gap islands derived
    // with one per-user window; the overlap join replicates each
    // session to the 1-hour epoch bins it covers and meets on the bin
    // key — a plain AQE-splittable equi-join instead of the NLJ the
    // raw overlap predicate would plan, with exactly-once pair
    // emission via the first-shared-bin rule (no distinct). The
    // oracle replays the raw quadratic predicate — feasible only at
    // test scale, which is the point of the binning.
    "interval_overlap" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val gapUs = 1800L * 1000000L
      val ev = Tables.events(s, dir)
        .select($"user_id", unix_micros($"ts").as("t"))
      val wOrd = Window.partitionBy($"user_id").orderBy($"t")
      val sess = ev
        .withColumn("brk",
          when(lag($"t", 1).over(wOrd).isNull ||
            $"t" - lag($"t", 1).over(wOrd) > gapUs, 1L).otherwise(0L))
        .withColumn("sid", sum($"brk").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(min($"t").as("s"), max($"t").as("e"))
      val lhs = sess.filter($"user_id" % 2 === 0)
        .select($"user_id".as("l_user"), $"s".as("l_s"), $"e".as("l_e"))
      val rhs = sess.filter($"user_id" % 2 === 1)
        .select($"s".as("r_s"), $"e".as("r_e"))
      graft.operators.IntervalJoin
        .overlapCounts(lhs, Seq("l_user", "l_s"), "l_s", "l_e",
          rhs, "r_s", "r_e", width = 3600L * 1000000L)
        .select($"l_user".as("user_id"), $"l_s".as("sess_start_us"),
          $"n_overlaps")
        .orderBy($"user_id", $"sess_start_us")
    }),

    // T21: time-series linear interpolation — per user, estimate the
    // purchase-value level AT each click event from the bracketing
    // purchase events (the feature-alignment primitive behind "sensor
    // value at label time": floor S5 + successor S6 fused with the
    // interior linear estimate). Exactness: values quantized to
    // integer micro-units, time to epoch seconds, and the interior
    // point is the exact integer floor of (v0·(t1−t)+v1·(t−t0))/(t1−t0)
    // — Spark's DIV and DuckDB's // both truncate toward zero, so the
    // division is engine-exact for any sign; with the fixture's
    // nonnegative values truncation equals floor too. Scale shape: two
    // user-partitioned fill windows over the merged series — the
    // window_fill pattern run both directions; shuffle key is
    // user_id, never the corpus.
    "time_interpolate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val marked = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type",
          expr("unix_micros(ts) DIV 1000000").as("t_s"),
          when($"event_type" === "purchase",
            floor($"value" * lit(1000000.0) + lit(0.5)).cast("long"))
            .as("vm"))
      val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
      val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
      marked
        .withColumn("v0", last($"vm", ignoreNulls = true).over(wPrev))
        .withColumn("t0", last(when($"vm".isNotNull, $"t_s"),
          ignoreNulls = true).over(wPrev))
        .withColumn("v1", first($"vm", ignoreNulls = true).over(wNext))
        .withColumn("t1", first(when($"vm".isNotNull, $"t_s"),
          ignoreNulls = true).over(wNext))
        .filter($"event_type" === "click" &&
          $"v0".isNotNull && $"v1".isNotNull)
        .withColumn("im", when($"t1" === $"t0", $"v0").otherwise(
          expr("(v0 * (t1 - t_s) + v1 * (t_s - t0)) DIV (t1 - t0)")))
        .select($"event_id", $"user_id",
          ($"im".cast("double") / lit(1000000.0)).as("value_interp"))
        .orderBy($"event_id")
    }),

    // T22: trailing-baseline anomaly flags — per event type, each
    // day's count tested against the 7 prior observed days: anomalous
    // iff |x − μ| > 2σ, evaluated EXACTLY in integers as
    // (7x − S)² > 4·(7·Q − S²) (multiply the z²>4 inequality through
    // by 49·var's denominator — no sqrt, no double division, so the
    // flag is engine-exact). The operational twin of G15's
    // selectivity bounds: one map-combinable daily count, one
    // type-partitioned ROWS window; days without a full 7-day
    // baseline are withheld (no partial-window guesses).
    // T29: burstiness audit over inter-arrival times (Goh & Barabási
    // 2008 — the standard burstiness parameter): per event type,
    // B = (σ − μ)/(σ + μ) of the inter-arrival gaps — B → −1 for a
    // metronome, 0 for a Poisson process, → 1 for extreme bursts; the
    // one-number answer to "is this feed clocked, random, or bursty"
    // that drives batching and rate-limit decisions. Exactness: gaps
    // quantize to whole seconds by integer division of epoch micros
    // (deterministic, no double time math); with S = Σδ, Q = Σδ²
    // (exact integers) the population identity gives
    // B = (√(nQ − S²) − S)/(√(nQ − S²) + S) — ONE sqrt over an exact
    // integer, one identically-spelled q6 expression. Envelope:
    // nQ < 2⁶³ needs Σδ² · n under ~9·10¹⁸ (gaps in seconds make this
    // comfortable at 10⁹ events/type; beyond it the sums move to
    // decimals). Shape: one per-type lag window + one map-combinable
    // agg keyed by type.
    "burstiness" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type")
        .orderBy($"us", $"event_id")
      val gaps = Tables.events(s, dir)
        .select($"event_type", expr("unix_micros(ts)").as("us"),
          $"event_id")
        .withColumn("prev", lag($"us", 1).over(w))
        .filter($"prev".isNotNull)
        .select($"event_type",
          expr("(us - prev) DIV 1000000").as("d"))
      val x = ($"n" * $"q" - $"s" * $"s").cast("double")
      gaps.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"d").as("s"),
          sum($"d" * $"d").as("q"))
        .select($"event_type", $"n", $"s", $"q",
          q6($"s".cast("double") / $"n".cast("double")).as("mean_gap_s"),
          q6((sqrt(x) - $"s".cast("double")) /
            (sqrt(x) + $"s".cast("double"))).as("burstiness"))
        .orderBy($"event_type")
    }),

    // T28: seasonal-naive forecast backtest — the capacity-planning
    // baseline every real forecaster must beat (forecast(d) = the
    // actual count one season earlier, here same-weekday-last-week),
    // scored per event type by exact integer error mass and WAPE
    // (Σ|err|/Σactual — the weighted absolute percentage error; the
    // per-day-division MAPE is deliberately avoided: WAPE is one q6
    // division over two exact integer sums). The forecast pairing is a
    // CALENDAR self-join on (type, day−7) — not a 7-ROW lag — so
    // missing days produce no forecast instead of a silently shifted
    // one. Shape: one map-combinable daily count + one equi self-join
    // on the bounded (type, day) relation.
    "seasonal_backtest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val fc = daily.select($"event_type", ($"day" + lit(7L)).as("day"),
        $"n".as("fc"))
      daily.join(fc, Seq("event_type", "day"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs($"n" - $"fc")).as("total_abs_err"),
          sum($"n").as("total_actual"),
          q6(sum(abs($"n" - $"fc")).cast("double") /
            sum($"n").cast("double")).as("wape"))
        .orderBy($"event_type")
    }),

    // T27: EXACT trailing-7-day distinct users per day — the honest
    // version of the metric approx_count_distinct windows estimate,
    // computed WITHOUT any per-day re-scan or window distinct:
    // a (user, day) activity pair is the user's FIRST activity inside
    // the window ending at d exactly when d ∈ [max(t, prev+7), t+6]
    // (prev = the user's previous active day), so each pair emits one
    // +1/−1 difference-array interval and distinct(d) is the prefix
    // sum of the deltas over the day axis. Work: one per-user lag
    // window + one map-combinable delta agg keyed by day + one prefix
    // sum over the BOUNDED day axis (a time axis, not a data axis —
    // the single-partition prefix holds #days rows by construction;
    // an unbounded axis swaps in the PrefixSum two-phase ranking).
    // The oracle computes the same metric by the INDEPENDENT brute
    // algorithm (day × activity range join + COUNT DISTINCT), so the
    // interval decomposition itself is what the hash check verifies.
    "rolling_distinct_users" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val act = Tables.events(s, dir)
        .select($"user_id",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("t"))
        .distinct()
      val deltas = act
        .withColumn("prev", lag($"t", 1).over(
          Window.partitionBy($"user_id").orderBy($"t")))
        .select(
          greatest($"t", coalesce($"prev" + lit(7L), $"t")).as("lo"),
          ($"t" + lit(7L)).as("hi"))
        .select(explode(array(
          struct($"lo".as("day"), lit(1L).as("delta")),
          struct($"hi".as("day"), lit(-1L).as("delta")))).as("x"))
        .select($"x.day".as("day"), $"x.delta".as("delta"))
        .groupBy($"day").agg(sum($"delta").as("d"))
      val days = broadcast(act.agg(min($"t").as("mn"), max($"t").as("mx")))
        .select(explode(sequence($"mn", $"mx")).as("day"))
      days.join(deltas, Seq("day"), "left_outer")
        .na.fill(0L, Seq("d"))
        .withColumn("distinct_7d", sum($"d").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"day", $"distinct_7d")
        .orderBy($"day")
    }),

    // T26: CUSUM change-point detection (Page 1954 — the classic
    // sequential drift test): per event type, the one-sided cumulative
    // sum V_t = max(0-floored excursion) of daily counts above the
    // series mean, flagged when it exceeds 5σ. Where T22's rolling
    // z-test sees single-day spikes, CUSUM accumulates SMALL sustained
    // shifts a per-day test never trips. Exactness: with S_t the
    // running sum of (n_days·x − Σx), V_t = max(0, S_t −
    // min(0, min_{j<t} S_j)) ≡ S_t − min(0, min_{j≤t} S_j) — the true
    // one-sided recursion V_t = max(0, V_{t−1} + x_t − μ); the outer
    // clamp matters exactly when S_t sets a new minimum (a sustained
    // DOWNWARD run), which a one-sided above-mean test must read as 0,
    // not as a large |V| — is an exact integer, and the 5σ flag
    // cross-multiplies to
    // V² > 25·(n_days·ΣQ − (Σx)²) — no sqrt, no double, engine-exact
    // (the rolling_anomaly recipe; σ-scaling makes the threshold
    // self-calibrating across corpus scale). Envelope: V² needs
    // |V| < 3·10⁹·n_days in daily-count units — beyond it, the terms
    // move to the decimal lane. Shape: one map-combinable daily count;
    // all windows run on the bounded (type × day) relation.
    "cusum_changepoints" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = Window.partitionBy($"event_type")
      val ord = Window.partitionBy($"event_type").orderBy($"day")
      val pre = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      daily
        .withColumn("sum_n", sum($"n").over(tot))
        .withColumn("sum_q", sum($"n" * $"n").over(tot))
        .withColumn("n_days", count($"n").over(tot))
        .withColumn("run", sum($"n_days" * $"n" - $"sum_n").over(ord))
        .withColumn("vs", greatest($"run" -
          least(lit(0L), coalesce(min($"run").over(pre), lit(0L))),
          lit(0L)))
        .withColumn("is_change",
          when($"vs" * $"vs" >
            lit(25L) * ($"n_days" * $"sum_q" - $"sum_n" * $"sum_n"), 1L)
            .otherwise(0L))
        .select($"event_type", $"day", $"n".as("n_events"),
          $"vs".as("v_scaled"), $"is_change")
        .orderBy($"event_type", $"day")
    }),

    // T31: Mann–Kendall trend test (Mann 1945 / Kendall 1975 — THE
    // standard nonparametric monotone-trend detector for short daily
    // series): per event type, S = Σ_{i<j} sign(x_j − x_i) over the
    // day-ordered daily counts, tie-corrected variance
    // Var(S) = (n(n−1)(2n+5) − Σ_g c_g(c_g−1)(2c_g+5)) / 18, and the
    // continuity-corrected z. Where CUSUM (T26) finds a LEVEL SHIFT
    // against a calibrated mean, MK asks "is the series drifting
    // monotonically" with no distributional assumption — the
    // complementary question for capacity planning. Exactness: S and
    // both variance terms are exact longs (sign() of an integer
    // difference; n ≤ days-in-window so n³ is tiny); z is one
    // identically-spelled q6 double, so the |z| > 1.96 decision
    // compares grid values. Shape: one map-combinable daily count;
    // the pair join, tie groups and variance all run on the bounded
    // (type × day) relation — at 10⁹ events the post-count work is
    // unchanged (the pair domain is days², not events²).
    "mann_kendall_trend" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val a = daily.select($"event_type", $"day".as("di"), $"n".as("xi"))
      val b = daily.select($"event_type", $"day".as("dj"), $"n".as("xj"))
      val sRel = a.join(b, Seq("event_type")).filter($"di" < $"dj")
        .groupBy($"event_type")
        .agg(sum(signum(($"xj" - $"xi").cast("double")).cast("long"))
          .as("s_stat"))
      // n_days = Σ cg (the number of DAYS) — counting the tie GROUPS
      // here (count(1) over the (type, n) relation) was a genuine
      // statistic bug the T31 live twin exposed: var18 and z were
      // computed against the distinct-count-value count, and the
      // oracle mirrored the same mistake so the hash stayed green
      val ties = daily.groupBy($"event_type", $"n")
        .agg(count(lit(1)).as("cg"))
        .groupBy($"event_type")
        .agg(sum($"cg").as("n_days"),
          sum($"cg" * ($"cg" - lit(1L)) * (lit(2L) * $"cg" + lit(5L)))
            .as("tie_term"))
      val z = when($"s_stat" > 0L,
          ($"s_stat" - lit(1L)).cast("double") /
            sqrt($"var18".cast("double") / lit(18.0)))
        .when($"s_stat" < 0L,
          ($"s_stat" + lit(1L)).cast("double") /
            sqrt($"var18".cast("double") / lit(18.0)))
        .otherwise(lit(0.0))
      sRel.join(ties, "event_type")
        .withColumn("var18",
          $"n_days" * ($"n_days" - lit(1L)) *
            (lit(2L) * $"n_days" + lit(5L)) - $"tie_term")
        .select($"event_type", $"n_days", $"s_stat", $"tie_term",
          $"var18", q6(z).as("z"))
        .withColumn("is_trend",
          when(abs($"z") > lit(1.96), 1L).otherwise(0L))
        .orderBy($"event_type")
    }),

    // T35: Theil–Sen slope (Theil 1950 / Sen 1968 — the robust trend
    // MAGNITUDE next to T31's direction test): the median of all
    // pairwise slopes (x_j − x_i)/(d_j − d_i) over the day-ordered
    // daily counts — immune to outlier days that wreck an OLS fit
    // (G18). Exactness: each pairwise slope lands on the q6 grid via
    // one identically-spelled double division (exact long numerator
    // and denominator), and the median is the ⌈n/2⌉-th smallest GRID
    // VALUE — deterministic regardless of tie order, so a plain
    // row_number selection suffices (the documented lower-median
    // convention for even counts keeps the statistic a grid value;
    // averaging the two middles would leave the grid). Shape: one
    // map-combinable daily count; the pair join and selection run on
    // the bounded (type × day) relation — days² pairs, never events².
    // The median SELECTION is grid-value cumulative counting (the G17
    // family's move), not a rank over the raw pair relation: the
    // slopes first collapse through a map-combinable (type, s6) count
    // aggregate, and the one per-type ordered walk runs over DISTINCT
    // grid values — bounded by the slope grid, not by days² — picking
    // the value whose cumulative count first covers ⌈np/2⌉. Same
    // statistic (the k-th smallest of a multiset is a grid value);
    // no per-type full sort of the pair relation survives in the plan
    // (PlanAuditSpec pins row_number-free selection).
    "theil_sen" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val a = daily.select($"event_type", $"day".as("di"), $"n".as("xi"))
      val b = daily.select($"event_type", $"day".as("dj"), $"n".as("xj"))
      val slopes = a.join(b, Seq("event_type")).filter($"di" < $"dj")
        .select($"event_type",
          floor((($"xj" - $"xi").cast("double") /
            ($"dj" - $"di").cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("s6"))
      val counts = slopes.groupBy($"event_type", $"s6")
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy($"event_type").orderBy($"s6")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy($"event_type")
      counts
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn("np", sum($"c").over(tot))
        // the lower median ⌈np/2⌉ falls inside exactly one grid
        // value's cumulative span: cum − c < target ≤ cum
        .filter($"cum" - $"c" < expr("(np + 1L) DIV 2L") &&
          $"cum" >= expr("(np + 1L) DIV 2L"))
        .join(daily.groupBy($"event_type")
          .agg(count(lit(1)).as("n_days")), "event_type")
        .select($"event_type", $"n_days", $"np".as("n_pairs"),
          ($"s6".cast("double") / lit(1000000.0)).as("sen_slope"))
        .orderBy($"event_type")
    }),

    // T36: autocorrelation function of the daily series (the
    // Box–Jenkins identification tool next to T31's trend direction
    // and T26's level shift): per event type and lag L ∈ [1, 7],
    // r_L = Σ_t (n·x_t − S)(n·x_{t+L} − S) / Σ_t (n·x_t − S)² over
    // the day-ordered daily counts — is today's load predicted by
    // L days ago (weekly cadence shows as a lag-7 spike, momentum as
    // lag-1). Convention: pairs form on the CALENDAR axis (t+L means
    // the calendar day, so a silent day contributes no pair — the
    // observed-days convention, stated here because resampling zeros
    // in would change r). Exactness: n·x_t − S is an exact long
    // (deviation cross-multiplied by n_days, the runs-test dichotomy
    // trick — no rational mean), every numerator/denominator term is
    // an exact long product under the |n·x − S| < 3·10⁹ envelope
    // (in-query guard, G22 family; at 3·10⁹ daily events per type
    // pre-aggregate upstream), and r is one identically-spelled q6
    // double division. Shape: one map-combinable daily count; the
    // lag join, deviations and sums all run on the bounded
    // (type × day) relation — 7·days pairs, never events².
    "autocorr_daily" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.SeriesStats.acf(daily, "event_type", "day", "n", 7)
        .orderBy($"event_type", $"lag")
    }),

    // T38: lead-lag cross-correlation between event types (the CCF —
    // T37's ACF asked "does a series predict itself"; this asks "does
    // type A LEAD type B", the cross-signal smoke test before anyone
    // claims causality): per ordered type pair and lag L ∈ [−3, 3],
    // r_L = Σ_t devA(t)·devB(t+L) / √(ΣdevA²·ΣdevB²) over the shared
    // calendar days, each series' deviations cross-multiplied by its
    // OWN day count (devA = nd_a·x_t − S_a, the T37 exact-long trick;
    // the nd_a·nd_b scale factors cancel in r). A peak at L > 0 reads
    // "A leads B by L days". Same observed-days convention and 3·10⁹
    // envelope as T37 (the guard rides the shared dev relation).
    // Shape: one map-combinable daily count; the pair join runs on
    // the bounded (type × day) relation × 7 lags — types²·days·7
    // rows, never events².
    "crosscorr_daily" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.SeriesStats.ccf(daily, "event_type", "day", "n", 3)
        .select($"event_type_a".as("type_a"),
          $"event_type_b".as("type_b"), $"lag", $"n_pairs", $"r")
        .orderBy($"type_a", $"type_b", $"lag")
    }),

    // T39: seasonal STRENGTH of the weekly cycle (Hyndman's F_s =
    // max(0, 1 − Var(residual)/Var(deviation)) — T25's dow_seasonality
    // reports the per-day SHARES, this reports one number per type
    // answering "how much of the daily variation IS the weekly
    // cycle": 0 = none (resampling by dow is pointless), → 1 = the
    // cycle explains everything (forecast with T28's seasonal naive).
    // Exactness: both residual (vs the type's dow mean) and deviation
    // (vs the type's grand mean) quantize to CENTI-unit longs via one
    // identically-spelled double division of exact-long cross products
    // ((x·n_w − S_w)·100/n_w — no rational mean is ever summed), so
    // the two sums of squares are order-free longs; envelope:
    // |x·n_w − S_w|·100/n_w ≤ 3·10⁹ (≈ daily deviations under 3·10⁷ —
    // the G22 family; in-plan guard). Strength is one q6 double.
    // Shape: one map-combinable daily count; dow means, residuals and
    // sums all run on the bounded (type × day) relation. Day-of-week
    // is the engine-neutral (epoch_days + 3) % 7 (the chi2 spelling).
    "seasonal_strength" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("eday"))
        .agg(count(lit(1)).as("n"))
      graft.operators.SeriesStats
        .seasonalStrength(daily, "event_type", "eday", "n", 7, 3)
        .orderBy($"event_type")
    }),

    // T40: turning-point test (Kendall — the second classical
    // randomness check next to T32's runs test, and sensitive to a
    // DIFFERENT departure: runs catches level clustering, turning
    // points catch over-smooth or over-jagged oscillation): per event
    // type, T = #{interior days that are a strict local max or min of
    // the day-ordered daily counts}; under randomness E[T] = 2(n−2)/3
    // and Var[T] = (16n−29)/90, z = (T − E)/√Var. Convention: ties
    // break NO turning point (strict comparisons both sides — the
    // classical test assumes continuous data; integer counts tie, so
    // the convention is stated rather than implied). Exactness: T and
    // n are exact longs over the observed-day order (the runs-test
    // lag/lead shape); z is one identically-spelled q6 double with
    // n < 3 reporting 0 (no interior points — the ADVICE-r12
    // degenerate rule). Shape: one map-combinable daily count + one
    // per-type lag/lead window on the bounded (type × day) relation.
    "turning_points" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val marked = daily
        .withColumn("p", lag($"n", 1).over(w))
        .withColumn("f", lead($"n", 1).over(w))
        .withColumn("tp",
          when($"p".isNotNull && $"f".isNotNull &&
            (($"p" < $"n" && $"n" > $"f") ||
              ($"p" > $"n" && $"n" < $"f")), 1L).otherwise(0L))
      val agg = marked.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"), sum($"tp").as("t_stat"))
      val e = lit(2.0) * ($"n_days" - lit(2L)).cast("double") / lit(3.0)
      val v = (lit(16L) * $"n_days" - lit(29L)).cast("double") / lit(90.0)
      agg.select($"event_type", $"n_days", $"t_stat",
          q6(when($"n_days" < 3L, lit(0.0))
            .otherwise(($"t_stat".cast("double") - e) / sqrt(v)))
            .as("z"))
        .withColumn("is_nonrandom",
          when(abs($"z") > lit(1.96), 1L).otherwise(0L))
        .orderBy($"event_type")
    }),

    // T34: change-point LOCALIZATION (one-split binary segmentation —
    // the answer to the question T26 only flags): per event type, the
    // split position t maximizing the between-segment sum of squares,
    // score(t) = (cum_t·n − S·t)² / (t·(n−t)) over the day-ordered
    // daily counts — i.e. WHERE did the level change, with the
    // before/after means as the effect size. Exactness: the numerator
    // (cum_t·n − S·t)² is an exact long (envelope cum·n < 3·10⁹
    // documented — daily-count units, not events); each candidate's
    // score quantizes to a micro-unit long via one identically-spelled
    // double division, and the argmax tie-breaks deterministically on
    // (score desc, day asc). Shape: one map-combinable daily count;
    // the prefix sums, candidate scores and argmax all run on the
    // bounded (type × day) relation.
    "change_localization" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val tot = Window.partitionBy($"event_type")
      val cand = daily
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("cum", sum($"n").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nd", count($"n").over(tot))
        .withColumn("s_all", sum($"n").over(tot))
        .filter($"t" < $"nd")
      val num = $"cum" * $"nd" - $"s_all" * $"t"
      val scored = cand
        .withColumn("score6",
          floor((num.cast("double") * num.cast("double") /
            ($"t" * ($"nd" - $"t")).cast("double")) * lit(1000000.0) /
            ($"nd" * $"nd").cast("double") + lit(0.5)).cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"event_type")
            .orderBy($"score6".desc, $"day")))
        .filter($"rk" === 1)
      scored.select($"event_type", $"nd".as("n_days"),
          $"day".as("split_day"), $"t".as("n_before"),
          q6($"cum".cast("double") / $"t".cast("double"))
            .as("mean_before"),
          q6(($"s_all" - $"cum").cast("double") /
            ($"nd" - $"t").cast("double")).as("mean_after"),
          $"score6")
        .orderBy($"event_type")
    }),

    // T33: EWMA control chart (Roberts 1959 — the SPC standard between
    // T22's single-day z-test and T26's unbounded CUSUM): an
    // exponentially weighted moving average of the daily counts,
    // flagged when it leaves the ±3σ_EWMA control band. λ = 1/4,
    // truncated at 8 taps so the weights are EXACT integers: w_k =
    // 3^k·4^(7−k) (Σw = 58975, Σw² = 607417225), making the smoothed
    // numerator an exact long — the only doubles are the final
    // identically-spelled q6 divisions (ewma = num/58975, σ_EWMA² =
    // s²·Σw²/(Σw)²), so the out-of-control decision compares grid
    // values. The 8-tap truncation is the standard steady-state
    // approximation ((1−λ)⁸ < 10% tail mass) and is what keeps the
    // arithmetic exact — documented as part of the statistic. Shape:
    // one map-combinable daily count; eight lag windows and the test
    // on the bounded (type × day) relation.
    "ewma_control" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val weights = (0 to 7).map(k =>
        math.pow(3, k).toLong * math.pow(4, 7 - k).toLong)
      val num = (0 to 7).map(k => lag($"n", k).over(w) * lit(weights(k)))
        .reduce(_ + _)
      val tot = daily.groupBy($"event_type")
        .agg(sum($"n").as("sn"), sum($"n" * $"n").as("sq"),
          count(lit(1)).as("nd"))
      val ewma = $"num".cast("double") / lit(58975.0)
      val mean = $"sn".cast("double") / $"nd".cast("double")
      val va = ($"nd" * $"sq" - $"sn" * $"sn").cast("double") /
        ($"nd" * ($"nd" - lit(1L))).cast("double")
      val sigmaE = sqrt(va * lit(607417225.0) / lit(3478050625.0))
      daily
        .withColumn("num", num)
        .filter($"num".isNotNull)
        .join(tot, "event_type")
        .select($"event_type", $"day", $"n".as("n_events"),
          q6(ewma).as("ewma"), q6((ewma - mean) / sigmaE).as("z"))
        .withColumn("is_ooc", when(abs($"z") > lit(3.0), 1L).otherwise(0L))
        .orderBy($"event_type", $"day")
    }),

    // T32: Wald–Wolfowitz runs test (1940 — the classic randomness
    // audit): per event type, dichotomize the daily counts against
    // the series mean (the integer cross-multiply n_days·x > Σx — no
    // division), count the RUNS of consecutive same-side days, and
    // compare with the run count a random arrangement of the same
    // n1 above / n2 below days would produce: E[R] = 1 + 2n1n2/N,
    // Var[R] = 2n1n2(2n1n2 − N)/(N²(N−1)). Too FEW runs = regime
    // clumping (the drift family's "is it even stationary" sibling);
    // too many = oscillation. Exactness: the run count is an exact
    // integer from one per-type lag window; E/Var/z are one
    // identically-spelled q6 double (degenerate all-one-side series
    // report z = 0 by the guarded branch, spelled identically in the
    // oracle). Shape: one map-combinable daily count; the window and
    // the test run on the bounded (type × day) relation.
    "runs_test_drift" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.groupBy($"event_type")
        .agg(sum($"n").as("sn"), count(lit(1)).as("nd"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val marked = daily.join(tot, "event_type")
        .withColumn("above", ($"n" * $"nd") > $"sn")
        .withColumn("prev", lag($"above", 1).over(w))
      val agg = marked.groupBy($"event_type")
        .agg(
          (sum(when($"prev".isNotNull && $"prev" =!= $"above", 1L)
            .otherwise(0L)) + lit(1L)).as("runs"),
          sum(when($"above", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"above", 1L).otherwise(0L)).as("n2"))
      val nTot = ($"n1" + $"n2").cast("double")
      val er = lit(1.0) + lit(2.0) * $"n1".cast("double") *
        $"n2".cast("double") / nTot
      val vr = (lit(2.0) * $"n1".cast("double") * $"n2".cast("double") *
        (lit(2.0) * $"n1".cast("double") * $"n2".cast("double") - nTot)) /
        (nTot * nTot * (nTot - lit(1.0)))
      // guard every zero-variance arrangement: one-sided series
      // (n1=0 or n2=0) AND the 2-day n1=n2=1 series, where Var[R] =
      // 2·1·1(2·1·1−2)/(N²(N−1)) = 0 — Spark's /0 yields NULL while
      // DuckDB yields Inf, so both engines report z = 0, spelled
      // identically
      val z = when($"n1" === 0L || $"n2" === 0L ||
          ($"n1" === 1L && $"n2" === 1L), lit(0.0))
        .otherwise(($"runs".cast("double") - er) / sqrt(vr))
      agg
        .select($"event_type", $"n1", $"n2", $"runs", q6(z).as("z"))
        .withColumn("is_nonrandom",
          when(abs($"z") > lit(1.96), 1L).otherwise(0L))
        .orderBy($"event_type")
    }),

    "rolling_anomaly" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(-7, -1)
      daily
        .withColumn("base_n", count($"n").over(w))
        .withColumn("s1", sum($"n").over(w))
        .withColumn("s2", sum($"n" * $"n").over(w))
        .filter($"base_n" === 7)
        .withColumn("is_anomaly",
          when((lit(7L) * $"n" - $"s1") * (lit(7L) * $"n" - $"s1") >
            lit(4L) * (lit(7L) * $"s2" - $"s1" * $"s1"), 1L)
            .otherwise(0L))
        .select($"event_type", $"day", $"n".as("n_events"),
          $"s1".as("base_sum"), $"is_anomaly")
        .orderBy($"event_type", $"day")
    }),
  )

  /** Gaps-and-islands session intervals shared by the interval_overlap
    * oracle: (user_id, s, e) in epoch µs, 30-min gap rule identical to
    * the engine's window derivation. */
  private val sessionIvCte =
    """ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |d AS (
      |  SELECT user_id, t,
      |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |      OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
      |        > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM ev),
      |si AS (
      |  SELECT user_id, t,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d),
      |iv AS (
      |  SELECT user_id, sid, MIN(t) AS s, MAX(t) AS e
      |  FROM si GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6
    "dow_seasonality" ->
      s"""WITH cells AS (
         |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         |    CAST(COUNT(*) AS BIGINT) AS n_events,
         |    ${sqlDsum("value")} AS value_sum
         |  FROM events GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS n_total
         |      FROM cells GROUP BY 1)
         |SELECT event_type, dow, n_events,
         |  ${sqlQ6("CAST(n_events AS DOUBLE) / CAST(n_total AS DOUBLE)")}
         |    AS share,
         |  ${sqlQ6("CAST(n_events AS DOUBLE) * 7.0 / CAST(n_total AS DOUBLE)")}
         |    AS seasonality,
         |  value_sum
         |FROM cells JOIN t USING (event_type)
         |ORDER BY event_type, dow""".stripMargin,

    // identical CASE allocation replayed with // and % on BIGINTs
    "touch_attribution" ->
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts,
        |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v_micro
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT e.event_type, c.conv_id, c.v_micro, e.ts, e.event_id
        |  FROM events e JOIN conv c ON e.user_id = c.user_id
        |  WHERE e.event_type <> 'purchase'
        |    AND e.ts < c.conv_ts AND e.ts >= c.conv_ts - INTERVAL 7 DAY),
        |p AS (
        |  SELECT event_type, v_micro,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY conv_id) AS cnt
        |  FROM t),
        |a AS (
        |  SELECT event_type,
        |    CASE WHEN cnt = 1 THEN 'solo' WHEN rn = 1 THEN 'first'
        |         WHEN rn = cnt THEN 'last' ELSE 'middle'
        |    END AS touch_position,
        |    CASE
        |      WHEN cnt = 1 THEN v_micro
        |      WHEN rn = 1 THEN (v_micro * 40) // 100
        |      WHEN rn = cnt THEN CASE WHEN cnt = 2
        |        THEN v_micro - ((v_micro * 40) // 100)
        |        ELSE (v_micro * 40) // 100 END
        |      ELSE (v_micro - 2 * ((v_micro * 40) // 100)) // (cnt - 2)
        |        + CASE WHEN rn - 1 <=
        |            (v_micro - 2 * ((v_micro * 40) // 100)) % (cnt - 2)
        |          THEN 1 ELSE 0 END
        |    END AS credit_micro
        |  FROM p)
        |SELECT event_type, touch_position,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(CAST(SUM(credit_micro) AS BIGINT) AS DOUBLE) / 10000.0
        |    AS credit
        |FROM a GROUP BY 1, 2
        |ORDER BY event_type, touch_position""".stripMargin,

    "cumulative_uniques" ->
      """WITH f AS (
        |  SELECT user_id, MIN(date_trunc('day', ts)) AS day
        |  FROM events GROUP BY 1),
        |nu AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        |  FROM f GROUP BY 1),
        |d AS (
        |  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT CAST(d.day AS TIMESTAMP) AS day, n_events,
        |  COALESCE(new_users, 0) AS new_users,
        |  CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY d.day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM d LEFT JOIN nu ON d.day = nu.day
        |ORDER BY day""".stripMargin,

    "interval_overlap" ->
      s"""WITH $sessionIvCte
         |SELECT a.user_id, a.s AS sess_start_us,
         |  CAST(COUNT(*) AS BIGINT) AS n_overlaps
         |FROM iv a JOIN iv b
         |  ON a.user_id % 2 = 0 AND b.user_id % 2 = 1
         |  AND ${graft.operators.IntervalJoin.overlapSql("a.s", "a.e", "b.s", "b.e")}
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tumbling_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         |  CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
         |  event_type, COUNT(*) AS n_events,
         |  ${sqlDsum("value")} AS total_value
         |FROM events
         |GROUP BY 1, 2, 3
         |ORDER BY window_start, event_type""".stripMargin,

    "sliding_window" ->
      s"""WITH slid AS (
         |  SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT))
         |           AS wstart, value
         |  FROM events
         |  UNION ALL
         |  SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) - 1) * 1800 * 1000000 AS BIGINT))
         |           AS wstart, value
         |  FROM events)
         |SELECT wstart AS window_start,
         |  wstart + INTERVAL 1 HOUR AS window_end,
         |  COUNT(*) AS n_events,
         |  ${sqlDsum("value")} AS total_value
         |FROM slid
         |GROUP BY 1, 2
         |ORDER BY window_start""".stripMargin,

    "session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, value,
         |    -- >= not >: Spark sessions are half-open [start, last+gap),
         |    -- so an event at exactly last+gap starts a NEW session.
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              >= INTERVAL 30 MINUTE
         |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM e)
         |SELECT user_id,
         |  CAST(min(ts) AS TIMESTAMP) AS session_start,
         |  CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
         |  COUNT(*) AS n_events,
         |  ${sqlDsum("value")} AS total_value
         |FROM sess
         |GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "event_dedup" ->
      """SELECT user_id, event_type,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
        |  min(event_id) AS keeper_event_id,
        |  COUNT(*) AS n_dups
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, hour_bucket""".stripMargin,

    "stream_static_join" ->
      """SELECT e.event_id AS event_id, e.user_id AS user_id,
        |  e.event_type AS event_type, c.c_mktsegment AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY event_id""".stripMargin,

    "stream_stream_join" ->
      """SELECT l.event_id AS event_id, r.event_id AS followup_id,
        |  l.user_id AS user_id
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |  AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTE
        |ORDER BY event_id, followup_id""".stripMargin,

    // same week-truncation + whole-days/7 arithmetic; q6 on the rate
    "cohort_retention" ->
      s"""WITH cohort AS (
         |  SELECT user_id,
         |    CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cw
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |active AS (
         |  SELECT DISTINCT user_id,
         |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
         |  FROM events),
         |cells AS (
         |  SELECT c.cw, date_diff('day', CAST(c.cw AS DATE), CAST(a.w AS DATE)) // 7 AS week_no,
         |    COUNT(DISTINCT a.user_id) AS n_active
         |  FROM active a JOIN cohort c ON c.user_id = a.user_id
         |  WHERE a.w >= c.cw
         |  GROUP BY 1, 2),
         |sizes AS (SELECT cw, COUNT(*) AS cohort_size FROM cohort GROUP BY cw)
         |SELECT cells.cw AS cohort_week, CAST(week_no AS BIGINT) AS week_no,
         |  n_active, cohort_size,
         |  ${sqlQ6("CAST(n_active AS DOUBLE) / cohort_size")} AS retention
         |FROM cells JOIN sizes ON sizes.cw = cells.cw
         |ORDER BY cohort_week, week_no""".stripMargin,

    // the same strict min-chained stages with the 1-day horizon
    // anchored at each user's first view
    "funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2, MIN(v.t1) AS t1
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click'
        |    AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 1 DAY
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > c.t2 AND e.ts <= c.t1 + INTERVAL 1 DAY
        |  GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', COUNT(*) FROM c
        |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
        |ORDER BY stage""".stripMargin,

    // the session assignment of the session_window oracle (>= gap or
    // first ⇒ new session), then string_agg in (ts, event_id) order
    "session_gaps" ->
      """WITH g AS (
        |  SELECT CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_s
        |  FROM (
        |    SELECT ts, lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_ts
        |    FROM events) t
        |  WHERE prev_ts IS NOT NULL),
        |b AS (
        |  SELECT CASE WHEN gap_s = 0 THEN -1
        |    ELSE length(format('{:b}', gap_s)) - 1 END AS log2_bucket,
        |    gap_s
        |  FROM g WHERE gap_s >= 0)
        |SELECT CAST(log2_bucket AS BIGINT) AS log2_bucket,
        |  COUNT(*) AS n_gaps,
        |  MIN(gap_s) AS min_gap, MAX(gap_s) AS max_gap
        |FROM b GROUP BY 1 ORDER BY log2_bucket""".stripMargin,

    // the same gap rule, the same closed-form duration split
    "capped_sessions" ->
      """WITH seq AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) >= 21600
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessed AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS sess
        |  FROM seq),
        |sub AS (
        |  SELECT user_id, sess,
        |    CAST(FLOOR(date_diff('second',
        |      MIN(ts) OVER (PARTITION BY user_id, sess), ts) / 7200.0)
        |      AS BIGINT) AS sub
        |  FROM sessed),
        |cap AS (
        |  SELECT user_id, sess, sub, COUNT(*) AS cnt
        |  FROM sub GROUP BY 1, 2, 3)
        |SELECT user_id, MAX(sess) AS n_sessions,
        |  COUNT(*) AS n_capped, CAST(SUM(cnt) AS BIGINT) AS n_events,
        |  MAX(cnt) AS max_capped_events
        |FROM cap GROUP BY 1 ORDER BY user_id""".stripMargin,

    "twap_daily" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id, CAST(ts AS DATE) AS day,
        |    CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v_micro
        |  FROM events),
        |d AS (
        |  SELECT event_type, day, v_micro,
        |    date_diff('second', ts, lead(ts) OVER (
        |      PARTITION BY event_type, day ORDER BY ts, event_id)) AS dt
        |  FROM e)
        |SELECT event_type, CAST(day AS TIMESTAMP) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(dt) AS BIGINT) AS held_seconds,
        |  CAST(SUM(v_micro * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE)
        |    / 10000.0 AS twap
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY 1, 2 HAVING SUM(dt) > 0
        |ORDER BY event_type, day""".stripMargin,

    "rolling_7d" ->
      """WITH d AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM d ORDER BY user_id, day""".stripMargin,

    "time_interpolate" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS t_s,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) END AS vm
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, event_type, t_s,
        |    last_value(vm IGNORE NULLS) OVER w0 AS v0,
        |    last_value(CASE WHEN vm IS NOT NULL THEN t_s END IGNORE NULLS)
        |      OVER w0 AS t0,
        |    first_value(vm IGNORE NULLS) OVER w1 AS v1,
        |    first_value(CASE WHEN vm IS NOT NULL THEN t_s END IGNORE NULLS)
        |      OVER w1 AS t1
        |  FROM m
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    w1 AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CAST(CASE WHEN t1 = t0 THEN v0
        |    ELSE (v0 * (t1 - t_s) + v1 * (t_s - t0)) // (t1 - t0) END
        |    AS DOUBLE) / 1000000.0 AS value_interp
        |FROM b
        |WHERE event_type = 'click' AND v0 IS NOT NULL AND v1 IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    // identical integer-second gaps, integer power sums, and the one
    // identically-spelled sqrt expression
    "burstiness" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id FROM events),
        |g AS (
        |  SELECT event_type,
        |    (us - lag(us) OVER (PARTITION BY event_type
        |       ORDER BY us, event_id)) // 1000000 AS d
        |  FROM e),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(d) AS BIGINT) AS s, CAST(SUM(d * d) AS BIGINT) AS q
        |  FROM g WHERE d IS NOT NULL GROUP BY 1)
        |SELECT event_type, n, s, q,
        |  CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0
        |    + 0.5) AS DOUBLE) / 1000000.0 AS mean_gap_s,
        |  CAST(FLOOR((sqrt(CAST(n * q - s * s AS DOUBLE))
        |      - CAST(s AS DOUBLE))
        |    / (sqrt(CAST(n * q - s * s AS DOUBLE)) + CAST(s AS DOUBLE))
        |    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS burstiness
        |FROM a ORDER BY event_type""".stripMargin,

    // identical calendar self-join pairing and integer error mass
    "seasonal_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.n, f.n AS fc
        |  FROM daily a JOIN daily f
        |    ON a.event_type = f.event_type AND a.day = f.day + 7)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(ABS(n - fc)) AS BIGINT) AS total_abs_err,
        |  CAST(SUM(n) AS BIGINT) AS total_actual,
        |  CAST(FLOOR(CAST(SUM(ABS(n - fc)) AS DOUBLE)
        |    / CAST(SUM(n) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
        |    / 1000000.0 AS wape
        |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin,

    // the INDEPENDENT brute algorithm: day × activity range join +
    // COUNT DISTINCT — agreement verifies the engine's interval
    // decomposition, not a re-spelling of it
    "rolling_distinct_users" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS t
        |  FROM events),
        |b AS (SELECT MIN(t) AS mn, MAX(t) AS mx FROM a),
        |days AS (SELECT unnest(range(mn, mx + 1)) AS day FROM b)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS distinct_7d
        |FROM days LEFT JOIN a ON a.t BETWEEN day - 6 AND day
        |GROUP BY 1 ORDER BY day""".stripMargin,

    // identical q6 pairwise slopes; the median is the same grid value
    // whatever the tie order
    "theil_sen" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |sl AS (
         |  SELECT a.event_type,
         |    CAST(FLOOR((CAST(b.n - a.n AS DOUBLE) /
         |      CAST(b.day - a.day AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS s6
         |  FROM daily a JOIN daily b ON a.event_type = b.event_type
         |    AND a.day < b.day),
         |rk AS (
         |  SELECT event_type, s6,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY s6) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS np
         |  FROM sl),
         |nd AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
         |  FROM daily GROUP BY 1)
         |SELECT event_type, n_days, np AS n_pairs,
         |  CAST(s6 AS DOUBLE) / 1000000.0 AS sen_slope
         |FROM rk JOIN nd USING (event_type)
         |WHERE rn = (np + 1) // 2
         |ORDER BY event_type""".stripMargin,

    // identical exact-long numerators, micro-quantized candidate
    // scores, (score desc, day) argmax
    "change_localization" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |c AS (
         |  SELECT event_type, day, n,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY day) AS BIGINT) AS t,
         |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS nd,
         |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS s_all
         |  FROM daily),
         |sc AS (
         |  SELECT *,
         |    CAST(FLOOR((CAST(cum * nd - s_all * t AS DOUBLE) *
         |      CAST(cum * nd - s_all * t AS DOUBLE) /
         |      CAST(t * (nd - t) AS DOUBLE)) * 1000000.0 /
         |      CAST(nd * nd AS DOUBLE) + 0.5) AS BIGINT) AS score6
         |  FROM c WHERE t < nd),
         |rk AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY score6 DESC, day) AS rk
         |  FROM sc)
         |SELECT event_type, nd AS n_days, day AS split_day,
         |  t AS n_before,
         |  ${sqlQ6("CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)")}
         |    AS mean_before,
         |  ${sqlQ6("CAST(s_all - cum AS DOUBLE) / CAST(nd - t AS DOUBLE)")}
         |    AS mean_after,
         |  score6
         |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // identical exact integer 8-tap weights and the same q6 divisions
    "ewma_control" -> {
      val wSum = (0 to 7).map(k =>
        s"${math.pow(3, k).toLong * math.pow(4, 7 - k).toLong} * " +
          s"LAG(n, $k) OVER (PARTITION BY event_type ORDER BY day)")
        .mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS sn,
         |    CAST(SUM(n * n) AS BIGINT) AS sq,
         |    CAST(COUNT(*) AS BIGINT) AS nd
         |  FROM daily GROUP BY 1),
         |sm AS (
         |  SELECT event_type, day, n, $wSum AS num FROM daily),
         |j AS (
         |  SELECT s.event_type, s.day, s.n, s.num, t.sn, t.sq, t.nd
         |  FROM sm s JOIN tot t USING (event_type)
         |  WHERE s.num IS NOT NULL)
         |SELECT event_type, day, n AS n_events,
         |  ${sqlQ6("CAST(num AS DOUBLE) / 58975.0")} AS ewma,
         |  ${sqlQ6("(CAST(num AS DOUBLE) / 58975.0 - " +
             "CAST(sn AS DOUBLE) / CAST(nd AS DOUBLE)) / " +
             "sqrt((CAST(nd * sq - sn * sn AS DOUBLE) / " +
             "CAST(nd * (nd - 1) AS DOUBLE)) * 607417225.0 / " +
             "3478050625.0)")} AS z,
         |  CAST(CASE WHEN abs(${sqlQ6("(CAST(num AS DOUBLE) / 58975.0 - " +
             "CAST(sn AS DOUBLE) / CAST(nd AS DOUBLE)) / " +
             "sqrt((CAST(nd * sq - sn * sn AS DOUBLE) / " +
             "CAST(nd * (nd - 1) AS DOUBLE)) * 607417225.0 / " +
             "3478050625.0)")}) > 3.0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_ooc
         |FROM j ORDER BY event_type, day""".stripMargin
    },

    // identical exact S / tie-corrected 18·Var / continuity-corrected
    // q6 z
    "mann_kendall_trend" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |s AS (
         |  SELECT a.event_type,
         |    CAST(SUM(CASE WHEN b.n > a.n THEN 1
         |      WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b ON a.event_type = b.event_type
         |    AND a.day < b.day
         |  GROUP BY 1),
         |ties AS (
         |  SELECT event_type, CAST(SUM(cg) AS BIGINT) AS n_days,
         |    CAST(SUM(cg * (cg - 1) * (2 * cg + 5)) AS BIGINT)
         |      AS tie_term
         |  FROM (SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS cg
         |        FROM daily GROUP BY 1, 2)
         |  GROUP BY 1),
         |v AS (
         |  SELECT s.event_type, n_days, s_stat, tie_term,
         |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18
         |  FROM s JOIN ties USING (event_type))
         |SELECT event_type, n_days, s_stat, tie_term, var18,
         |  ${sqlQ6("CASE WHEN s_stat > 0 THEN " +
             "CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
             "WHEN s_stat < 0 THEN " +
             "CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
             "ELSE 0.0 END")} AS z,
         |  CAST(CASE WHEN abs(${sqlQ6("CASE WHEN s_stat > 0 THEN " +
             "CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
             "WHEN s_stat < 0 THEN " +
             "CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
             "ELSE 0.0 END")}) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_trend
         |FROM v ORDER BY event_type""".stripMargin,

    // identical exact cross-multiplied deviations / long products /
    // q6 division; the same 3e9 envelope guard via error() in a CASE
    "autocorr_daily" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
         |    CAST(SUM(n) AS BIGINT) AS sn
         |  FROM daily GROUP BY 1),
         |dev AS (
         |  SELECT d.event_type, d.day,
         |    CASE WHEN abs(d.n * t.nd - t.sn) > 3000000000
         |      THEN error('autocorr_daily envelope')
         |      ELSE d.n * t.nd - t.sn END AS d
         |  FROM daily d JOIN tot t USING (event_type)),
         |den AS (
         |  SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den
         |  FROM dev GROUP BY 1),
         |num AS (
         |  SELECT a.event_type, b.day - a.day AS lag,
         |    CAST(SUM(a.d * b.d) AS BIGINT) AS num,
         |    CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM dev a JOIN dev b ON a.event_type = b.event_type
         |    AND b.day - a.day BETWEEN 1 AND 7
         |  GROUP BY 1, 2)
         |SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
         |  t.nd AS n_days, n.n_pairs,
         |  ${sqlQ6("CASE WHEN d.den = 0 THEN 0.0 ELSE " +
             "CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE) END")} AS r
         |FROM num n JOIN den d USING (event_type)
         |  JOIN tot t USING (event_type)
         |ORDER BY event_type, lag""".stripMargin,

    // identical per-type cross-multiplied deviations (each by its own
    // day count), exact-long products, one q6 division per (pair, lag)
    "crosscorr_daily" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
         |    CAST(SUM(n) AS BIGINT) AS sn
         |  FROM daily GROUP BY 1),
         |dev AS (
         |  SELECT d.event_type, d.day,
         |    CASE WHEN abs(d.n * t.nd - t.sn) > 3000000000
         |      THEN error('crosscorr_daily envelope')
         |      ELSE d.n * t.nd - t.sn END AS d
         |  FROM daily d JOIN tot t USING (event_type)),
         |den AS (
         |  SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS ss
         |  FROM dev GROUP BY 1),
         |num AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    b.day - a.day AS lag,
         |    CAST(SUM(a.d * b.d) AS BIGINT) AS num,
         |    CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM dev a JOIN dev b ON a.event_type < b.event_type
         |    AND b.day - a.day BETWEEN -3 AND 3
         |  GROUP BY 1, 2, 3)
         |SELECT n.type_a, n.type_b, CAST(n.lag AS BIGINT) AS lag,
         |  n.n_pairs,
         |  ${sqlQ6("CASE WHEN da.ss = 0 OR db.ss = 0 THEN 0.0 ELSE " +
             "CAST(n.num AS DOUBLE) / (sqrt(CAST(da.ss AS DOUBLE)) * " +
             "sqrt(CAST(db.ss AS DOUBLE))) END")} AS r
         |FROM num n
         |  JOIN den da ON da.event_type = n.type_a
         |  JOIN den db ON db.event_type = n.type_b
         |ORDER BY type_a, type_b, lag""".stripMargin,

    // identical centi quantization of cross-multiplied deviations,
    // order-free long sums of squares, one guarded q6 strength
    "seasonal_strength" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS eday,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |dd AS (SELECT event_type, eday, n, (eday + 3) % 7 AS dow
         |       FROM daily),
         |bydow AS (
         |  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS nw,
         |    CAST(SUM(n) AS BIGINT) AS sw
         |  FROM dd GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
         |    CAST(SUM(n) AS BIGINT) AS sn
         |  FROM dd GROUP BY 1),
         |terms AS (
         |  SELECT dd.event_type,
         |    CASE WHEN abs(CAST(FLOOR(CAST(dd.n * b.nw - b.sw AS DOUBLE)
         |        * 100.0 / CAST(b.nw AS DOUBLE) + 0.5) AS BIGINT))
         |        > 3000000000 THEN error('seasonal_strength envelope')
         |      ELSE CAST(FLOOR(CAST(dd.n * b.nw - b.sw AS DOUBLE)
         |        * 100.0 / CAST(b.nw AS DOUBLE) + 0.5) AS BIGINT)
         |      END AS rm,
         |    CASE WHEN abs(CAST(FLOOR(CAST(dd.n * t.nd - t.sn AS DOUBLE)
         |        * 100.0 / CAST(t.nd AS DOUBLE) + 0.5) AS BIGINT))
         |        > 3000000000 THEN error('seasonal_strength envelope')
         |      ELSE CAST(FLOOR(CAST(dd.n * t.nd - t.sn AS DOUBLE)
         |        * 100.0 / CAST(t.nd AS DOUBLE) + 0.5) AS BIGINT)
         |      END AS dm
         |  FROM dd JOIN bydow b ON b.event_type = dd.event_type
         |    AND b.dow = dd.dow
         |  JOIN tot t ON t.event_type = dd.event_type)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(SUM(rm * rm) AS BIGINT) AS ss_resid_c2,
         |  CAST(SUM(dm * dm) AS BIGINT) AS ss_total_c2,
         |  ${sqlQ6("CASE WHEN SUM(dm * dm) = 0 THEN 0.0 ELSE " +
             "greatest(0.0, 1.0 - CAST(SUM(rm * rm) AS DOUBLE) / " +
             "CAST(SUM(dm * dm) AS DOUBLE)) END")} AS strength
         |FROM terms GROUP BY 1 ORDER BY event_type""".stripMargin,

    // identical strict-tie turning-point count over the observed-day
    // order; one guarded q6 z
    "turning_points" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |m AS (
         |  SELECT event_type, n,
         |    LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS p,
         |    LEAD(n) OVER (PARTITION BY event_type ORDER BY day) AS f
         |  FROM daily),
         |agg AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |    CAST(SUM(CASE WHEN p IS NOT NULL AND f IS NOT NULL AND
         |        ((p < n AND n > f) OR (p > n AND n < f))
         |      THEN 1 ELSE 0 END) AS BIGINT) AS t_stat
         |  FROM m GROUP BY 1)
         |SELECT event_type, n_days, t_stat,
         |  ${sqlQ6("CASE WHEN n_days < 3 THEN 0.0 ELSE " +
             "(CAST(t_stat AS DOUBLE) - " +
             "2.0 * CAST(n_days - 2 AS DOUBLE) / 3.0) / " +
             "sqrt(CAST(16 * n_days - 29 AS DOUBLE) / 90.0) END")} AS z,
         |  CAST(CASE WHEN abs(${sqlQ6(
             "CASE WHEN n_days < 3 THEN 0.0 ELSE " +
             "(CAST(t_stat AS DOUBLE) - " +
             "2.0 * CAST(n_days - 2 AS DOUBLE) / 3.0) / " +
             "sqrt(CAST(16 * n_days - 29 AS DOUBLE) / 90.0) END")}) > 1.96
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_nonrandom
         |FROM agg ORDER BY event_type""".stripMargin,

    // identical integer runs count / mean cross-multiply / guarded
    // q6 z
    "runs_test_drift" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS sn,
         |    CAST(COUNT(*) AS BIGINT) AS nd
         |  FROM daily GROUP BY 1),
         |marked AS (
         |  SELECT d.event_type, d.day, (d.n * t.nd > t.sn) AS above,
         |    LAG(d.n * t.nd > t.sn) OVER (
         |      PARTITION BY d.event_type ORDER BY d.day) AS prev
         |  FROM daily d JOIN tot t USING (event_type)),
         |agg AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> above
         |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs,
         |    CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2
         |  FROM marked GROUP BY 1),
         |zc AS (
         |  SELECT event_type, n1, n2, runs,
         |    ${sqlQ6("CASE WHEN n1 = 0 OR n2 = 0 OR (n1 = 1 AND n2 = 1) " +
             "THEN 0.0 ELSE " +
             "(CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * " +
             "CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))) / " +
             "sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * " +
             "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - " +
             "CAST(n1 + n2 AS DOUBLE))) / (CAST(n1 + n2 AS DOUBLE) * " +
             "CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))" +
             " END")} AS z
         |  FROM agg)
         |SELECT event_type, n1, n2, runs, z,
         |  CAST(CASE WHEN abs(z) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_nonrandom
         |FROM zc ORDER BY event_type""".stripMargin,

    // identical integer running sum / prefix-min / zero clamp /
    // squared 5σ cross-multiply
    "cusum_changepoints" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS sum_n,
        |    CAST(SUM(n * n) AS BIGINT) AS sum_q,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |s AS (
        |  SELECT d.event_type, d.day, d.n, t.sum_n, t.sum_q, t.n_days,
        |    SUM(t.n_days * d.n - t.sum_n) OVER (
        |      PARTITION BY d.event_type ORDER BY d.day) AS run
        |  FROM daily d JOIN tot t USING (event_type)),
        |v AS (
        |  SELECT event_type, day, n, sum_n, sum_q, n_days,
        |    GREATEST(run - LEAST(0, COALESCE(MIN(run) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)),
        |      0) AS vs
        |  FROM s)
        |SELECT event_type, day, n AS n_events, CAST(vs AS BIGINT) AS v_scaled,
        |  CAST(CASE WHEN vs * vs > 25 * (n_days * sum_q - sum_n * sum_n)
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_change
        |FROM v ORDER BY event_type, day""".stripMargin,

    "rolling_anomaly" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, day, n,
        |    COUNT(n) OVER w AS base_n,
        |    CAST(SUM(n) OVER w AS BIGINT) AS s1,
        |    CAST(SUM(n * n) OVER w AS BIGINT) AS s2
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n AS n_events, s1 AS base_sum,
        |  CASE WHEN (7 * n - s1) * (7 * n - s1)
        |         > 4 * (7 * s2 - s1 * s1)
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_anomaly
        |FROM b WHERE base_n = 7
        |ORDER BY event_type, day""".stripMargin,

    "decayed_activity" ->
      """WITH d AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day
        |  FROM events),
        |r AS (SELECT MAX(day) AS ref_day FROM d),
        |q AS (
        |  SELECT user_id,
        |    CAST(FLOOR(exp(CAST(day - ref_day AS DOUBLE) / 7.0) * 10000.0
        |      + 0.5) AS BIGINT) AS qterm
        |  FROM d CROSS JOIN r)
        |SELECT user_id, CAST(SUM(qterm) AS DOUBLE) / 10000.0
        |    AS decayed_score,
        |  COUNT(*) AS n_events
        |FROM q GROUP BY 1 ORDER BY user_id""".stripMargin,

    "event_transitions" ->
      """WITH pr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n
        |      FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
        |      FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, n,
        |  CAST(FLOOR(CAST(n AS DOUBLE) / tot * 1000000.0 + 0.5) AS DOUBLE)
        |    / 1000000.0 AS p
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    "event_paths" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e),
        |p AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM sess GROUP BY user_id, sid)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // per-user day grid via generate_series; same zero-fill and
    // IGNORE NULLS carry-forward
    "time_resample" ->
      s"""WITH daily AS (
         |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         |    COUNT(*) AS n_events, ${sqlDsum("value")} AS day_value
         |  FROM events WHERE user_id % 25 = 3 GROUP BY 1, 2),
         |grid AS (
         |  SELECT user_id,
         |    unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS day
         |  FROM daily GROUP BY user_id)
         |SELECT g.user_id, g.day,
         |  COALESCE(d.n_events, 0) AS n_events,
         |  COALESCE(d.day_value, 0.0) AS day_value,
         |  LAST_VALUE(d.day_value IGNORE NULLS) OVER (
         |    PARTITION BY g.user_id ORDER BY g.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
         |FROM grid g LEFT JOIN daily d
         |  ON g.user_id = d.user_id AND g.day = d.day
         |ORDER BY g.user_id, g.day""".stripMargin,
  )
}
