package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` schema — SURVEY.md
  * §2.H (T1–T9). Every transform here takes a DataFrame and works
  * identically whether it came from `readStream` or `read`: the batch
  * twins in graft.queries.EventTime are these same computations, which
  * is what lets the DuckDB oracle check their semantics (§2.H note).
  * EventStreamsSpec drives them through MemoryStream and checks the
  * streaming results against the batch twin on the same rows.
  *
  * Watermarks (T4) bound the state of every stateful operator — at
  * 100 TB/day of events the state store holds only the open windows
  * inside the watermark horizon, not history.
  */
object EventStreams {

  /** S9: file-based streaming source over the events layout. A stream
    * source needs a declared schema, and the events fixture has shipped
    * `ts` as two physical types across generations (TIMESTAMP(NANOS) —
    * unreadable by the vectorized reader, so read as nano Long and
    * converted with exact integer arithmetic; and unadjusted
    * TIMESTAMP(MICROS) = TIMESTAMP_NTZ). Probe the footer ONCE with a
    * batch read of the already-present files (a file stream is defined
    * over an existing layout) and declare the matching schema; both
    * paths normalize to a session-zone (UTC) timestamp identical to
    * Tables.events. */
  def fileSource(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(physical).parquet(path)
    physical("ts").dataType match {
      case LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case _ => stream
    }
  }

  /** T1 + T4: watermarked tumbling 1-hour counts per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** T2: sliding 1-hour window with a 30-minute hop. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** T3: 30-minute-gap session windows per user. */
  def sessionize(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** T5: exactly-once by event_id, with dedup state EVICTED once the
    * watermark passes an id's first-seen event time.
    * `dropDuplicatesWithinWatermark` is the id-only dedup spelling whose
    * state store is watermark-bounded — a plain
    * `dropDuplicates("event_id")` (without the event-time column in the
    * subset) would retain every id ever seen, which breaks the
    * bounded-state contract at 100 TB/day. Re-deliveries later than the
    * watermark horizon are by definition out-of-contract. */
  def dedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** T7: enrich a stream with a static dimension (broadcast at scale). */
  def enrichStatic(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** T8: stream–stream self-join — events followed by another event of
    * the same user within 5 minutes; both sides watermarked so state
    * is droppable. */
  def followWithin5Min(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.withWatermark("ts", "1 hour").as("l")
    val r = b.withWatermark("ts", "1 hour").as("r")
    l.join(r, expr(
      """l.user_id = r.user_id AND
        |r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTES""".stripMargin))
      .select(col("l.event_id").as("event_id"),
        col("r.event_id").as("followup_id"), col("l.user_id").as("user_id"))
  }

  /** Streaming point-in-time enrichment: each micro-batch is as-of
    * joined (latest build row with ts <= event ts, per key) against a
    * bounded static dimension through the custom broadcast operator
    * (graft.plans.BroadcastAsOfJoinExec) inside foreachBatch — the
    * standard composition for running a batch-planned custom operator
    * under Structured Streaming without re-implementing it as a
    * stateful op. Zero shuffle per batch: the micro-batch streams
    * through unmoved, the dimension is broadcast once per batch. */
  def asofEnrichEachBatch(
      events: DataFrame,
      build: DataFrame,
      key: String, buildKey: String,
      ts: String, buildTs: String,
      payload: Seq[String])(sink: DataFrame => Unit) =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.operators.AsOfJoin.asofBroadcast(batch, build,
        batch(key), build(buildKey), batch(ts), build(buildTs), payload))
    }

  final case class UserEvent(event_id: Long, user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  final case class TypedEvent(event_id: Long, user_id: Long, ts: Long,
      event_type: String)
  final case class Transition(user_id: Long, from_type: String,
      to_type: String)
  // public: the state encoder's generated code must reach the class
  final case class LastEvent(ts: Long, event_id: Long, event_type: String)

  /** T19 live: streaming first-touch counts — the growth-curve feed
    * (`cumulative_uniques`' per-day new_users column) computed on an
    * unbounded stream: the first arrival per user_id survives
    * dropDuplicates, then a per-day count. STATE CAVEAT, documented
    * deliberately: "distinct ever" state is inherently unbounded (one
    * entry per user forever — no watermark can evict it without
    * changing the semantics); at 100 TB the production variants are
    * dropDuplicatesWithinWatermark (bounded horizon, approximate
    * "new") or a Bloom-backed membership store. Emitted day counts
    * equal the batch first-touch aggregation when events arrive in
    * event-time order (the transitions-spec contract). */
  def firstTouchCounts(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      // ORDER CAVEAT (silent at runtime, so stated at the code too):
      // dropDuplicates keeps the first ARRIVAL per user, not the
      // earliest EVENT TIME — a late-but-within-watermark first event
      // arriving after a later one attributes the first touch to the
      // wrong day, diverging from the batch twin. And this state never
      // evicts (one entry per user forever). Both are the price of
      // exact "distinct ever" semantics; use
      // [[firstTouchCountsBounded]] when a bounded horizon is
      // acceptable.
      .dropDuplicates("user_id")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("new_users"))
      .select(col("w.start").as("day"), col("new_users"))

  /** The production-bounded variant of [[firstTouchCounts]]:
    * `dropDuplicatesWithinWatermark` evicts a user's dedup entry once
    * the watermark passes it, so state is bounded by the horizon's
    * churn instead of all-time distinct users. Semantics change
    * accordingly — a user returning after a full watermark gap counts
    * as "new" again (re-activation, not strictly first touch), the
    * standard trade every at-scale growth feed makes. */
  def firstTouchCountsBounded(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("new_users"))
      .select(col("w.start").as("day"), col("new_users"))

  /** T14 live: per-user event-type transitions over an unbounded
    * stream — the state is ONE row (the user's latest event); each
    * arriving event emits its (previous → current) transition and
    * advances the state, so the emitted multiset equals the batch
    * lead-window pairing when events arrive per user in (ts, event_id)
    * order (intra-micro-batch order restored by a local sort). The
    * downstream count/normalize is an ordinary streaming or batch
    * aggregation over the emitted pairs. */
  def transitionStream(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[TypedEvent], state: GroupState[LastEvent]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            last.foreach(p =>
              out += Transition(userId, p.event_type, e.event_type))
            last = Some(LastEvent(e.ts, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class SessEv(ts: Long, event_id: Long, event_type: String)
  final case class SessionState(startTs: Long, lastTs: Long,
      evs: Seq[SessEv])
  final case class SessionPath(user_id: Long, session_start: Long,
      path: String)

  /** T12 live: streaming session paths — the per-user state is the one
    * OPEN session (start, last event time, its ordered events); an
    * arriving event either extends it (gap < `gapMicros`) or CLOSES it
    * — emitting the closed session's `>`-joined event-type path — and
    * opens the next. Emitted paths therefore equal the batch
    * `session_window` sessionization on the same rows across any
    * micro-batch split, for every session that a later event has
    * closed (the still-open tail session lives only in state; a feed
    * that wants it flushed appends a sentinel event past the gap, as
    * the spec does). Session membership uses the same `gap >= 30min
    * starts a new session` boundary as the batch/oracle spelling, and
    * the path orders events by (ts, event_id) exactly like the batch
    * `sort_array(collect_list(struct(ts, event_id, event_type)))`.
    * State is one open session per user — bounded by session length,
    * not history (the capped_sessions cap composes for hostile
    * feeds). */
  def pathsStream(events: Dataset[TypedEvent],
      gapMicros: Long = 1800000000L): Dataset[SessionPath] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionPath](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[TypedEvent],
            state: GroupState[SessionState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessionPath]
          def pathOf(s: SessionState): String =
            s.evs.sortBy(e => (e.ts, e.event_id))
              .map(_.event_type).mkString(">")
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val ev = SessEv(e.ts, e.event_id, e.event_type)
            if (st == null)
              st = SessionState(e.ts, e.ts, Vector(ev))
            else if (e.ts - st.lastTs >= gapMicros) {
              out += SessionPath(uid, st.startTs, pathOf(st))
              st = SessionState(e.ts, e.ts, Vector(ev))
            } else
              st = SessionState(st.startTs, e.ts, st.evs :+ ev)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  final case class FunnelState(tEntry: Long, level: Int, tLevel: Long)
  final case class FunnelLevel(user_id: Long, level: Int, t_entry: Long,
      t_level: Long)

  /** T10 live: streaming windowFunnel — the per-user state is the
    * batch chain itself (anchor = first stage-1 event; stage i = the
    * earliest stage-i event strictly after stage i−1 and within the
    * window of the anchor), advanced greedily as events arrive. With
    * per-user event-time-ordered arrival (the transitions-spec
    * contract; intra-batch order restored by a local sort) the greedy
    * advance picks exactly the batch operator's earliest-chain, so
    * the LAST emitted level per user equals
    * [[graft.operators.Funnel.windowFunnel]] on the same rows across
    * any micro-batch split. State is three numbers per user — far
    * below any horizon bound. Emits one row per advancement. */
  def funnelStream(events: Dataset[TypedEvent], stages: Seq[String],
      windowMicros: Long): Dataset[FunnelLevel] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelLevel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[TypedEvent],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[FunnelLevel]
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            if (st == null) {
              if (e.event_type == stages.head) {
                st = FunnelState(e.ts, 1, e.ts)
                out += FunnelLevel(uid, 1, e.ts, e.ts)
              }
            } else if (st.level < stages.length &&
                e.event_type == stages(st.level) &&
                e.ts > st.tLevel && e.ts <= st.tEntry + windowMicros) {
              st = FunnelState(st.tEntry, st.level + 1, e.ts)
              out += FunnelLevel(uid, st.level, st.tEntry, st.tLevel)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class DayBucket(day: Long, n: Long)
  final case class AnomalyState(curDay: Long, curN: Long,
      hist: Seq[DayBucket])
  final case class AnomalyFlag(event_type: String, day: Long,
      n_events: Long, base_sum: Long, is_anomaly: Long)

  /** T22 live: trailing-baseline anomaly flags over a live stream —
    * per EVENT TYPE, the state is the day in progress (day index +
    * running count) plus the last 7 FINALIZED days; an event landing
    * on a later day closes the open day (emitting its integer z²-test
    * verdict (7x−S)² > 4·(7Q−S²) once the 7-day baseline is full —
    * identical to the batch row, no sqrt, no double) and pushes it
    * into the baseline. One stateful operator, no upstream streaming
    * aggregation (the per-key sequential fold IS the daily count), so
    * the shape clears the stateful-chaining restrictions; arrival
    * contract is the family's ts-ordered feed, and the still-open
    * final day flushes via a sentinel past it (as the spec does).
    * State per type = 8 small rows — bounded by the baseline width,
    * not history. */
  def anomalyStream(events: Dataset[TypedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[AnomalyState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AnomalyFlag]
          def close(): Unit = {
            // finalize the open day: test against the 7 prior observed
            // days, then push it into the baseline
            if (st.hist.length == 7) {
              val s1 = st.hist.map(_.n).sum
              val s2 = st.hist.map(b => b.n * b.n).sum
              val d = 7L * st.curN - s1
              val anom = if (d * d > 4L * (7L * s2 - s1 * s1)) 1L else 0L
              out += AnomalyFlag(etype, st.curDay, st.curN, s1, anom)
            }
            st = AnomalyState(-1L, 0L,
              (st.hist :+ DayBucket(st.curDay, st.curN)).takeRight(7))
          }
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            if (st == null) st = AnomalyState(day, 1L, Vector.empty)
            else if (day == st.curDay)
              st = AnomalyState(st.curDay, st.curN + 1L, st.hist)
            else { close(); st = AnomalyState(day, 1L, st.hist) }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  final case class CohortState(cohortWeekDay: Long, weeks: Seq[Long])
  final case class CohortCell(user_id: Long, cohort_week_day: Long,
      week_no: Long)

  /** Monday-truncated week start in EPOCH DAYS of a micros timestamp
    * (UTC) — exact integer arithmetic twin of
    * `date_trunc('week', ts)`: 1970-01-01 was a Thursday, so Monday
    * offset = (day + 3) mod 7. */
  private def weekDayOf(micros: Long): Long = {
    val day = Math.floorDiv(micros, 86400000000L)
    day - Math.floorMod(day + 3L, 7L)
  }

  /** T11 live: streaming cohort-retention cells — emits (user,
    * cohort week, week_no) exactly ONCE per user-week with activity
    * at or after the user's signup week; the downstream distinct
    * count per (cohort, week_no) is an ordinary aggregation, and the
    * emitted cell set equals the batch cohort join on the same rows
    * across any micro-batch split. Activity weeks seen BEFORE the
    * signup arrives are buffered in state and flushed when the
    * cohort anchors (an event earlier in the user's own signup week
    * must still produce that week's cell — the batch join has no
    * arrival-order blind spot, so neither may the stream). State =
    * the cohort anchor + the distinct weeks seen; distinct-ever weeks
    * are inherently unbounded (the firstTouchCounts caveat) — a
    * production horizon swaps the week list for a watermark-bounded
    * window. */
  def cohortStream(events: Dataset[TypedEvent],
      signupType: String = "signup"): Dataset[CohortCell] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortCell](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[TypedEvent],
            state: GroupState[CohortState]) =>
          var st = state.getOption.getOrElse(CohortState(-1L, Seq.empty))
          val out = Seq.newBuilder[CohortCell]
          def emit(w: Long): Unit =
            if (st.cohortWeekDay >= 0L && w >= st.cohortWeekDay)
              out += CohortCell(uid, st.cohortWeekDay,
                (w - st.cohortWeekDay) / 7L)
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val w = weekDayOf(e.ts)
            if (st.cohortWeekDay < 0L && e.event_type == signupType) {
              st = CohortState(weekDayOf(e.ts), st.weeks)
              st.weeks.foreach(emit)
            }
            if (!st.weeks.contains(w)) {
              st = CohortState(st.cohortWeekDay, st.weeks :+ w)
              emit(w)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class ValuedEvent(event_id: Long, user_id: Long, ts: Long,
      event_type: String, v_micro: Long)
  final case class Touch(ts: Long, event_id: Long, event_type: String)
  final case class TouchState(touches: Seq[Touch])
  final case class TouchCredit(conv_id: Long, event_type: String,
      touch_position: String, credit_micro: Long)

  /** T24 live: streaming U-shaped touch attribution — per-user state
    * is the 7-day touch window (pruned as event time advances, so
    * state is horizon-bounded by construction); each arriving
    * conversion allocates its value over the touches in
    * [conv − 7d, conv) with the IDENTICAL all-integer 40/20/40 split
    * as the batch query (solo keeps all; first 40%; last the
    * remainder at cnt=2 else 40%; middles split the rest with
    * round-robin pennies), so the emitted credit rows equal the
    * batch window allocation on the same rows across any micro-batch
    * split. */
  def attributionStream(events: Dataset[ValuedEvent],
      convType: String = "purchase",
      windowMicros: Long = 7L * 86400000000L): Dataset[TouchCredit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, TouchCredit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[ValuedEvent],
            state: GroupState[TouchState]) =>
          var touches = state.getOption.map(_.touches)
            .getOrElse(Seq.empty)
          val out = Seq.newBuilder[TouchCredit]
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            touches = touches.dropWhile(_.ts < e.ts - windowMicros)
            if (e.event_type == convType) {
              val win = touches.filter(t => t.ts < e.ts)
              val cnt = win.size.toLong
              val v = e.v_micro
              win.zipWithIndex.foreach { case (t, i) =>
                val rn = i + 1L
                val head = (v * 40L) / 100L
                val credit =
                  if (cnt == 1L) v
                  else if (rn == 1L) head
                  else if (rn == cnt) {
                    if (cnt == 2L) v - head else head
                  } else {
                    val mid = v - 2L * head
                    mid / (cnt - 2L) +
                      (if (rn - 1L <= mid % (cnt - 2L)) 1L else 0L)
                  }
                val position =
                  if (cnt == 1L) "solo"
                  else if (rn == 1L) "first"
                  else if (rn == cnt) "last"
                  else "middle"
                out += TouchCredit(e.event_id, t.event_type, position,
                  credit)
              }
            } else {
              touches = touches :+ Touch(e.ts, e.event_id, e.event_type)
            }
          }
          state.update(TouchState(touches))
          out.result().iterator
      }
  }

  // ---- streaming drift family: the live twins of the batch drift
  // trio (L86 psi_drift / G26 ks_drift / T26 cusum_changepoints).
  // Drift detection is the most natural LIVE consumer in the whole
  // inventory — a model owner watches the feature feed, not a nightly
  // batch — and the state shapes are all bounded: per event type, a
  // fixed bin histogram (PSI/KS) or four numbers (CUSUM). ----

  // public: the state encoder's generated code must reach the classes
  final case class BinCell(bin: Long, ca: Long, cb: Long)
  final case class DriftBins(seq: Long, bins: Seq[BinCell])
  final case class PsiRow(event_type: String, seq: Long, n_bins: Long,
      skipped_bins: Long, na: Long, nb: Long, psi: Double)
  final case class KsRow(event_type: String, seq: Long, n1: Long,
      n2: Long, d_num: Long, ks_stat: Double, crit_05: Double,
      reject_05: Long)

  /** Fold a micro-batch into the per-type bin histogram: values land
    * in fixed-width bins (v_micro DIV binUnit — the batch queries'
    * `floor(value / 25.0)` on the 10⁻⁴-unit integer grid), split into
    * the A window (ts < cut) and the B window, then CLAMPED into
    * [binFloor, binCeil] — the two end bins are overflow bins, so
    * state per type is ≤ (binCeil − binFloor + 1) cells whatever the
    * feed does (an adversarial or fat-tailed live stream cannot grow
    * state; the same documented bounded-state trade ksStreamBinned
    * already makes vs exact KS). The defaults never clip the
    * engine's fixtures, so the stream == batch pins hold unclamped. */
  private def foldBins(st: DriftBins, rows: Iterator[ValuedEvent],
      cutMicros: Long, binUnit: Long, binFloor: Long,
      binCeil: Long): DriftBins = {
    val m = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    st.bins.foreach(b => m(b.bin) = (b.ca, b.cb))
    rows.foreach { e =>
      val raw = Math.floorDiv(e.v_micro, binUnit)
      val bin = math.max(binFloor, math.min(binCeil, raw))
      val (ca, cb) = m.getOrElse(bin, (0L, 0L))
      m(bin) = if (e.ts < cutMicros) (ca + 1L, cb) else (ca, cb + 1L)
    }
    DriftBins(st.seq + 1L,
      m.toSeq.map { case (b, (ca, cb)) => BinCell(b, ca, cb) }
        .sortBy(_.bin))
  }

  /** L86 live: streaming PSI — per event type, the state is the binned
    * (A, B)-window histogram; every trigger emits the PSI over the
    * data so far with the IDENTICAL micro-nat quantized term spelling
    * as the batch `psi_drift` (per live bin, floor(((ca/na − cb/nb) ·
    * ln(ca·nb / (cb·na))) · 10⁶ + ½), summed order-free), so once the
    * feed is ingested the latest row per type EQUALS the batch row
    * across any micro-batch split. Bins empty on either side are
    * skipped and counted, exactly as the batch row reports them; a
    * type with no live bin yet emits nothing (the batch query has no
    * row for it either). `seq` is the per-type emission counter — the
    * "latest verdict" selector for consumers of the append stream.
    *
    * Input contract: `v_micro` is the HALF-UP-ROUNDED 10⁻⁴-unit
    * integer value (`floor(value·10⁴ + ½)` — the engine-wide micro
    * grid). The stream == batch guarantee is exact because both sides
    * bin the same integer: a caller feeding raw values quantized any
    * other way binned through `floorDiv(v_micro, binUnit)` can land
    * values within 0.5·10⁻⁴ of a bin boundary in the adjacent bin vs
    * the batch `floor(value/25.0)`. Stay on the grid.
    *
    * Envelope: the PSI term multiplies counts as longs (ca·nb, cb·na),
    * so per type na·nb must stay below 2⁶³ (~3·10⁹ events per window
    * per type); past that, pre-aggregate upstream or widen to the
    * batch spelling's double products.
    *
    * State bound: bins clamp into [binFloor, binCeil] (overflow end
    * bins) — ≤ binCeil−binFloor+1 cells per type regardless of feed. */
  def psiStream(events: Dataset[ValuedEvent], cutMicros: Long,
      binUnit: Long = 250000L, binFloor: Long = -256L,
      binCeil: Long = 255L, evictAfterDays: Int = 0): Dataset[PsiRow] = {
    import events.sparkSession.implicits._
    // opt-in idle-type eviction (the T41 hygiene knob for the drift
    // monitors): > 0 attaches the 1-day watermark + an event-time
    // timeout armed at last-event + N days, so a type nobody feeds
    // anymore retires its histogram instead of holding it forever.
    // The trade is stated: with a watermark, rows more than a day
    // stale drop as late data (NoTimeout accepts any order) — the
    // default 0 keeps the accept-everything monitor unchanged.
    val src = if (evictAfterDays > 0) withDayWatermark(events) else events
    src.groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftBins, PsiRow](
        OutputMode.Append(),
        if (evictAfterDays > 0) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[ValuedEvent],
            state: GroupState[DriftBins]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var maxTs = Long.MinValue
          val tracked = rows.map { e =>
            if (e.ts > maxTs) maxTs = e.ts; e }
          val st = foldBins(
            state.getOption.getOrElse(DriftBins(0L, Vector.empty)),
            tracked, cutMicros, binUnit, binFloor, binCeil)
          state.update(st)
          if (evictAfterDays > 0 && maxTs != Long.MinValue) {
            // an actively-feeding type whose events LAG the global
            // watermark by more than the horizon must not be clamped
            // to watermark+1 (it would be evicted between its own
            // micro-batches, silently discarding the A-window): when
            // the event-time point is already at or behind the
            // watermark, grant a FULL quiet horizon measured from
            // watermark time instead
            val horizonMs = evictAfterDays.toLong * 86400000L
            val byEvent = maxTs / 1000L + horizonMs
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
              if (byEvent > wm) byEvent else wm + horizonMs)
          }
          val na = st.bins.map(_.ca).sum
          val nb = st.bins.map(_.cb).sum
          val live = st.bins.filter(b => b.ca > 0L && b.cb > 0L)
          if (live.isEmpty) Iterator.empty
          else {
            val t = live.map { b =>
              val term = (b.ca.toDouble / na - b.cb.toDouble / nb) *
                math.log((b.ca * nb).toDouble / (b.cb * na).toDouble)
              math.floor(term * 1000000.0 + 0.5).toLong
            }.sum
            Iterator.single(PsiRow(etype, st.seq, st.bins.length.toLong,
              st.bins.count(b => b.ca == 0L || b.cb == 0L).toLong,
              na, nb, t.toDouble / 1000000.0))
          }
          }
      }
  }

  /** G26 live, the windowed (binned) variant: streaming two-sample KS
    * over the same bounded bin histogram as [[psiStream]] — the exact
    * per-distinct-value KS stays batch (its state is the value domain,
    * unbounded at corpus scale; binning is the standard bounded-state
    * trade and the statistic's resolution is the bin width). The gap
    * maximized is the exact integer |cum1·n2 − cum2·n1| over the bin
    * order, and the reported statistic / α=0.05 critical value /
    * reject decision use the identical q6 spelling as the batch
    * `ks_drift`, so the stream equals a batch KS over the same binned
    * values across any micro-batch split.
    *
    * Input contract and state bound: as [[psiStream]] — `v_micro` is
    * the half-up-rounded 10⁻⁴-unit integer (off-grid quantizations can
    * flip boundary values into the adjacent bin vs the batch
    * `floor(value/25.0)`), and bins clamp into [binFloor, binCeil]
    * overflow end bins, so per-type state is bounded whatever the
    * live feed does. */
  def ksStreamBinned(events: Dataset[ValuedEvent], cutMicros: Long,
      binUnit: Long = 250000L, binFloor: Long = -256L,
      binCeil: Long = 255L, evictAfterDays: Int = 0): Dataset[KsRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    // same opt-in idle-type eviction trade as psiStream (see there)
    val src = if (evictAfterDays > 0) withDayWatermark(events) else events
    src.groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftBins, KsRow](
        OutputMode.Append(),
        if (evictAfterDays > 0) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[ValuedEvent],
            state: GroupState[DriftBins]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var maxTs = Long.MinValue
          val tracked = rows.map { e =>
            if (e.ts > maxTs) maxTs = e.ts; e }
          val st = foldBins(
            state.getOption.getOrElse(DriftBins(0L, Vector.empty)),
            tracked, cutMicros, binUnit, binFloor, binCeil)
          state.update(st)
          if (evictAfterDays > 0 && maxTs != Long.MinValue) {
            // an actively-feeding type whose events LAG the global
            // watermark by more than the horizon must not be clamped
            // to watermark+1 (it would be evicted between its own
            // micro-batches, silently discarding the A-window): when
            // the event-time point is already at or behind the
            // watermark, grant a FULL quiet horizon measured from
            // watermark time instead
            val horizonMs = evictAfterDays.toLong * 86400000L
            val byEvent = maxTs / 1000L + horizonMs
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
              if (byEvent > wm) byEvent else wm + horizonMs)
          }
          val n1 = st.bins.map(_.ca).sum
          val n2 = st.bins.map(_.cb).sum
          if (n1 == 0L || n2 == 0L) Iterator.empty
          else {
            var cum1 = 0L; var cum2 = 0L; var d = 0L
            st.bins.foreach { b =>
              cum1 += b.ca; cum2 += b.cb
              d = math.max(d, math.abs(cum1 * n2 - cum2 * n1))
            }
            val ks = q6d(d.toDouble / (n1.toDouble * n2.toDouble))
            val crit = q6d(1.358 * math.sqrt(
              (n1 + n2).toDouble / (n1.toDouble * n2.toDouble)))
            Iterator.single(KsRow(etype, st.seq, n1, n2, d, ks, crit,
              if (ks > crit) 1L else 0L))
          }
          }
      }
  }

  /** Attach a ONE-DAY event-time watermark over the micros `ts` field
    * so the SPC streams' day-close can fire from WATERMARK progress
    * (`GroupStateTimeout.EventTimeTimeout`, timestamp = the open
    * day's end — so the flush lands one day past the open day)
    * instead of requiring a per-type later-day sentinel: the
    * watermark is GLOBAL across keys, so any event anywhere a day
    * past a type's open-day end closes that day — the deployment
    * reality, where one quiet type must not hold its last verdict
    * hostage to its own next event.
    *
    * The delay doubles as the disorder horizon: Spark drops input
    * rows behind the watermark BEFORE a timeout-enabled
    * flatMapGroupsWithState sees them (standard late-data semantics),
    * so the day-monotone REFUSAL fires for disorder within one day of
    * the global frontier — the recoverable producer bug worth failing
    * loudly on — while rows more than a day stale drop as late data,
    * exactly as they would at any windowed aggregation. Batch
    * (non-streaming) inputs pass through (watermarks are a streaming
    * concept; the fold then closes days on data only). */
  private def withDayWatermark[T](events: Dataset[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] =
    if (!events.isStreaming) events
    else events.toDF()
      .withColumn("__graft_event_ts", expr("timestamp_micros(ts)"))
      .withWatermark("__graft_event_ts", "1 day")
      .as[T]

  /** Idle-type state retirement for the SPC streams: after a day
    * closes via the watermark flush, schedule ONE more event-time
    * timeout `evictAfterDays` past the closed day's end; if it fires
    * with the type still quiet, the type's state is REMOVED — state
    * stays bounded over an OPEN type domain (without eviction,
    * per-type state lives forever once a type appears).
    * `evictAfterDays = 0` (the default) keeps the persist-forever
    * behavior. Safe against the day-monotone refusal: an event that
    * survives the 1-day watermark filter after the eviction point is
    * strictly newer than the evicted closed day, so a reappearing
    * type restarts as a fresh series — the standard control-chart
    * restart, documented per stream. */
  private def scheduleEviction(state: GroupState[_], dayEndMs: Long,
      evictAfterDays: Int): Unit =
    if (evictAfterDays > 0) {
      val evictMs = dayEndMs + evictAfterDays.toLong * 86400000L
      if (state.getCurrentWatermarkMs() >= evictMs) state.remove()
      else state.setTimeoutTimestamp(evictMs)
    }

  // public: the state encoder's generated code must reach the classes
  final case class CusumRef(sumN: Long, sumQ: Long, nDays: Long)
  final case class CusumState(curDay: Long, curN: Long, run: Long,
      minRun: Long, closed: Long)
  final case class CusumRow(event_type: String, day: Long,
      n_events: Long, v_scaled: Long, is_change: Long)

  /** T26 live: streaming one-sided CUSUM against a CALIBRATED
    * reference — the deployment shape of change detection: the
    * baseline (per-type Σx, Σx², day count of a reference window) is
    * computed once batch-side and the live fold accumulates the exact
    * integer excursion V_t = max(0, S_t − min(0, min_{j<t} S_j)) with
    * the 5σ cross-multiplied flag, all spelled identically to the
    * batch `cusum_changepoints` — so on the reference window's own
    * feed the emitted rows EQUAL the batch rows across any micro-batch
    * split (the spec pin), and on a live feed the same fold flags
    * sustained shifts against the frozen baseline. State per type is
    * five numbers (open day + count, running sum, prefix-min, closed
    * count); a day closes when a later-day event arrives. PUBLIC API
    * CONTRACT (not just a test convention): the feed must be
    * day-monotone per type — each type's final open day is emitted
    * only when a LATER-day event (in practice a sentinel past the
    * window, or the next real day) arrives, and an event for an
    * already-closed day is REFUSED (IllegalStateException) rather than
    * silently closing and reopening the wrong day across micro-batch
    * boundaries. Within a micro-batch, rows are sorted by (ts,
    * event_id) before folding, so the guard only fires on genuine
    * cross-batch disorder. Types absent from the reference emit
    * nothing. */
  def cusumStream(events: Dataset[TypedEvent],
      ref: Map[String, CusumRef],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[CusumRow] = {
    import events.sparkSession.implicits._
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[CusumState]) =>
          ref.get(etype) match {
            case None => Iterator.empty
            case Some(r) =>
              var st = state.getOption.orNull
              val out = Seq.newBuilder[CusumRow]
              // after close(), curDay stays the CLOSED day with
              // curN = 0 (the closed marker): a stale arrival for a
              // watermark-closed day must refuse, not reopen
              def close(): Unit = {
                val newRun = st.run + r.nDays * st.curN - r.sumN
                val minPrev =
                  if (st.closed == 0L) 0L else math.min(0L, st.minRun)
                val vs = math.max(0L, newRun - minPrev)
                val flag = if (vs * vs >
                  25L * (r.nDays * r.sumQ - r.sumN * r.sumN)) 1L else 0L
                out += CusumRow(etype, st.curDay, st.curN, vs, flag)
                st = CusumState(st.curDay, 0L, newRun,
                  if (st.closed == 0L) newRun
                  else math.min(st.minRun, newRun),
                  st.closed + 1L)
              }
              if (state.hasTimedOut) {
                // the watermark passed the open day's end: every
                // possible day member has arrived — close without a
                // sentinel (the event-time flush)
                if (st != null && st.curN > 0L) {
                  close(); state.update(st)
                  scheduleEviction(state,
                    (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
                } else if (st != null && evictAfterDays > 0)
                  state.remove() // eviction timer fired, type stayed quiet
                out.result().iterator
              } else {
              rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
                val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
                if (st == null) st = CusumState(day, 1L, 0L, 0L, 0L)
                else if (st.curN == 0L) {
                  if (day <= st.curDay)
                    throw new IllegalStateException(
                      s"cusumStream: out-of-order event for type " +
                        s"$etype (day $day at or before the " +
                        s"watermark-closed day ${st.curDay}) — the " +
                        "feed must be day-monotone per type across " +
                        "micro-batches")
                  st = st.copy(curDay = day, curN = 1L)
                }
                else if (day == st.curDay)
                  st = st.copy(curN = st.curN + 1L)
                else if (day < st.curDay)
                  // fail fast: silently closing + reopening the wrong
                  // day would corrupt every later excursion (API
                  // contract: day-monotone feed per type)
                  throw new IllegalStateException(
                    s"cusumStream: out-of-order event for type $etype " +
                      s"(day $day after open day ${st.curDay}) — the " +
                      "feed must be day-monotone per type across " +
                      "micro-batches")
                else { close(); st = st.copy(curDay = day, curN = 1L) }
              }
              if (st != null) {
                state.update(st)
                if (st.curN > 0L) {
                  val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
                  // the watermark may ALREADY be past the open day's
                  // end (another key ran ahead): close now — a
                  // timeout for the past would be refused
                  if (state.getCurrentWatermarkMs() >= dayEndMs) {
                    close(); state.update(st)
                    scheduleEviction(state, dayEndMs, evictAfterDays)
                  } else state.setTimeoutTimestamp(dayEndMs)
                }
              }
              out.result().iterator
              }
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class EwmaRef(sumN: Long, sumQ: Long, nDays: Long)
  final case class EwmaState(curDay: Long, curN: Long,
      lastNs: Seq[Long])
  final case class EwmaRow(event_type: String, day: Long,
      n_events: Long, ewma: Double, z: Double, is_ooc: Long)

  /** T33 live: streaming EWMA control chart against a CALIBRATED
    * reference — the control-chart deployment shape (limits are
    * estimated from a reference window, then applied to the live
    * feed), [[cusumStream]]'s sibling: per type the state is the 8
    * most-recent finalized daily counts plus the day in progress —
    * exactly the `anomalyStream` state shape — and each day's verdict
    * emits as the day CLOSES, with the identical integer-weight
    * spelling as the batch `ewma_control` (w_k = 3^k·4^(7−k), exact
    * long numerator, the only doubles the final identically-spelled q6
    * divisions). On the reference window's own feed the emitted rows
    * EQUAL the batch rows across any micro-batch split (the spec pin).
    *
    * Same public feed contract as [[cusumStream]]: day-monotone per
    * type (within-batch rows are sorted; cross-batch disorder is
    * refused), final open day flushes via a later-day sentinel. A
    * type's first 7 closed days emit nothing — the batch query's
    * `num IS NOT NULL` warm-up, spelled as state. */
  def ewmaStream(events: Dataset[TypedEvent],
      ref: Map[String, EwmaRef],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    val weights: Array[Long] = Array.tabulate(8)(k =>
      math.pow(3, k).toLong * math.pow(4, 7 - k).toLong)
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[EwmaState]) =>
          ref.get(etype) match {
            case None => Iterator.empty
            case Some(r) =>
              var st = state.getOption.orNull
              val out = Seq.newBuilder[EwmaRow]
              def close(): Unit = {
                // most-recent-first: taps(0) = the closing day
                val taps = st.curN +: st.lastNs
                if (taps.length >= 8) {
                  var num = 0L
                  var k = 0
                  while (k < 8) { num += weights(k) * taps(k); k += 1 }
                  // the batch spelling verbatim: long arithmetic for
                  // every aggregate, doubles only in the final q6'd
                  // divisions, same association order
                  val ewma = num.toDouble / 58975.0
                  val mean = r.sumN.toDouble / r.nDays.toDouble
                  val va = (r.nDays * r.sumQ - r.sumN * r.sumN).toDouble /
                    (r.nDays * (r.nDays - 1L)).toDouble
                  val sigmaE = math.sqrt(va * 607417225.0 / 3478050625.0)
                  val z = q6d((ewma - mean) / sigmaE)
                  out += EwmaRow(etype, st.curDay, st.curN, q6d(ewma), z,
                    if (math.abs(z) > 3.0) 1L else 0L)
                }
                st = EwmaState(st.curDay, 0L,
                  (st.curN +: st.lastNs).take(8))
              }
              if (state.hasTimedOut) {
                if (st != null && st.curN > 0L) {
                  close(); state.update(st)
                  scheduleEviction(state,
                    (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
                } else if (st != null && evictAfterDays > 0)
                  state.remove() // eviction timer fired, type stayed quiet
                out.result().iterator
              } else {
              rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
                val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
                if (st == null) st = EwmaState(day, 1L, Vector.empty)
                else if (st.curN == 0L) {
                  if (day <= st.curDay)
                    throw new IllegalStateException(
                      s"ewmaStream: out-of-order event for type " +
                        s"$etype (day $day at or before the " +
                        s"watermark-closed day ${st.curDay}) — the " +
                        "feed must be day-monotone per type across " +
                        "micro-batches")
                  st = st.copy(curDay = day, curN = 1L)
                }
                else if (day == st.curDay)
                  st = st.copy(curN = st.curN + 1L)
                else if (day < st.curDay)
                  throw new IllegalStateException(
                    s"ewmaStream: out-of-order event for type $etype " +
                      s"(day $day after open day ${st.curDay}) — the " +
                      "feed must be day-monotone per type across " +
                      "micro-batches")
                else { close(); st = st.copy(curDay = day, curN = 1L) }
              }
              if (st != null) {
                state.update(st)
                if (st.curN > 0L) {
                  val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
                  if (state.getCurrentWatermarkMs() >= dayEndMs) {
                    close(); state.update(st)
                    scheduleEviction(state, dayEndMs, evictAfterDays)
                  } else state.setTimeoutTimestamp(dayEndMs)
                }
              }
              out.result().iterator
              }
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class MkState(curDay: Long, curN: Long, s: Long,
      cnt: Map[Long, Long])
  final case class MkRow(event_type: String, n_days: Long, s_stat: Long,
      tie_term: Long, var18: Long, z: Double, is_trend: Long)

  /** T31 live: streaming Mann–Kendall — the monotone-trend verdict
    * maintained incrementally as days close, completing the SPC
    * family's live story (PSI, binned KS, CUSUM, EWMA, MK, Theil–Sen).
    * Per type the state is the open day, the RUNNING S (genuinely
    * order-dependent, so it persists — day order is arrival order
    * under the monotone contract), and the MULTISET of closed daily
    * counts (value → day count — a statistic of the day axis, never
    * events; the tie term and variance re-derive from it): when a day
    * closes with count x, S gains Σ_{v<x} c_v − Σ_{v>x} c_v in one
    * map walk (the closing day is j in every (i, j) pair it
    * completes), and the verdict-so-far emits with the identical
    * integer/q6 spelling as the batch `mann_kendall_trend` — so once
    * the feed is ingested the LATEST row per type equals the batch
    * row across any micro-batch split (the psiStream "latest verdict"
    * contract). Same day-monotone feed contract as [[cusumStream]]:
    * out-of-order days are refused, the final open day flushes via a
    * later-day sentinel. */
  def mkStream(events: Dataset[TypedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[MkRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[MkState, MkRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[MkState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[MkRow]
          def close(): Unit = {
            val x = st.curN
            val dS = st.cnt.map { case (v, c) =>
              if (v < x) c else if (v > x) -c else 0L }.sum
            val s = st.s + dS
            val cnt = st.cnt.updated(x, st.cnt.getOrElse(x, 0L) + 1L)
            st = MkState(st.curDay, 0L, s, cnt)
            val n = cnt.values.sum
            val tie = cnt.values.map(c => c * (c - 1L) * (2L * c + 5L)).sum
            val var18 = n * (n - 1L) * (2L * n + 5L) - tie
            // the batch z spelling verbatim: continuity-corrected,
            // sqrt(var18/18.0), zero on S = 0
            val z =
              if (s > 0L)
                (s - 1L).toDouble / math.sqrt(var18.toDouble / 18.0)
              else if (s < 0L)
                (s + 1L).toDouble / math.sqrt(var18.toDouble / 18.0)
              else 0.0
            val zq = q6d(z)
            out += MkRow(etype, n, s, tie, var18, zq,
              if (math.abs(zq) > 1.96) 1L else 0L)
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            if (st == null) st = MkState(day, 1L, 0L, Map.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"mkStream: out-of-order event for type $etype " +
                    s"(day $day at or before the watermark-closed " +
                    s"day ${st.curDay}) — the feed must be " +
                    "day-monotone per type across micro-batches")
              st = st.copy(curDay = day, curN = 1L)
            }
            else if (day == st.curDay) st = st.copy(curN = st.curN + 1L)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"mkStream: out-of-order event for type $etype (day " +
                  s"$day after open day ${st.curDay}) — the feed must " +
                  "be day-monotone per type across micro-batches")
            else { close(); st = st.copy(curDay = day, curN = 1L) }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class TsState(curDay: Long, curN: Long, days: Seq[Long],
      ns: Seq[Long], grid: Map[Long, Long])
  final case class TsRow(event_type: String, n_days: Long,
      n_pairs: Long, sen_slope: Double)

  /** T35 live: streaming Theil–Sen — the robust trend MAGNITUDE
    * maintained as days close. Per type the state is the open day,
    * the closed (day, count) series, and the slope GRID-COUNT map
    * (s6 → multiplicity — the theil_sen batch row's selection
    * structure, persisted): a closing day contributes its |prior|
    * pairwise slopes in one pass (each on the q6 grid via the batch
    * row's identical double spelling), and the lower median re-derives
    * by one cumulative walk over the sorted grid keys — never a sort
    * of the pair relation. LATEST row per type equals the batch
    * `theil_sen` row across any micro-batch split once the feed is
    * ingested. State ∝ days + distinct grid values (a time axis);
    * per-close work ∝ prior days — days² total, exactly the batch
    * pair relation, amortized over the feed. Same day-monotone feed
    * contract as [[cusumStream]]. */
  def tsStream(events: Dataset[TypedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[TsRow] = {
    import events.sparkSession.implicits._
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[TsState, TsRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[TsState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[TsRow]
          def close(): Unit = {
            val d = st.curDay
            val x = st.curN
            var grid = st.grid
            var i = 0
            while (i < st.days.length) {
              // the batch slope spelling verbatim: exact long
              // numerator/denominator, one double division, half-up
              // micro quantization
              val s6 = math.floor(
                (x - st.ns(i)).toDouble / (d - st.days(i)).toDouble *
                  1000000.0 + 0.5).toLong
              grid = grid.updated(s6, grid.getOrElse(s6, 0L) + 1L)
              i += 1
            }
            st = TsState(d, 0L, st.days :+ d, st.ns :+ x, grid)
            val np = grid.values.sum
            if (np >= 1L) {
              val target = (np + 1L) / 2L
              var cum = 0L
              var median = 0L
              val ks = grid.keys.toArray.sorted
              var k = 0
              while (k < ks.length && cum < target) {
                median = ks(k); cum += grid(ks(k)); k += 1
              }
              out += TsRow(etype, st.days.length.toLong, np,
                median.toDouble / 1000000.0)
            }
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            if (st == null)
              st = TsState(day, 1L, Vector.empty, Vector.empty, Map.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"tsStream: out-of-order event for type $etype " +
                    s"(day $day at or before the watermark-closed " +
                    s"day ${st.curDay}) — the feed must be " +
                    "day-monotone per type across micro-batches")
              st = st.copy(curDay = day, curN = 1L)
            }
            else if (day == st.curDay) st = st.copy(curN = st.curN + 1L)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"tsStream: out-of-order event for type $etype (day " +
                  s"$day after open day ${st.curDay}) — the feed must " +
                  "be day-monotone per type across micro-batches")
            else { close(); st = st.copy(curDay = day, curN = 1L) }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }


  // public: the state encoder's generated code must reach the classes
  final case class AcfState(curDay: Long, curN: Long, days: Seq[Long],
      ns: Seq[Long])
  final case class AcfRow(event_type: String, lag: Long, n_days: Long,
      n_pairs: Long, r: Double)

  /** T37 live: streaming daily-series ACF — the Box–Jenkins
    * identification surface maintained as days close, completing the
    * live SPC family (PSI/KS/CUSUM/EWMA/MK/TS/ACF). Per type the state
    * is the open day and the closed (day, count) series (bounded by
    * the day axis — the [[tsStream]] state shape without the grid
    * map); each day close recomputes the lag-1..7 autocorrelations
    * with the batch `autocorr_daily` row's IDENTICAL spelling —
    * deviations cross-multiplied by the CURRENT day count (they must
    * re-derive per close: n_days and Σx change with every day, so no
    * incremental numerator survives a close — the honest cost is one
    * O(days·7) walk per close, days²·7 total, exactly the batch pair
    * relation amortized over the feed), exact long products under the
    * same |n·x − S| ≤ 3·10⁹ envelope (violations fail fast), q6
    * division, den = 0 → 0. Rows emit only for lags with ≥ 1 calendar
    * pair (the batch join's observed-days convention), so the LATEST
    * row per (type, lag) equals the batch row across any micro-batch
    * split once the feed is ingested. Same day-monotone feed contract
    * as [[cusumStream]]. */
  def acfStream(events: Dataset[TypedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[AcfRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[AcfState, AcfRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[AcfState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AcfRow]
          def close(): Unit = {
            val days = st.days :+ st.curDay
            val ns = st.ns :+ st.curN
            st = AcfState(st.curDay, 0L, days, ns)
            val nd = days.length.toLong
            val sn = ns.sum
            val dev = new Array[Long](days.length)
            var i = 0
            while (i < days.length) {
              val d = ns(i) * nd - sn
              if (math.abs(d) > 3000000000L)
                throw new IllegalStateException(
                  s"acfStream: |n*nd - sn| > 3e9 for type $etype — " +
                    "the exact-long envelope; pre-aggregate upstream")
              dev(i) = d
              i += 1
            }
            var den = 0L
            i = 0
            while (i < dev.length) { den += dev(i) * dev(i); i += 1 }
            val byDay = days.zipWithIndex.toMap
            var lag = 1L
            while (lag <= 7L) {
              var num = 0L; var np = 0L
              i = 0
              while (i < days.length) {
                byDay.get(days(i) + lag).foreach { j =>
                  num += dev(i) * dev(j); np += 1L
                }
                i += 1
              }
              if (np >= 1L)
                out += AcfRow(etype, lag, nd, np,
                  if (den == 0L) 0.0
                  else q6d(num.toDouble / den.toDouble))
              lag += 1L
            }
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            if (st == null)
              st = AcfState(day, 1L, Vector.empty, Vector.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"acfStream: out-of-order event for type $etype " +
                    s"(day $day at or before the watermark-closed " +
                    s"day ${st.curDay}) — the feed must be " +
                    "day-monotone per type across micro-batches")
              st = st.copy(curDay = day, curN = 1L)
            }
            else if (day == st.curDay) st = st.copy(curN = st.curN + 1L)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"acfStream: out-of-order event for type $etype (day " +
                  s"$day after open day ${st.curDay}) — the feed must " +
                  "be day-monotone per type across micro-batches")
            else { close(); st = st.copy(curDay = day, curN = 1L) }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class SsState(curDay: Long, curN: Long, days: Seq[Long],
      ns: Seq[Long])
  final case class SsRow(event_type: String, n_days: Long,
      ss_resid_c2: Long, ss_total_c2: Long, strength: Double)

  /** T39 live: streaming seasonal strength — Hyndman's F_s maintained
    * as days close, with the batch `seasonal_strength` row's IDENTICAL
    * spelling (centi-quantized cross-multiplied deviations vs the
    * phase mean and the grand mean; both re-derive per close because
    * every mean changes with a new day — the [[acfStream]] honest
    * cost, one O(days) walk per close over the bounded day axis).
    * LATEST row per type equals the batch row across any micro-batch
    * split once the feed is ingested. `epochDay0 = 0` keeps days on
    * the epoch axis so phase = (day + phaseOffset) mod period is the
    * batch row's engine-neutral day-of-week. Same day-monotone feed
    * contract as [[cusumStream]]. */
  def seasonalStrengthStream(events: Dataset[TypedEvent],
      period: Int = 7, phaseOffset: Int = 3,
      evictAfterDays: Int = 0): Dataset[SsRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[SsState, SsRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[SsState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SsRow]
          def close(): Unit = {
            val days = st.days :+ st.curDay
            val ns = st.ns :+ st.curN
            st = SsState(st.curDay, 0L, days, ns)
            val nd = days.length.toLong
            val sn = ns.sum
            val byPhase = days.indices.groupBy(i =>
              Math.floorMod(days(i) + phaseOffset, period.toLong))
            def centi(num: Long, den: Long): Long = {
              val c = math.floor(
                num.toDouble * 100.0 / den.toDouble + 0.5).toLong
              if (math.abs(c) > 3000000000L)
                throw new IllegalStateException(
                  s"seasonalStrengthStream: |dev|*100 > 3e9 for type " +
                    s"$etype — the exact-long envelope")
              c
            }
            var ssR = 0L; var ssT = 0L
            byPhase.foreach { case (_, idxs) =>
              val nw = idxs.length.toLong
              val sw = idxs.map(ns(_)).sum
              idxs.foreach { i =>
                val rm = centi(ns(i) * nw - sw, nw)
                ssR += rm * rm
                val dm = centi(ns(i) * nd - sn, nd)
                ssT += dm * dm
              }
            }
            out += SsRow(etype, nd, ssR, ssT,
              if (ssT == 0L) 0.0
              else q6d(math.max(0.0, 1.0 - ssR.toDouble / ssT.toDouble)))
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L)
            if (st == null)
              st = SsState(day, 1L, Vector.empty, Vector.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"seasonalStrengthStream: out-of-order event for " +
                    s"type $etype (day $day at or before the " +
                    s"watermark-closed day ${st.curDay}) — the feed " +
                    "must be day-monotone per type")
              st = st.copy(curDay = day, curN = 1L)
            }
            else if (day == st.curDay) st = st.copy(curN = st.curN + 1L)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"seasonalStrengthStream: out-of-order event for type " +
                  s"$etype (day $day after open day ${st.curDay}) — " +
                  "the feed must be day-monotone per type")
            else { close(); st = st.copy(curDay = day, curN = 1L) }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              // the day axis here is epoch days already
              val dayEndMs = (st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class SpearState(curDay: Long, curN: Long, curY: Long,
      xs: Seq[Long], ys: Seq[Long])
  final case class SpearRow(event_type: String, n_days: Long,
      rho: Double)

  /** G31 live: streaming Spearman ρ between the daily count and the
    * daily value mass, maintained as days close with the batch
    * `spearman_corr` row's IDENTICAL spelling — doubled mid-ranks
    * (2·cl + ceq + 1, recomputed per close: every new day can shift
    * every rank) and exact-long Pearson-over-ranks sums. Input
    * contract: `v_micro` is the engine-wide half-up 10⁻⁴-grid integer
    * ([[psiStream]]'s rule); the batch row's cents quantize from it as
    * floorDiv(v_micro + 50, 100), which equals floor(value·100 + ½)
    * exactly for on-grid values — stay on the grid. LATEST row per
    * type equals the batch row across any micro-batch split. Same
    * day-monotone feed contract as [[cusumStream]]. */
  def spearmanStream(events: Dataset[ValuedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[SpearRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    def r2(vs: Seq[Long]): Array[Long] = {
      val sorted = vs.sorted
      vs.map { v =>
        val cl = sorted.count(_ < v).toLong
        val ceq = sorted.count(_ == v).toLong
        2L * cl + ceq + 1L
      }.toArray
    }
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[SpearState, SpearRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[ValuedEvent],
            state: GroupState[SpearState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SpearRow]
          def close(): Unit = {
            val xs = st.xs :+ st.curN
            val ys = st.ys :+ st.curY
            st = SpearState(st.curDay, 0L, 0L, xs, ys)
            val n = xs.length.toLong
            val rx = r2(xs); val ry = r2(ys)
            var sx = 0L; var sy = 0L; var sxy = 0L
            var sxx = 0L; var syy = 0L
            var i = 0
            while (i < rx.length) {
              sx += rx(i); sy += ry(i); sxy += rx(i) * ry(i)
              sxx += rx(i) * rx(i); syy += ry(i) * ry(i)
              i += 1
            }
            val vx = n * sxx - sx * sx
            val vy = n * syy - sy * sy
            out += SpearRow(etype, n,
              if (vx == 0L || vy == 0L) 0.0
              else q6d((n * sxy - sx * sy).toDouble /
                (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))))
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            // the batch row's cents from the on-grid micro value
            val cents = Math.floorDiv(e.v_micro + 50L, 100L)
            if (st == null)
              st = SpearState(day, 1L, cents, Vector.empty, Vector.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"spearmanStream: out-of-order event for type " +
                    s"$etype (day $day at or before the " +
                    s"watermark-closed day ${st.curDay}) — the feed " +
                    "must be day-monotone per type")
              st = st.copy(curDay = day, curN = 1L, curY = cents)
            }
            else if (day == st.curDay)
              st = st.copy(curN = st.curN + 1L, curY = st.curY + cents)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"spearmanStream: out-of-order event for type $etype " +
                  s"(day $day after open day ${st.curDay}) — the feed " +
                  "must be day-monotone per type")
            else {
              close()
              st = st.copy(curDay = day, curN = 1L, curY = cents)
            }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class RunsState(curDay: Long, curN: Long, days: Seq[Long],
      ns: Seq[Long])
  final case class RunsRow(event_type: String, n1: Long, n2: Long,
      runs: Long, z: Double, is_nonrandom: Long)

  /** T32 live: streaming Wald–Wolfowitz runs test — one of the two
    * batch-only members of the SPC family made live (with
    * [[turningStream]]). Per type the state is the open day and the
    * closed (day, count) series (the [[acfStream]] shape): the
    * dichotomy is against the SERIES mean, which moves with every
    * close, so the run count re-derives per close in one O(days) walk
    * over the day-ordered counts with the batch `runs_test_drift`
    * row's IDENTICAL spelling — the integer cross-multiply n·nd > Σn
    * (no division), the same E[R]/Var[R] doubles, the same
    * degenerate-arrangement guard reporting z = 0. LATEST row per
    * type equals the batch row across any micro-batch split. Same
    * day-monotone feed contract as [[cusumStream]]; days close on
    * data or on watermark progress (event-time timeout). */
  def runsStream(events: Dataset[TypedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[RunsRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[RunsState, RunsRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[RunsState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[RunsRow]
          def close(): Unit = {
            val days = st.days :+ st.curDay
            val ns = st.ns :+ st.curN
            st = RunsState(st.curDay, 0L, days, ns)
            val nd = ns.length.toLong
            val sn = ns.sum
            // the batch dichotomy verbatim: above ⇔ n·nd > Σn
            val above = ns.map(_ * nd > sn)
            var runs = 1L
            var n1 = 0L
            var n2 = 0L
            var i = 0
            while (i < above.length) {
              if (i > 0 && above(i) != above(i - 1)) runs += 1L
              if (above(i)) n1 += 1L else n2 += 1L
              i += 1
            }
            val nT = (n1 + n2).toDouble
            val er = 1.0 + 2.0 * n1.toDouble * n2.toDouble / nT
            val vr = (2.0 * n1.toDouble * n2.toDouble *
              (2.0 * n1.toDouble * n2.toDouble - nT)) /
              (nT * nT * (nT - 1.0))
            // the batch guard verbatim: every zero-variance
            // arrangement reports z = 0
            val z =
              if (n1 == 0L || n2 == 0L || (n1 == 1L && n2 == 1L)) 0.0
              else q6d((runs.toDouble - er) / math.sqrt(vr))
            out += RunsRow(etype, n1, n2, runs, z,
              if (math.abs(z) > 1.96) 1L else 0L)
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            if (st == null)
              st = RunsState(day, 1L, Vector.empty, Vector.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"runsStream: out-of-order event for type $etype " +
                    s"(day $day at or before the watermark-closed " +
                    s"day ${st.curDay}) — the feed must be " +
                    "day-monotone per type across micro-batches")
              st = st.copy(curDay = day, curN = 1L)
            }
            else if (day == st.curDay) st = st.copy(curN = st.curN + 1L)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"runsStream: out-of-order event for type $etype " +
                  s"(day $day after open day ${st.curDay}) — the feed " +
                  "must be day-monotone per type across micro-batches")
            else { close(); st = st.copy(curDay = day, curN = 1L) }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }

  // public: the state encoder's generated code must reach the classes
  final case class TurnState(curDay: Long, curN: Long, days: Seq[Long],
      ns: Seq[Long])
  final case class TurnRow(event_type: String, n_days: Long,
      t_stat: Long, z: Double, is_nonrandom: Long)

  /** T40 live: streaming turning-point test — the second batch-only
    * randomness check made live. Per type the state is the closed
    * (day, count) series; each close recounts the strict interior
    * extrema in one O(days) walk (a new final day can only ADD one
    * interior point, but the re-walk keeps the spelling literally the
    * batch `turning_points` row's: strict comparisons both sides —
    * ties break NO turning point — E = 2(n−2)/3, Var = (16n−29)/90,
    * n < 3 reports z = 0). LATEST row per type equals the batch row
    * across any micro-batch split. Same day-monotone feed contract as
    * [[cusumStream]]; days close on data or on watermark progress. */
  def turningStream(events: Dataset[TypedEvent],
      epochDay0: Long = 19723L /* 2024-01-01 */,
      evictAfterDays: Int = 0): Dataset[TurnRow] = {
    import events.sparkSession.implicits._
    def q6d(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    withDayWatermark(events).groupByKey(_.event_type)
      .flatMapGroupsWithState[TurnState, TurnRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, rows: Iterator[TypedEvent],
            state: GroupState[TurnState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[TurnRow]
          def close(): Unit = {
            val days = st.days :+ st.curDay
            val ns = st.ns :+ st.curN
            st = TurnState(st.curDay, 0L, days, ns)
            val nd = ns.length.toLong
            var t = 0L
            var i = 1
            while (i < ns.length - 1) {
              // strict local extremum — ties break no turning point
              if ((ns(i - 1) < ns(i) && ns(i) > ns(i + 1)) ||
                  (ns(i - 1) > ns(i) && ns(i) < ns(i + 1))) t += 1L
              i += 1
            }
            // the batch z spelling verbatim
            val e = 2.0 * (nd - 2L).toDouble / 3.0
            val v = (16L * nd - 29L).toDouble / 90.0
            val z =
              if (nd < 3L) 0.0
              else q6d((t.toDouble - e) / math.sqrt(v))
            out += TurnRow(etype, nd, t, z,
              if (math.abs(z) > 1.96) 1L else 0L)
          }
          if (state.hasTimedOut) {
            if (st != null && st.curN > 0L) {
              close(); state.update(st)
              scheduleEviction(state,
                (epochDay0 + st.curDay + 1L) * 86400000L, evictAfterDays)
            } else if (st != null && evictAfterDays > 0)
              state.remove() // eviction timer fired, type stayed quiet
            out.result().iterator
          } else {
          rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val day = Math.floorDiv(e.ts, 86400000000L) - epochDay0
            if (st == null)
              st = TurnState(day, 1L, Vector.empty, Vector.empty)
            else if (st.curN == 0L) {
              if (day <= st.curDay)
                throw new IllegalStateException(
                  s"turningStream: out-of-order event for type " +
                    s"$etype (day $day at or before the " +
                    s"watermark-closed day ${st.curDay}) — the feed " +
                    "must be day-monotone per type across " +
                    "micro-batches")
              st = st.copy(curDay = day, curN = 1L)
            }
            else if (day == st.curDay) st = st.copy(curN = st.curN + 1L)
            else if (day < st.curDay)
              throw new IllegalStateException(
                s"turningStream: out-of-order event for type $etype " +
                  s"(day $day after open day ${st.curDay}) — the feed " +
                  "must be day-monotone per type across micro-batches")
            else { close(); st = st.copy(curDay = day, curN = 1L) }
          }
          if (st != null) {
            state.update(st)
            if (st.curN > 0L) {
              val dayEndMs = (epochDay0 + st.curDay + 1L) * 86400000L
              if (state.getCurrentWatermarkMs() >= dayEndMs) {
                close(); state.update(st)
                scheduleEviction(state, dayEndMs, evictAfterDays)
              } else state.setTimeoutTimestamp(dayEndMs)
            }
          }
          out.result().iterator
          }
      }
  }

  /** T6: arbitrary per-key state — a running per-user counter kept in
    * GroupState, emitting the updated total on every micro-batch. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { e => n += 1; total += e.value }
          val next = UserTotal(userId, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }
}
