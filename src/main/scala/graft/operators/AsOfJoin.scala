package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time enrichment): for every probe row, the
  * single build row with the greatest `buildTs <= probeTs` for the same
  * key — the Spark realization of the reference's floor search
  * (`greatest_not_exceeding`, /root/reference/src/algo/search.rs:51-80),
  * including the probe-before-first-build contract: no qualifying build
  * row ⇒ the build payload is all-null (`search.rs:66-68` returns
  * `None`, not an error).
  *
  * Implementation — union–sort–window, one shuffle on the join key:
  * both sides are tagged and unioned; a key-partitioned window ordered
  * by `(ts, tag)` (builds sort before probes at equal ts, making the
  * match inclusive) carries the last non-null build payload forward;
  * probe rows are then kept. At 100 TB this is a single hash shuffle of
  * probe+build on the key — no broadcast of an unbounded build side, no
  * per-row subqueries; AQE's skew handling applies to the window sort
  * like any other shuffle.
  *
  * Determinism contract: the build side must be unique per (key, ts) —
  * pre-aggregate it (e.g. `max_by`) if it is not; with duplicates the
  * "latest" row at equal ts is ambiguous in any as-of engine (DuckDB's
  * ASOF JOIN included).
  *
  * Null keys: every spelling here groups null keys together (window
  * partitioning / clustered distribution / hash-map lookup), so a
  * null-keyed probe CAN match a null-keyed build row — unlike SQL
  * equi-join semantics (DuckDB's ASOF JOIN `ON a = b` never matches
  * nulls). Pre-filter null keys when SQL parity matters; the fixture
  * keys are non-null.
  */
object AsOfJoin {

  /** @param probe        probe side; all its columns are preserved
    * @param build        build side; only `payload` columns are attached
    * @param probeKey     join key on the probe side
    * @param buildKey     join key on the build side
    * @param probeTs      probe event time
    * @param buildTs      build event time
    * @param payload      build columns to attach (null when no match)
    */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String]): DataFrame = {

    val payloadType = build.select(payload.map(col): _*).schema
    val probeCols = probe.columns.toSeq

    val p = probe.select(
      probeKey.as("__k"), probeTs.as("__ts"), lit(1).as("__tag"),
      struct(probeCols.map(col): _*).as("__row"),
      lit(null).cast(payloadType).as("__payload"))
    val b = build.select(
      buildKey.as("__k"), buildTs.as("__ts"), lit(0).as("__tag"),
      lit(null).cast(probe.schema).as("__row"),
      struct(payload.map(col): _*).as("__payload"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    p.unionByName(b)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probeCols.map(c => col(s"__row.$c").as(c)) ++
        payload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** The same as-of semantics through the engine's custom Catalyst
    * operator ([[graft.plans.AsOfJoinPlan]]). The physical plan is
    * chosen by [[graft.plans.GraftStrategies]] from `buildSide`: the
    * default [[graft.plans.AsOfBuildSide.Auto]] broadcasts the build
    * when its stats fit under `spark.sql.autoBroadcastJoinThreshold`
    * (zero shuffle) and otherwise plans the streaming merge — one
    * hash exchange per side, then an O(|L|+|R|) merge with O(1) state
    * per partition, no window buffer. Same output contract as
    * [[asof]].
    *
    * The probe and build frames must not share a plan lineage (read
    * the table twice rather than deriving both sides from one
    * DataFrame) — the custom node relies on the analyzer's generic
    * relation dedup, which is only exercised for freshly-read plans.
    */
  def asofNative(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String],
      buildSide: graft.plans.AsOfBuildSide = graft.plans.AsOfBuildSide.Auto)
      : DataFrame =
    planNative(probe, build, probeKey, buildKey, probeTs, buildTs,
      payload, extraKeys = Nil, buildSide)

  /** Single construction path for every native spelling: projects the
    * build side to `(__asof_k, __asof_ts, payload…, extraKeys…)`,
    * builds the [[graft.plans.AsOfJoinPlan]] with
    * `(probeKey, extraKeys…)` vs `(__asof_k, extraKeys…)` as the
    * clustering keys, and drops the bookkeeping columns. `extraKeys`
    * must already exist under the same name on BOTH sides (the salt
    * column in [[asofSalted]]). */
  private def planNative(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String],
      extraKeys: Seq[String],
      buildSide: graft.plans.AsOfBuildSide): DataFrame = {
    import graft.plans.{AsOfJoinPlan, GraftExtensions}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = probe.sparkSession
    GraftExtensions.ensureRegistered(spark)
    val b = build.select(
      buildKey.as("__asof_k") +: buildTs.as("__asof_ts") +:
        (payload ++ extraKeys).map(col): _*)
    val lPlan = Bridge.analyzed(probe)
    val rPlan = Bridge.analyzed(b)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output.find(_.name == name).get
    val plan = AsOfJoinPlan(lPlan, rPlan,
      Bridge.expression(probeKey) +: extraKeys.map(attr(lPlan, _)),
      attr(rPlan, "__asof_k") +: extraKeys.map(attr(rPlan, _)),
      Bridge.expression(probeTs), attr(rPlan, "__asof_ts"), buildSide)
    Bridge.ofRows(spark, plan)
      .drop("__asof_k" +: "__asof_ts" +: extraKeys: _*)
  }

  /** Forward as-of join — the SUCCESSOR-side twin of [[asofNative]]:
    * for every probe row, the EARLIEST build row with the same key
    * and build time strictly after the probe time (`strict = true` —
    * the reference's strict-successor contract,
    * `/root/reference/src/algo/search.rs:82-124`, including its
    * probe-after-last ⇒ `None` edge as an all-null payload) or
    * at-or-after (`strict = false`).
    *
    * Realized by TIME REVERSAL over the proven floor machinery
    * rather than a second exec: with integer (microsecond) times,
    * `min {bts : bts > pts}` = the floor match of `-pts − 1` against
    * `{-bts}` — so both sides negate their times (the strict variant
    * advances the probe by one unit, exact at Spark's microsecond
    * timestamp resolution) and the SAME merge / broadcast / Auto
    * planner, skew levers and null contract apply unchanged. Time
    * columns must be timestamps or integral numerics (a documented
    * requirement of the exact ±1-unit strictness shift). */
  def asofForward(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String],
      strict: Boolean = true,
      buildSide: graft.plans.AsOfBuildSide = graft.plans.AsOfBuildSide.Auto)
      : DataFrame = {
    import org.apache.spark.sql.types._
    def negated(df: DataFrame, ts: Column, bump: Long, as: String) = {
      val dt = df.select(ts).schema.head.dataType
      val micros = dt match {
        case TimestampType => unix_micros(ts)
        // NTZ: reinterpret in the session zone — order-preserving in
        // any fixed-offset zone (this library pins UTC); a DST zone
        // could fold the repeated fall-back hour, like any NTZ→instant
        // interpretation
        case TimestampNTZType => unix_micros(ts.cast(TimestampType))
        case ByteType | ShortType | IntegerType | LongType => ts.cast("long")
        case other => throw new IllegalArgumentException(
          s"asofForward needs timestamp or integral times, got $other")
      }
      df.withColumn(as, -(micros + lit(bump)))
    }
    val p = negated(probe, probeTs, if (strict) 1L else 0L, "__asof_fwd_pts")
    val b = negated(build, buildTs, 0L, "__asof_fwd_bts")
    planNative(p, b, probeKey, buildKey,
      p("__asof_fwd_pts"), b("__asof_fwd_bts"),
      payload, extraKeys = Nil, buildSide)
      .drop("__asof_fwd_pts")
  }

  /** [[asofNative]] with the build side forced broadcast: zero shuffle
    * on either side — the probe streams through unmoved and every row
    * answers a floor binary search against the broadcast build runs
    * ([[graft.plans.BroadcastAsOfJoinExec]]). The right plan when the
    * build is a bounded dimension (Auto picks this by itself when the
    * dimension's stats say so). */
  def asofBroadcast(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String]): DataFrame =
    asofNative(probe, build, probeKey, buildKey, probeTs, buildTs,
      payload, graft.plans.AsOfBuildSide.Broadcast)

  /** [[asofNative]] with the build side forced through the clustered
    * streaming-merge exec — the scale-default shape when the build is
    * NOT a bounded dimension (and the pinned spelling of the
    * `asof_join_native` oracle row, which exists to keep the merge
    * exec driver-checked regardless of fixture size). */
  def asofMerge(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String]): DataFrame =
    asofNative(probe, build, probeKey, buildKey, probeTs, buildTs,
      payload, graft.plans.AsOfBuildSide.Merge)

  /** [[asofNative]] hardened against probe-side key skew. AQE's
    * runtime skew-splitting only rewrites Spark's own shuffle joins —
    * a custom exec never benefits — so the skew lever here is explicit
    * salting: probes spread over `saltBuckets` sub-partitions of their
    * key, while the build side replicates into every sub-partition.
    * Each (key, salt) partition then holds a 1/S slice of the hot
    * key's probes plus ALL of its build rows, so the merge semantics
    * are unchanged but no single task owns a hot key's whole probe
    * stream. Build replication cost is S× the build (dimension-sized)
    * side — the standard salting trade.
    *
    * The salt is `fnv1a(saltOn…) mod S` — deterministic, no RNG. It
    * spreads a hot key only as far as the salt inputs have distinct
    * values ON THAT KEY: the default (`probeTs`) is right for
    * event-time probes, but a snapshot-stamped batch (every probe
    * sharing one timestamp) would land in a single bucket and pay the
    * S× build replication for nothing. For such shapes pass a
    * higher-entropy `saltOn` (e.g. the probe's id column). */
  def asofSalted(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTs: Column, buildTs: Column,
      payload: Seq[String],
      saltBuckets: Int = 8,
      saltOn: Seq[Column] = Nil): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2, got $saltBuckets")
    import graft.functions.{GraftFunctions => F}
    val saltInputs = if (saltOn.nonEmpty) saltOn else Seq(probeTs)
    val p = probe.withColumn("__asof_salt",
      pmod(F.fnv1a(saltInputs: _*), lit(saltBuckets.toLong)).cast("int"))
    val b = build.withColumn("__asof_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    planNative(p, b, probeKey, buildKey, probeTs, buildTs,
      payload, extraKeys = Seq("__asof_salt"),
      graft.plans.AsOfBuildSide.Merge)
  }

  /** SQL surface (SURVEY J9): registers the table-valued function
    *
    * {{{
    * SELECT * FROM graft_asof(
    *   'probe_view', 'build_view',       -- temp view names
    *   'probe_key', 'build_key',         -- join key columns
    *   'probe_ts', 'build_ts',           -- event-time columns
    *   'payload_a,payload_b'             -- build columns to attach
    *   [, 'auto'|'broadcast'|'merge'])   -- build-side hint (default auto)
    * }}}
    *
    * Spark's table-function arguments are expressions, not relations,
    * so the two sides arrive as VIEW NAMES resolved against the
    * session catalog at analysis time — the standard TVF shape for
    * binary relational operators. The builder plans the same
    * [[asofNative]]/[[asofBroadcast]] operator the DataFrame API uses:
    * one registration makes the custom operator reachable from pure
    * `spark.sql()` text. Idempotent per session. */
  def registerSqlTableFunction(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_asof", { exprs =>
        val args = exprs.map { e =>
          require(e.foldable &&
            e.dataType == org.apache.spark.sql.types.StringType,
            "graft_asof arguments must be string literals")
          val v = e.eval(null)
          require(v != null, "graft_asof arguments must not be NULL")
          v.toString
        }
        require(args.length == 7 || args.length == 8,
          "graft_asof(probe_view, build_view, probe_key, build_key, " +
            "probe_ts, build_ts, payload_csv[, 'auto'|'broadcast'|'merge'])")
        val Seq(probeV, buildV, pk, bk, pts, bts, payloadCsv) = args.take(7)
        val side = args.drop(7).headOption.getOrElse("auto") match {
          case "auto" => graft.plans.AsOfBuildSide.Auto
          case "broadcast" => graft.plans.AsOfBuildSide.Broadcast
          case "merge" => graft.plans.AsOfBuildSide.Merge
          case other => throw new IllegalArgumentException(
            s"graft_asof: unknown mode '$other' ('auto'|'broadcast'|'merge')")
        }
        val probe = spark.table(probeV)
        val build = spark.table(buildV)
        val out = asofNative(probe, build, probe(pk), build(bk),
          probe(pts), build(bts),
          payloadCsv.split(",").map(_.trim).toSeq.filter(_.nonEmpty),
          side)
        org.apache.spark.sql.graftbridge.Bridge.analyzed(out)
      }, "built-in")
}
