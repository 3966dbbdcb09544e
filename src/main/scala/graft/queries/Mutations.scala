package graft.queries

import graft.Tables
import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil.dsum

/** M-family: mutation application over append-only storage —
  * [[graft.operators.Merge]] exercised as oracle-gated queries. The
  * changelog is DERIVED deterministically from the fixture tables
  * (updates, conflicting re-updates, deletes, and inserts carved out
  * of `orders` by key residue) so DuckDB can rebuild the identical log
  * and replay the identical fold.
  */
object Mutations {

  /** The orders snapshot columns, in order — both engines project the
    * merged result to exactly these. */
  private val OrderCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** The deterministic derived changelog over `orders`: an update
    * (+50) on keys ≡3 (mod 7), a LATER conflicting update (+100) on
    * the ≡3 (mod 14) half (latest-wins observable), deletes on ≡5
    * (mod 7), inserts under fresh negated keys on ≡2 (mod 11).
    * (key, seq) pairs are unique by construction. */
  private def derivedChangelog(o: DataFrame): DataFrame = {
    def tagged(df: DataFrame, op: String, seq: Long): DataFrame =
      df.withColumn("op", lit(op)).withColumn("seq", lit(seq))
    val u1 = tagged(o.filter(col("o_orderkey") % 7 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 50.0), "U", 1L)
    val u2 = tagged(o.filter(col("o_orderkey") % 14 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 100.0), "U", 2L)
    val d = tagged(o.filter(col("o_orderkey") % 7 === 5), "D", 1L)
    val i = tagged(o.filter(col("o_orderkey") % 11 === 2)
      .withColumn("o_orderkey", -col("o_orderkey")), "I", 1L)
    u1.unionByName(u2).unionByName(d).unionByName(i)
  }

  /** Build-once-per-dir cache for the dp_budget_audit ledger path
    * (recording releases runs small driver jobs — Bench must not bill
    * the build inside every timed pass). */
  private val ledgerCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M1: CDC apply / MERGE INTO — fold the derived changelog into the
    // orders snapshot. Scale shape: one window shuffle of the small
    // log; the snapshot moves only through a key anti-join that AQE
    // broadcasts when the log is small.
    "merge_upsert" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      Merge.applyChangelog(o, derivedChangelog(o),
          Seq("o_orderkey"), "seq", "op")
        .orderBy($"o_orderkey")
    }),

    // M2: SCD2 history — validity intervals over a per-user state
    // changelog (events collapsed to one deterministic state per (user,
    // ts)). One per-key window; nothing else moves.
    "scd2_history" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ch = Tables.events(s, dir)
        .filter($"user_id" % 5 === 0)
        .groupBy($"user_id", $"ts").agg(min($"event_type").as("state"))
      Merge.scd2(ch, Seq("user_id"), "ts")
        .select($"user_id", $"state", $"valid_from", $"valid_to",
          $"is_current")
        .orderBy($"user_id", $"valid_from")
    }),

    // M4: point-in-time (PIT) join — the READ side of SCD2: enrich
    // facts with the dimension state that was valid AT each fact's
    // timestamp. Composition of two proven pieces: Merge.scd2 builds
    // the validity history (one per-key window over the small change
    // set), and the J9 as-of machinery picks the latest state with
    // valid_from <= fact ts (inclusive at the change instant — the
    // standard SCD2 read contract; the valid_to bound is implied
    // because valid_to = the next valid_from). Facts before a user's
    // first state row surface as NULL state (left as-of). Scale
    // shape: the as-of planner broadcasts the bounded history or
    // merges co-clustered, per its stats; the fact table never moves
    // through anything but its own as-of shuffle.
    "scd2_pit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.events(s, dir).filter($"user_id" % 5 === 0)
      val ch = ev.filter($"event_type".isin("signup", "purchase"))
        .groupBy($"user_id", $"ts").agg(min($"event_type").as("state"))
      val hist = Merge.scd2(ch, Seq("user_id"), "ts")
        .select($"user_id".as("h_user"), $"valid_from",
          $"state".as("h_state"))
      val probe = ev.filter(!$"event_type".isin("signup", "purchase"))
        .select($"event_id", $"user_id", $"ts")
      graft.operators.AsOfJoin.asofNative(probe, hist,
          probe("user_id"), hist("h_user"),
          probe("ts"), hist("valid_from"),
          Seq("h_state", "valid_from"))
        .select($"event_id", $"user_id", $"ts",
          $"h_state".as("state_at_event"), $"valid_from".as("state_since"))
        .orderBy($"event_id")
    }),

    // M5: time travel — reconstruct the SCD2 dimension AS OF a fixed
    // instant: the rows whose validity interval covers the timestamp
    // (valid_from <= t < valid_to, open current rows included). The
    // scan-time read of what scd2_pit does per fact row; a pure
    // filter over the history — no join, pushdown-friendly, and at
    // scale the valid_from/valid_to min-max file stats prune
    // non-covering files.
    "scd2_snapshot_at" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val asOf = lit("2024-01-15 00:00:00").cast("timestamp")
      val ch = Tables.events(s, dir)
        .filter($"user_id" % 5 === 0 &&
          $"event_type".isin("signup", "purchase"))
        .groupBy($"user_id", $"ts").agg(min($"event_type").as("state"))
      Merge.scd2(ch, Seq("user_id"), "ts")
        .filter($"valid_from" <= asOf &&
          ($"valid_to".isNull || $"valid_to" > asOf))
        .select($"user_id", $"state", $"valid_from", $"valid_to")
        .orderBy($"user_id")
    }),

    // M7: changelog compaction — net a (possibly long) log down to AT
    // MOST ONE effective op per key before shipping it downstream:
    // latest-wins per key, then classify against the snapshot —
    // update of an existing key stays 'U', an op on an absent key
    // becomes 'I' (unless it is a delete of nothing = no-op), a
    // delete of an existing key stays 'D'. Consumers replaying the
    // compacted log reach the same state with O(affected keys) work —
    // the standard CDC topic-compaction contract. Shape: one window
    // over the small log + one key join against the snapshot (only
    // keys, broadcast-able).
    "changelog_compact" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir)
      val wk = Window.partitionBy($"o_orderkey").orderBy($"seq".desc)
      val latest = derivedChangelog(o)
        .withColumn("rn", row_number().over(wk)).filter($"rn" === 1)
      val existing = o.select($"o_orderkey", lit(true).as("exists0"))
      latest.join(existing, Seq("o_orderkey"), "left")
        .withColumn("net_op",
          when($"op" === "D" && $"exists0".isNull, lit(null))
            .when($"op" === "D", lit("D"))
            .when($"exists0".isNull, lit("I"))
            .otherwise(lit("U")))
        .filter($"net_op".isNotNull)
        .select($"o_orderkey", $"net_op", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // M6: incremental view maintenance (IVM) — keep a materialized
    // per-customer aggregate current under the changelog WITHOUT
    // recomputing it: the delta pass touches only the AFFECTED keys
    // (join of the latest-per-key log against the old snapshot),
    // computes per-customer (count, sum) contributions deltas, and
    // merges them into the base view with one full-outer join. At
    // 100 TB the base view never re-aggregates — the work is
    // O(changelog), not O(table). Sums are maintained as exact
    // integer 1e-4 units (per-row quantize-then-sum), so
    // "base + delta" is bitwise equal to the oracle's full recompute
    // over the merged snapshot — the equivalence that makes IVM
    // trustworthy.
    "ivm_agg_maintain" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val q4 = (c: org.apache.spark.sql.Column) =>
        floor(c * lit(10000.0) + lit(0.5)).cast("long")
      val o = Tables.orders(s, dir)
      // the standing view: per-customer count + exact integer sum
      val base = o.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n0"), sum(q4($"o_totalprice")).as("s0"))
      // latest-per-key netting of the small changelog
      val wk = Window.partitionBy($"o_orderkey").orderBy($"seq".desc)
      val latest = derivedChangelog(o)
        .withColumn("rn", row_number().over(wk)).filter($"rn" === 1)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"op")
      // old contributions of the affected keys (absent for inserts)
      val old = o.select($"o_orderkey",
        $"o_custkey".as("old_custkey"), q4($"o_totalprice").as("old_s"))
      // TWO delta rows per affected key — retract from the OLD row's
      // group, apply to the NEW row's group — so an update that moves
      // a row between grouping keys (o_custkey) maintains both groups
      // correctly (the general IVM recipe; when the key is unchanged
      // the rows land in the same group and net to the same delta)
      val affected = latest.join(old, Seq("o_orderkey"), "left")
      val retract = affected.filter($"old_custkey".isNotNull)
        .select($"old_custkey".as("o_custkey"),
          lit(-1L).as("dn"), (-$"old_s").as("ds"))
      val applied = affected.filter($"op" =!= "D")
        .select($"o_custkey",
          lit(1L).as("dn"), q4($"o_totalprice").as("ds"))
      val delta = retract.unionAll(applied)
        .groupBy($"o_custkey")
        .agg(sum($"dn").as("dn"), sum($"ds").as("ds"))
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          (coalesce($"n0", lit(0L)) + coalesce($"dn", lit(0L)))
            .as("n_orders"),
          (coalesce($"s0", lit(0L)) + coalesce($"ds", lit(0L)))
            .as("total_q4"))
        .filter($"n_orders" > 0)
        .orderBy($"o_custkey")
    }),

    // M3: snapshot diff — the audit tool next to MERGE: what changed
    // between snapshot A and snapshot B (added / removed / changed
    // keys, old vs new values). B is the merge_upsert result, so the
    // diff must recover exactly the changelog's effects — the
    // round-trip check a migration runs after a backfill. Scale
    // shape: ONE co-partitioned full outer join on the key; 'same'
    // rows are filtered before anything else happens to them.
    "snapshot_diff" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val merged = Merge.applyChangelog(o, derivedChangelog(o),
        Seq("o_orderkey"), "seq", "op")
      o.select($"o_orderkey", $"o_totalprice".as("old_price"))
        .join(merged.select($"o_orderkey", $"o_totalprice".as("new_price")),
          Seq("o_orderkey"), "full_outer")
        .withColumn("change_type",
          when($"old_price".isNull, "added")
            .when($"new_price".isNull, "removed")
            .when($"old_price" =!= $"new_price", "changed")
            .otherwise("same"))
        .filter($"change_type" =!= "same")
        .select($"o_orderkey", $"change_type", $"old_price", $"new_price")
        .orderBy($"o_orderkey")
    }),

    // M8: cascading subject-erasure (GDPR-style) with audit — delete a
    // request set of customers and everything reachable from them
    // (customer -> orders -> lineitem), emitting per-table deleted /
    // retained counts plus a retained-key checksum so the audit proves
    // WHICH rows survived, not just how many. Scale shape: the request
    // set is tiny (deletion requests) and broadcast against customer
    // and orders; the derived order-key set can be arbitrarily large at
    // 100 TB, so lineitem reaches it through an un-hinted equi-join
    // (AQE broadcasts it when small, shuffles when not) — never a
    // driver collect. Counts and key sums are map-side-combinable
    // integer aggregates.
    // M12: retention/TTL sweep — the delete-MANIFEST audit a
    // data-governance pass runs before a physical purge: per event
    // class, its policy window, how many rows fall outside it, how
    // many survive, the oldest surviving timestamp, and the expired
    // value mass. Reference "now" is the corpus's own max timestamp
    // (one-row broadcast — the scalar-subquery shape), so the report
    // is deterministic whenever it runs; the per-class policy is one
    // CASE both engines spell identically and expiry is exact
    // timestamp-minus-days arithmetic (µs precision, no date
    // truncation drift). Single scan, map-combinable rollup, output
    // bounded by the event-type domain.
    "retention_sweep" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ttlCase = "CASE event_type WHEN 'error' THEN 7 " +
        "WHEN 'view' THEN 10 WHEN 'click' THEN 14 " +
        "WHEN 'signup' THEN 21 ELSE 25 END"
      val ref = Tables.events(s, dir).agg(max($"ts").as("now_ts"))
      Tables.events(s, dir)
        .crossJoin(broadcast(ref))
        .withColumn("ttl_days", expr(ttlCase).cast("long"))
        .withColumn("expired", $"ts" <
          $"now_ts" - expr("make_interval(0, 0, 0, ttl_days, 0, 0, 0)"))
        .groupBy($"event_type", $"ttl_days")
        .agg(sum(when($"expired", 1L).otherwise(0L)).as("n_expired"),
          sum(when(!$"expired", 1L).otherwise(0L)).as("n_retained"),
          min(when(!$"expired", $"ts")).as("oldest_retained_ts"),
          dsum(when($"expired", $"value").otherwise(lit(0.0)))
            .as("expired_value_mass"))
        .orderBy($"event_type")
    }),

    "cascade_delete" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val delCust = Tables.customer(s, dir)
        .filter($"c_acctbal" < 0 && $"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("_delk"))
      val delOrders = Tables.orders(s, dir)
        .join(broadcast(delCust), $"o_custkey" === $"_delk", "left_semi")
        .select($"o_orderkey".as("_delk"))
      def audit(rows: DataFrame, key: String, del: DataFrame,
          name: String, hintBroadcast: Boolean): DataFrame = {
        val d = (if (hintBroadcast) broadcast(del) else del)
          .withColumn("_hit", lit(1))
        rows.select(col(key).as("_k"))
          .join(d, col("_k") === col("_delk"), "left_outer")
          .agg(
            sum(when(col("_hit").isNotNull, 1L).otherwise(0L))
              .as("n_deleted"),
            sum(when(col("_hit").isNull, 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("_hit").isNull, col("_k")).otherwise(0L))
              .as("retained_key_sum"))
          .select(lit(name).as("tbl"), col("n_deleted"),
            col("n_retained"), col("retained_key_sum"))
      }
      audit(Tables.customer(s, dir), "c_custkey", delCust,
          "customer", hintBroadcast = true)
        .unionByName(audit(Tables.orders(s, dir), "o_orderkey", delOrders,
          "orders", hintBroadcast = true))
        .unionByName(audit(Tables.lineitem(s, dir), "l_orderkey", delOrders,
          "lineitem", hintBroadcast = false))
        .orderBy($"tbl")
    }),

    // M9: k-anonymity audit — the privacy gate next to PII redaction
    // (L15) and cascading erasure (M8): before a table with
    // quasi-identifiers ships, count the QI groups smaller than k (a
    // row in a size-1 group is re-identifiable from (nation, segment,
    // balance band) alone). One map-combinable group count over the
    // QI tuple, then three bounded rollups of the group-size relation
    // — the group relation is QI-domain-sized, never row-sized, at
    // any scale. floor(bal/1000) banding is IEEE-identical in both
    // engines.
    // M10: expectation-suite audit — the dbt-tests/Great-Expectations
    // product shape: a battery of data-contract checks over one table
    // evaluated in ONE pass each, reported as (check, n_violations,
    // pass). Checks: key uniqueness, not-null, accepted values, value
    // range, and referential integrity to customer — the contract
    // battery every ingestion gate runs before publishing a table.
    // Each check is a map-combinable count; the RI check is the only
    // join (key-shuffled anti). Violations are counted, never
    // collected.
    "expectations_report" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val dupKeys = o.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
        .filter($"c" > 1L)
        .agg(coalesce(sum($"c"), lit(0L)).as("n"))
        .select(lit("unique_orderkey").as("check_name"), $"n")
      // the three row-predicate checks share ONE scan (three sums in
      // a single aggregate, stacked to rows) — a 100 TB table is not
      // scanned once per check
      val rowChecks = o.agg(
        sum(when($"o_custkey".isNull || $"o_orderdate".isNull ||
          $"o_totalprice".isNull, 1L).otherwise(0L)).as("nn"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"), 0L).otherwise(1L)).as("acc"),
        sum(when($"o_totalprice" <= 0.0 || $"o_totalprice" > 1000000.0,
          1L).otherwise(0L)).as("rng"))
        .select(expr("stack(3, 'not_null_core_cols', nn, " +
          "'accepted_priorities', acc, 'totalprice_range', rng) " +
          "AS (check_name, n)"))
      val ri = o.join(Tables.customer(s, dir),
          $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("fk_custkey").as("check_name"), $"n")
      dupKeys.unionAll(rowChecks).unionAll(ri)
        .select($"check_name", $"n".as("n_violations"),
          ($"n" === 0L).as("pass"))
        .orderBy($"check_name")
    }),

    // M11: l-diversity audit — k-anonymity's sensitive-attribute
    // sibling: a QI group can be large (k-anonymous) yet expose its
    // members if everyone shares one sensitive value; l-diversity
    // requires ≥ l DISTINCT sensitive values per group (sensitive
    // attribute: the order-priority mix of the customer's orders —
    // fixture's stand-in for a medical code). One distinct-pair agg +
    // bounded rollups, the k_anonymity shape.
    "l_diversity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val g = Tables.customer(s, dir)
        .join(Tables.orders(s, dir).hint("merge"),
          $"c_custkey" === $"o_custkey")
        .groupBy($"c_nationkey", $"c_mktsegment")
        .agg(countDistinct($"o_orderpriority").as("l_div"),
          count(lit(1)).as("gsize"))
      // ONE fact-join pass: the QI-domain-sized group relation crosses
      // the 3-row threshold frame (the oracle's own spelling) instead
      // of re-running the merge join per threshold
      val thresholds = s.createDataFrame(Seq(Tuple1(2L), Tuple1(3L),
        Tuple1(5L))).toDF("l")
      g.crossJoin(broadcast(thresholds))
        .groupBy($"l")
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when($"l_div" < $"l", 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when($"l_div" < $"l", $"gsize").otherwise(0L))
            .as("n_rows_at_risk"))
        .orderBy($"l")
    }),

    // M14: Merkle-style table content fingerprints — the replication /
    // migration integrity audit: two replicas agree iff the per-bucket
    // fingerprints agree, and a divergence names the buckets to
    // re-sync WITHOUT comparing rows. XOR of 60-bit md5-derived row
    // hashes is the right fold: order-free and partition-free (any
    // execution order fingerprints identically — the property the spec
    // pins by repartitioning), and a single flipped row flips its
    // bucket with probability 1 − 2⁻⁶⁰. Doubles are excluded from the
    // canonical string by contract (double→string rendering is not
    // engine-portable); the date canonicalizes via an explicit format.
    // Shape: one map-combinable agg keyed by ≤ nBuckets values; the
    // scan is the only pass.
    "table_fingerprint" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Fingerprints.bucketFingerprints(
          Tables.orders(s, dir), "o_orderkey",
          Seq($"o_orderkey", $"o_custkey", $"o_orderstatus",
            $"o_orderpriority",
            date_format($"o_orderdate", "yyyy-MM-dd")),
          16)
        .orderBy($"bucket")
    }),

    // M13: t-closeness audit — the third privacy lens after
    // k-anonymity (group size) and l-diversity (distinct sensitive
    // values): a QI group can be large AND diverse yet still leak if
    // its sensitive-value DISTRIBUTION diverges from the table's
    // (e.g. 90% URGENT orders where the population runs 20%). For the
    // ordered sensitive attribute the distance is the Earth Mover's
    // Distance over the value order (Li, Li & Venkatasubramanian,
    // "t-Closeness", ICDE 2007): EMD = Σ_i |cum(p)_i − cum(q)_i|/(m−1).
    // Exactness: cumulative differences are integer cross-multiplies
    // (cum_c·n_all − cum_d·n_g — the tpch_q11 threshold recipe), so
    // group EMDs are exact integers over a common denominator and the
    // t thresholds compare as pure integer inequalities
    // (100·Σ|…| > t_pct·(m−1)·n_g·n_all) — no double ever compared.
    // Envelope: the cross-multiply needs n_g·n_all·(m−1)·100 within
    // long range — guarded in-query at n_all ≤ 3·10^8 (beyond it,
    // switch the terms to the q6-double lane, same shape).
    // Shape: ONE merge fact join → one (QI, value)-keyed count
    // (map-combinable) → everything after runs on the QI-domain-sized
    // group relation: crossed with the m-value global distribution and
    // the 3-row threshold frame (bounded broadcasts, allowlisted), one
    // QI-partitioned window for the cumulative sums. No fact re-scan
    // per threshold; at 10^9 facts the post-join work is unchanged.
    "t_closeness" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val j = Tables.customer(s, dir)
        .join(Tables.orders(s, dir).hint("merge"),
          $"c_custkey" === $"o_custkey")
        .select($"c_nationkey", $"c_mktsegment", $"o_orderpriority")
      val cell = j.groupBy($"c_nationkey", $"c_mktsegment",
          $"o_orderpriority")
        .agg(count(lit(1)).as("c"))
      val gdist = cell.groupBy($"o_orderpriority").agg(sum($"c").as("d"))
      val tot = broadcast(gdist.agg(
        when(sum($"d") > lit(300000000L),
          expr("raise_error('t_closeness: integer EMD envelope is " +
            "n_all <= 3e8 — switch the cross-multiply terms to the " +
            "q6-double lane past it')").cast("bigint"))
          .otherwise(sum($"d")).as("n_all"),
        count(lit(1)).as("m")))
      val grp = cell.groupBy($"c_nationkey", $"c_mktsegment")
        .agg(sum($"c").as("n_g"))
      val w = Window.partitionBy($"c_nationkey", $"c_mktsegment")
        .orderBy($"o_orderpriority")
      val emd = grp.crossJoin(broadcast(gdist))
        .join(cell,
          Seq("c_nationkey", "c_mktsegment", "o_orderpriority"),
          "left_outer")
        .na.fill(0L, Seq("c"))
        .crossJoin(tot)
        .withColumn("cum_c", sum($"c").over(w))
        .withColumn("cum_d", sum($"d").over(w))
        .groupBy($"c_nationkey", $"c_mktsegment", $"n_g", $"n_all", $"m")
        .agg(sum(abs($"cum_c" * $"n_all" - $"cum_d" * $"n_g"))
          .as("sum_abs"))
      val ts = s.createDataFrame(Seq(Tuple1(2L), Tuple1(4L), Tuple1(6L)))
        .toDF("t_pct")
      emd.crossJoin(broadcast(ts))
        .withColumn("viol",
          $"sum_abs" * lit(100L) >
            $"t_pct" * ($"m" - lit(1L)) * $"n_g" * $"n_all")
        .groupBy($"t_pct")
        .agg(count(lit(1)).as("n_groups"),
          sum(when($"viol", 1L).otherwise(0L)).as("n_violating_groups"),
          sum(when($"viol", $"n_g").otherwise(0L)).as("n_rows_at_risk"))
        .orderBy($"t_pct")
    }),

    "k_anonymity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val g = Tables.customer(s, dir)
        .groupBy($"c_nationkey", $"c_mktsegment",
          floor($"c_acctbal" / lit(1000.0)).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("gsize"))
      // ONE customer scan: the QI-domain-sized group relation crosses
      // the 3-row threshold frame (the l_diversity/t_closeness shape)
      // instead of re-running the groupBy-over-customer per k — three
      // full scans of a 100 TB dimension for a 12-cell answer was the
      // exact pattern the siblings already avoid
      val thresholds = s.createDataFrame(Seq(Tuple1(2L), Tuple1(5L),
        Tuple1(10L))).toDF("k")
      g.crossJoin(broadcast(thresholds))
        .groupBy($"k")
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when($"gsize" < $"k", 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when($"gsize" < $"k", $"gsize").otherwise(0L))
            .as("n_rows_at_risk"))
        .orderBy($"k")
    }),

    // M15: ε-differentially-private count release (Dwork et al. 2006,
    // the Laplace mechanism) — the RELEASE lane completing the privacy
    // family: k_anonymity/l_diversity/t_closeness AUDIT a relation,
    // dp_counts publishes one (per-source doc counts at ε = 0.5;
    // sensitivity 1 — sources partition the corpus, so parallel
    // composition keeps the whole release at ε). The noise draw is
    // DETERMINISTIC by design, not just for the oracle: the inverse
    // Laplace CDF is applied to a keyed md5 uniform (the Sampling
    // keyed-hash family — never rand()), which gives release-once
    // semantics — re-running the query re-publishes the SAME noisy
    // value, where a fresh draw per run would let an analyst average
    // the noise away (the classic repeated-query attack; a new
    // release rotates the salt, spending fresh ε). Exactness: u is an
    // exact 32-bit integer scaled once; the noise quantizes to a
    // micro-unit long via one identically-spelled ln; the released
    // integer derives from noise_micro by pure integer arithmetic
    // (positive-shifted DIV, so truncation == floor in both engines).
    // Shape: one map-combinable count over the bounded source domain.
    // M16: ε-DP released histogram — the same Laplace release
    // ([[graft.operators.Privacy.dpCounts]]) over a DERIVED key, the
    // other canonical private-publication shape: document-length
    // buckets (100-char bins). Each document lands in exactly ONE
    // bucket, so sensitivity stays 1 and parallel composition keeps
    // the whole histogram at ε = 0.5; the per-bucket draw keys on the
    // bucket value under its own seed (release-once, M15's rule — a
    // fresh histogram release rotates the seed; the fixture seed here
    // is public BECAUSE the oracle must replay it — a production
    // release supplies a secret one, which the API now requires
    // explicitly). Positive DIV in both engines (n_chars ≥ 0), so the
    // bucketing is engine-exact; the release rounding is an explicit
    // floor, identical at every sign (Spark DIV truncates toward
    // zero, DuckDB // floors — floor sidesteps the divergence).
    "dp_histogram" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy.dpCounts(
        Tables.documents(s, dir)
          .select(expr("n_chars DIV 100").as("len_bucket")),
        "len_bucket", epsilon = 0.5, seed = "dph:v1:")
        .orderBy($"len_bucket")
    }),

    // M17 applied to the histogram shape: M16's released bucket SET
    // was data-derived (an empty length bucket was absent from the
    // output — occupancy leaked), so the known-domain variant
    // releases every bucket of a PUBLIC literal range [0, 12] —
    // empty buckets publish pure noise, chosen without looking at
    // the data (the range is the documents schema's length envelope,
    // a design constant, not a data read).
    "dp_histogram_domain" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val domain = (0L to 12L).toDF("len_bucket")
      graft.operators.Privacy.dpCounts(
        Tables.documents(s, dir)
          .select(expr("n_chars DIV 100").as("len_bucket")),
        "len_bucket", epsilon = 0.5, seed = "dphd:v1:",
        domain = domain)
        .orderBy($"len_bucket")
    }),

    "dp_counts" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy
        .dpCounts(Tables.documents(s, dir), "source", epsilon = 0.5,
          seed = "dp:v1:")
        .select($"source", $"n_true".as("n_docs"), $"noise_micro",
          $"released")
        .orderBy($"source")
    }),

    // M17: known-domain count release — the presence-leak closer for
    // M15: the released relation has one row per key of a PUBLIC
    // domain (src0..src24 — a fixed literal, derived without looking
    // at the data), so a group nobody belongs to still releases pure
    // noise instead of being missing; "is there anyone in srcN" is no
    // longer readable off the output's key set. The five absent
    // domain keys release 0 + noise under the same deterministic draw.
    "dp_counts_domain" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val domain = (0 to 24).map(i => s"src$i").toDF("source")
      graft.operators.Privacy
        .dpCounts(Tables.documents(s, dir), "source", epsilon = 0.5,
          seed = "dpd:v1:", domain = domain)
        .orderBy($"source")
    }),

    // M18: ε-DP released SUMS with per-contribution clipping — the
    // second Laplace release shape: each document's n_chars is clipped
    // into [−400, 400] BEFORE the per-source sum (the bound BINDS —
    // n_chars ranges past 400 — so the row also pins the clamp), which
    // caps the sensitivity at the clip bound; the noise scale is
    // clip/ε = 800. Exact-long clipping and summation; the only
    // floating arithmetic is the one identically-spelled noise draw.
    "dp_sum_release" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy
        .dpSum(Tables.documents(s, dir), "source", "n_chars",
          epsilon = 0.5, clip = 400L, seed = "dps:v1:")
        .orderBy($"source")
    }),

    // M19: ε-DP released MEANS — the count+sum pair under sequential
    // composition (each half at ε/2: the two queries read the SAME
    // rows, so budgets add): count at scale 2/ε, clipped sum at scale
    // 2·clip/ε, two independent PRF draws derived from one release
    // seed (seed+"count:", seed+"sum:"). The published mean divides
    // the already-noised pair (denominator floored at 1) and
    // quantizes q6 — post-processing, no extra budget.
    "dp_mean_release" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy
        .dpMean(Tables.documents(s, dir), "source", "n_chars",
          epsilon = 0.5, clip = 400L, seed = "dpm:v1:")
        .orderBy($"source")
    }),

    // M20: DP released MEDIAN via the exponential mechanism — the
    // non-additive release (a median's sensitivity is unbounded, so
    // Laplace on the value is useless; the mechanism samples the
    // PUBLIC grid [0, 600] with weight exp(ε·u/2) for the rank
    // utility u = −|#{x<v} − #{x>v}|). ε is FIXED at 2·ln 2 so the
    // weight is the exact power of two 2^(−k) (scaled 2^(20−k),
    // truncated past k = 20) — no transcendental is evaluated, so
    // both engines replay the release bit-for-bit (the one power
    // computed, 2^(20−k), is exact in double). Draw: keyed md5
    // uniform, target = u32·totalW DIV 2^32 on positive longs.
    "dp_median_release" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy
        .dpMedian(Tables.documents(s, dir), "source", "n_chars",
          gridMax = 600L, seed = "dpq:v1:")
        .orderBy($"source")
    }),

    // M20 general-ε: the SAME exponential mechanism at an ARBITRARY
    // budget (ε = 0.5 here) — the weight exp(−ε·k̂/2) is quantized
    // ONCE on the driver to the exact-long table
    // floor(2^20·exp(−ε·k̂/2) + 0.5) (Privacy.medianWeightTable) and
    // embedded as a LITERAL in both engines, so neither ever
    // evaluates exp(): the M20 determinism rule freed from the
    // ε = 2·ln 2 power-of-two restriction. k̂ is the per-group
    // min-shifted rank distance (shift-invariance of the mechanism;
    // guarantees the peak always carries weight — no key can vanish).
    "dp_median_eps" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy
        .dpMedian(Tables.documents(s, dir), "source", "n_chars",
          gridMax = 600L, epsilon = 0.5, seed = "dpe:v1:")
        .orderBy($"source")
    }),

    // M22: DP released QUANTILE via the exponential mechanism at an
    // arbitrary rational quantile — Smith (2011)'s utility
    // U(v) = |(qDen−qNum)·#{x<v} − qNum·#{x>v}| has sensitivity
    // Δ = max(qNum, qDen−qNum), so the weight exp(−ε·Û/(2Δ)) is the
    // SAME driver-quantized exact-long table as dp_median_eps,
    // evaluated at ε/Δ (the median is the 1/2, Δ = 1 case). First
    // quartile here: q = 1/4, Δ = 3, ε = 0.5 — both engines embed
    // the identical literal table, no engine-side exp().
    "dp_quantile_release" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Privacy
        .dpQuantile(Tables.documents(s, dir), "source", "n_chars",
          gridMax = 600L, qNum = 1, qDen = 4, epsilon = 0.5,
          seed = "dpu:v1:")
        .orderBy($"source")
    }),

    // M24: ε-DP TOP-K heavy hitters — pure POST-PROCESSING of the
    // known-domain count release: all 25 public-domain counts release
    // once under ε (seed 'dpt:v1:', the identical Laplace spelling),
    // then the 5 largest RELEASED counts are selected, ties broken by
    // key — a deterministic public rule that costs no extra budget
    // (the post-processing theorem). Ranking TRUE counts and noising
    // only the winners would leak the selection itself; this spelling
    // never ranks the truth. Recorded as release 9 in the M21 ledger.
    "dp_topk_release" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val domain = (0 to 24).map(i => s"src$i").toDF("source")
      graft.operators.Privacy
        .dpTopK(Tables.documents(s, dir), "source", epsilon = 0.5,
          seed = "dpt:v1:", domain = domain, k = 5)
        .withColumnRenamed("rank", "released_rank")
        .orderBy($"released_rank")
    }),

    // M25: ε-DP two-way CONTINGENCY release — the co-occurrence
    // table (source × length-bucket) under ONE ε: a document lands in
    // exactly one cell, so the whole 25×13 public cell domain (a
    // driver-built literal cross product — never an in-plan
    // cartesian) releases count + Laplace(1/ε) per cell with
    // sensitivity 1; absent cells release pure noise (the M17
    // presence rule applied to cells). The per-cell draw keys on
    // source || '|' || bucket — both engines spell it identically.
    // Recorded as release 10 in the M21 ledger fixture.
    "dp_crosstab_release" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val domain = (for { i <- 0 to 24; b <- 0L to 12L }
        yield (s"src$i", b)).toDF("source", "len_bucket")
      graft.operators.Privacy
        .dpCrosstab(Tables.documents(s, dir)
          .select($"source", expr("n_chars DIV 100").as("len_bucket")),
          "source", "len_bucket", epsilon = 0.5, seed = "dpx:v1:",
          domain = domain)
        .orderBy($"source", $"len_bucket")
    }),

    // M21: the DP release LEDGER + budget audit — the piece that
    // makes the family's composition rule ENFORCEABLE: every fixture
    // release records (dataset, mechanism, key domain size, exact
    // micro-ε, md5 seed FINGERPRINT — never the seed, caller-declared
    // stamp) through the TxBatch idempotent-append protocol, so a
    // retried release pipeline can never double-count its ε (release
    // id 1 is deliberately re-recorded below — the no-op marker keeps
    // the audit single-counted, and the hash gate would catch a
    // double). The audit is the row a release-approval gate reads:
    // cumulative spent ε per dataset as exact long micro-ε sums. Key
    // domain sizes are DATA-dependent (distinct sources / length
    // buckets), so the oracle recomputes them from the parquet.
    "dp_budget_audit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ledger = ledgerCache.computeIfAbsent(dir, d => {
        val docs = Tables.documents(s, d)
        val nSources = docs.select($"source").distinct().count()
        val nBuckets = docs.select(expr("n_chars DIV 100"))
          .distinct().count()
        // ledger path keyed by a CONTENT fingerprint of the fixture,
        // not the dir string's hashCode: the ledger persists in
        // tmpdir across JVM runs, and recordRelease is idempotent by
        // id — a regenerated fixture with different distinct counts
        // under the SAME dir would otherwise no-op against the stale
        // ledger and hand the audit stale n_keys while the oracle
        // recomputes fresh ones (hex, never abs(hashCode): abs
        // collides across dirs and is negative at Int.MinValue)
        val fp = {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(s"$d|$nSources|$nBuckets".getBytes("UTF-8"))
          md.digest().map("%02x".format(_)).mkString.take(16)
        }
        val p = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_dp_ledger_v2_$fp"
        def rec(id: Long, dataset: String, mech: String, key: String,
            epsMicro: Long, nKeys: Long, seed: String): Unit = {
          graft.operators.Privacy.recordRelease(s, p, id, dataset,
            mech, key, epsMicro, nKeys, seed, "2026-08-16")
          ()
        }
        rec(1L, "documents", "counts", "source", 500000L, nSources,
          "dp:v1:")
        rec(2L, "documents", "counts_domain", "source", 500000L, 25L,
          "dpd:v1:")
        rec(3L, "documents_len", "histogram", "len_bucket", 500000L,
          nBuckets, "dph:v1:")
        rec(4L, "documents", "sum", "source", 500000L, nSources,
          "dps:v1:")
        rec(5L, "documents", "mean", "source", 500000L, nSources,
          "dpm:v1:")
        // ε = 2·ln 2 in micro-ε: floor(1386294.361... + 0.5)
        rec(6L, "documents", "median", "source", 1386294L, nSources,
          "dpq:v1:")
        rec(7L, "documents", "median_eps", "source", 500000L,
          nSources, "dpe:v1:")
        rec(8L, "documents", "quantile", "source", 500000L, nSources,
          "dpu:v1:")
        rec(9L, "documents", "topk", "source", 500000L, 25L,
          "dpt:v1:")
        rec(10L, "documents", "crosstab", "source|len_bucket",
          500000L, 325L, "dpx:v1:")
        // the retried pipeline: re-recording a settled id is a no-op
        rec(1L, "documents", "counts", "source", 500000L, nSources,
          "dp:v1:")
        p
      })
      graft.operators.Privacy.budgetAudit(s, ledger)
        .orderBy($"dataset")
    }),
  )

  private def chSelect(cols: String*): String = OrderCols.map { c =>
    cols.collectFirst { case e if e.startsWith(s"$c=") =>
      s"${e.stripPrefix(s"$c=")} AS $c" }.getOrElse(c)
  }.mkString(", ")

  /** Shared CTE chain rebuilding the changelog and its fold — the
    * merge_upsert oracle and the snapshot_diff oracle must see the
    * SAME merged relation. */
  private val mergedCtes: String =
    s"""ch AS (
       |  SELECT ${chSelect("o_totalprice=o_totalprice + 50.0")},
       |    'U' AS op, 1 AS seq FROM orders WHERE o_orderkey % 7 = 3
       |  UNION ALL
       |  SELECT ${chSelect("o_totalprice=o_totalprice + 100.0")},
       |    'U', 2 FROM orders WHERE o_orderkey % 14 = 3
       |  UNION ALL
       |  SELECT ${chSelect()}, 'D', 1 FROM orders WHERE o_orderkey % 7 = 5
       |  UNION ALL
       |  SELECT ${chSelect("o_orderkey=-o_orderkey")},
       |    'I', 1 FROM orders WHERE o_orderkey % 11 = 2),
       |latest AS (
       |  SELECT * FROM (
       |    SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY o_orderkey
       |      ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1),
       |merged AS (
       |  SELECT ${chSelect()} FROM orders o
       |  WHERE NOT EXISTS (SELECT 1 FROM latest l
       |                    WHERE l.o_orderkey = o.o_orderkey)
       |  UNION ALL
       |  SELECT ${chSelect()} FROM latest WHERE op <> 'D')""".stripMargin

  val oracle: Map[String, String] = Map(
    "retention_sweep" -> {
      val ttlCase = "CASE event_type WHEN 'error' THEN 7 " +
        "WHEN 'view' THEN 10 WHEN 'click' THEN 14 " +
        "WHEN 'signup' THEN 21 ELSE 25 END"
      s"""WITH ref AS (SELECT MAX(ts) AS now_ts FROM events),
         |e AS (
         |  SELECT event_type, ts, value,
         |    CAST($ttlCase AS BIGINT) AS ttl_days,
         |    ts < now_ts - ($ttlCase) * INTERVAL 1 DAY AS expired
         |  FROM events, ref)
         |SELECT event_type, ttl_days,
         |  CAST(SUM(CASE WHEN expired THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_expired,
         |  CAST(SUM(CASE WHEN NOT expired THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_retained,
         |  MIN(CASE WHEN NOT expired THEN ts END) AS oldest_retained_ts,
         |  ${QueryUtil.sqlDsum("CASE WHEN expired THEN value ELSE 0.0 END")}
         |    AS expired_value_mass
         |FROM e GROUP BY 1, 2
         |ORDER BY event_type""".stripMargin
    },

    "merge_upsert" ->
      s"""WITH $mergedCtes
         |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,

    // same latest CTE as the merge oracle, same presence
    // classification
    "changelog_compact" ->
      s"""WITH $mergedCtes
         |SELECT l.o_orderkey,
         |  CASE WHEN l.op = 'D' THEN 'D'
         |       WHEN o.o_orderkey IS NULL THEN 'I'
         |       ELSE 'U' END AS net_op,
         |  l.o_totalprice
         |FROM latest l LEFT JOIN orders o ON l.o_orderkey = o.o_orderkey
         |WHERE NOT (l.op = 'D' AND o.o_orderkey IS NULL)
         |ORDER BY l.o_orderkey""".stripMargin,

    // the ORACLE IS THE FULL RECOMPUTE over the merged snapshot — if
    // base+delta hash-matches it, the incremental path is proven
    // equivalent to recomputation
    "ivm_agg_maintain" ->
      s"""WITH $mergedCtes
         |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS total_q4
         |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,

    // same gaps-and-islands history, same covering-interval filter
    "scd2_snapshot_at" ->
      """WITH ch AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    MIN(event_type) AS state
        |  FROM events
        |  WHERE user_id % 5 = 0 AND event_type IN ('signup', 'purchase')
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT user_id, state, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM ch)
        |SELECT user_id, state, valid_from, valid_to FROM h
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY user_id""".stripMargin,

    // DuckDB's ASOF JOIN is exactly the PIT floor semantics (latest
    // change row with ts <= fact ts, inclusive); state_since = that
    // change's ts = the engine's valid_from
    "scd2_pit" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type
        |  FROM events WHERE user_id % 5 = 0),
        |ch AS (
        |  SELECT user_id, ts, MIN(event_type) AS state
        |  FROM ev WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY 1, 2),
        |probe AS (
        |  SELECT event_id, user_id, ts FROM ev
        |  WHERE event_type NOT IN ('signup', 'purchase'))
        |SELECT p.event_id, p.user_id, p.ts,
        |  c.state AS state_at_event, c.ts AS state_since
        |FROM probe p ASOF LEFT JOIN ch c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "scd2_history" ->
      """WITH ch AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    MIN(event_type) AS state
        |  FROM events WHERE user_id % 5 = 0 GROUP BY 1, 2)
        |SELECT user_id, state, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    AS is_current
        |FROM ch
        |ORDER BY user_id, valid_from""".stripMargin,

    "snapshot_diff" ->
      s"""WITH $mergedCtes
         |SELECT COALESCE(o.o_orderkey, m.o_orderkey) AS o_orderkey,
         |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
         |       WHEN m.o_orderkey IS NULL THEN 'removed'
         |       ELSE 'changed' END AS change_type,
         |  o.o_totalprice AS old_price, m.o_totalprice AS new_price
         |FROM orders o FULL JOIN merged m ON o.o_orderkey = m.o_orderkey
         |WHERE o.o_orderkey IS NULL OR m.o_orderkey IS NULL
         |   OR o.o_totalprice <> m.o_totalprice
         |ORDER BY o_orderkey""".stripMargin,

    // the same request set, the same two-hop cascade, counts + the
    // retained-key checksum recomputed from scratch
    "cascade_delete" ->
      """WITH delc AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_acctbal < 0 AND c_mktsegment = 'BUILDING'),
        |delo AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM delc)),
        |a AS (
        |  SELECT 'customer' AS tbl,
        |    CAST(SUM(CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_deleted,
        |    CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN c.c_custkey
        |      ELSE 0 END) AS BIGINT) AS retained_key_sum
        |  FROM customer c LEFT JOIN delc d ON c.c_custkey = d.c_custkey
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NULL THEN o.o_orderkey
        |      ELSE 0 END) AS BIGINT)
        |  FROM orders o LEFT JOIN delo d ON o.o_orderkey = d.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem',
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(SUM(CASE WHEN d.o_orderkey IS NULL THEN l.l_orderkey
        |      ELSE 0 END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN delo d ON l.l_orderkey = d.o_orderkey)
        |SELECT * FROM a ORDER BY tbl""".stripMargin,

    "expectations_report" ->
      """WITH dup AS (
        |  SELECT COALESCE(SUM(c), 0) AS n FROM (
        |    SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
        |    HAVING COUNT(*) > 1)),
        |nn AS (
        |  SELECT SUM(CASE WHEN o_custkey IS NULL OR o_orderdate IS NULL
        |    OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS n FROM orders),
        |acc AS (
        |  SELECT SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH',
        |    '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 0 ELSE 1 END)
        |    AS n FROM orders),
        |rng AS (
        |  SELECT SUM(CASE WHEN o_totalprice <= 0.0
        |    OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END) AS n
        |  FROM orders),
        |ri AS (
        |  SELECT COUNT(*) AS n FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer
        |                    WHERE c_custkey = o_custkey))
        |SELECT check_name, CAST(n AS BIGINT) AS n_violations, n = 0 AS pass
        |FROM (
        |  SELECT 'unique_orderkey' AS check_name, n FROM dup
        |  UNION ALL SELECT 'not_null_core_cols', n FROM nn
        |  UNION ALL SELECT 'accepted_priorities', n FROM acc
        |  UNION ALL SELECT 'totalprice_range', n FROM rng
        |  UNION ALL SELECT 'fk_custkey', n FROM ri)
        |ORDER BY check_name""".stripMargin,

    "l_diversity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    COUNT(DISTINCT o_orderpriority) AS l_div,
        |    CAST(COUNT(*) AS BIGINT) AS gsize
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2)
        |SELECT CAST(l AS BIGINT) AS l, CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(n_violating_groups AS BIGINT) AS n_violating_groups,
        |  CAST(n_rows_at_risk AS BIGINT) AS n_rows_at_risk
        |FROM (
        |  SELECT ls.l, COUNT(*) AS n_groups,
        |    SUM(CASE WHEN l_div < ls.l THEN 1 ELSE 0 END)
        |      AS n_violating_groups,
        |    SUM(CASE WHEN l_div < ls.l THEN gsize ELSE 0 END)
        |      AS n_rows_at_risk
        |  FROM g CROSS JOIN (VALUES (2), (3), (5)) ls(l)
        |  GROUP BY 1)
        |ORDER BY l""".stripMargin,

    // same md5 canonical string (each value N-for-NULL /
    // length-prefixed — the injective encoding of Fingerprints), the
    // same 15-hex-char fold to a 60-bit integer (list_reduce ≡ conv),
    // the same XOR aggregate
    "table_fingerprint" -> {
      def t(e: String) = s"CASE WHEN $e IS NULL THEN 'N' ELSE " +
        s"concat(length(CAST($e AS VARCHAR)), ':', CAST($e AS VARCHAR)) END"
      val canon = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "strftime(o_orderdate, '%Y-%m-%d')")
        .map(t).mkString(",\n        ")
      s"""WITH r AS (
        |  SELECT o_orderkey, o_orderkey % 16 AS bucket,
        |    list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef',
        |        md5(concat_ws('|', $canon))[i:i])
        |        - 1 AS BIGINT)),
        |      (a, x) -> a * 16 + x) AS h
        |  FROM orders)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_fp,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    // integer cross-multiplied EMD terms — the engines never compare a
    // double; the CASE error() mirrors the Spark-side envelope guard
    "t_closeness" ->
      """WITH j AS (
        |  SELECT c_nationkey, c_mktsegment, o_orderpriority
        |  FROM customer JOIN orders ON c_custkey = o_custkey),
        |cell AS (
        |  SELECT c_nationkey, c_mktsegment, o_orderpriority,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM j GROUP BY 1, 2, 3),
        |gdist AS (
        |  SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS d
        |  FROM cell GROUP BY 1),
        |tot AS (
        |  SELECT CASE WHEN SUM(d) > 300000000
        |           THEN error('t_closeness: integer EMD envelope')
        |           ELSE CAST(SUM(d) AS BIGINT) END AS n_all,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM gdist),
        |grp AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS n_g
        |  FROM cell GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, g.n_g,
        |    gl.o_orderpriority, gl.d, COALESCE(cell.c, 0) AS c
        |  FROM grp g CROSS JOIN gdist gl
        |  LEFT JOIN cell ON cell.c_nationkey = g.c_nationkey
        |    AND cell.c_mktsegment = g.c_mktsegment
        |    AND cell.o_orderpriority = gl.o_orderpriority),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, n_g,
        |    SUM(c) OVER w AS cum_c, SUM(d) OVER w AS cum_d
        |  FROM grid WINDOW w AS (
        |    PARTITION BY c_nationkey, c_mktsegment
        |    ORDER BY o_orderpriority)),
        |emd AS (
        |  SELECT c_nationkey, c_mktsegment, ANY_VALUE(n_g) AS n_g,
        |    CAST(SUM(ABS(cum_c * n_all - cum_d * n_g)) AS BIGINT)
        |      AS sum_abs,
        |    ANY_VALUE(n_all) AS n_all, ANY_VALUE(m) AS m
        |  FROM cum CROSS JOIN tot GROUP BY 1, 2)
        |SELECT CAST(t_pct AS BIGINT) AS t_pct,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN sum_abs * 100 > t_pct * (m-1) * n_g * n_all
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
        |  CAST(SUM(CASE WHEN sum_abs * 100 > t_pct * (m-1) * n_g * n_all
        |    THEN n_g ELSE 0 END) AS BIGINT) AS n_rows_at_risk
        |FROM emd CROSS JOIN (VALUES (2), (4), (6)) ts(t_pct)
        |GROUP BY 1 ORDER BY t_pct""".stripMargin,

    "k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |    COUNT(*) AS gsize
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN gsize < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_groups,
        |  CAST(SUM(CASE WHEN gsize < k THEN gsize ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk
        |FROM g CROSS JOIN (VALUES (CAST(2 AS BIGINT)), (CAST(5 AS BIGINT)),
        |  (CAST(10 AS BIGINT))) ks(k)
        |GROUP BY 1 ORDER BY k""".stripMargin,

    // the dp_counts mechanism over the derived length-bucket key
    // (seed 'dph:v1:'); positive DIV == // bucketing; explicit-floor
    // release rounding (sign-safe in both engines)
    "dp_histogram" ->
      """WITH b AS (
        |  SELECT n_chars // 100 AS len_bucket FROM documents),
        |g AS (
        |  SELECT len_bucket, CAST(COUNT(*) AS BIGINT) AS n_true,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dph:v1:' || CAST(len_bucket AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM b GROUP BY 1),
        |n AS (
        |  SELECT len_bucket, n_true,
        |    CAST(FLOOR(-2.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g)
        |SELECT len_bucket, n_true, noise_micro,
        |  n_true + CAST(FLOOR((noise_micro + 500000) / 1000000.0)
        |    AS BIGINT) AS released
        |FROM n ORDER BY len_bucket""".stripMargin,

    // the histogram's known-domain twin: every bucket of the public
    // literal range [0, 12] releases, empty ones as pure noise
    "dp_histogram_domain" ->
      """WITH dom AS (
        |  SELECT CAST(i AS BIGINT) AS len_bucket FROM range(0, 13) t(i)),
        |cnt AS (
        |  SELECT n_chars // 100 AS len_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_present
        |  FROM documents GROUP BY 1),
        |g AS (
        |  SELECT dom.len_bucket,
        |    COALESCE(cnt.n_present, CAST(0 AS BIGINT)) AS n_true,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dphd:v1:' ||
        |          CAST(dom.len_bucket AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM dom LEFT JOIN cnt ON dom.len_bucket = cnt.len_bucket),
        |n AS (
        |  SELECT len_bucket, n_true,
        |    CAST(FLOOR(-2.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g)
        |SELECT len_bucket, n_true, noise_micro,
        |  n_true + CAST(FLOOR((noise_micro + 500000) / 1000000.0)
        |    AS BIGINT) AS released
        |FROM n ORDER BY len_bucket""".stripMargin,

    // identical keyed md5 fold (the PipelineOracleSupport.sqlMd5Fold32
    // spelling, seed 'dp:v1:'), identical inverse-CDF arithmetic,
    // micro quantization, and explicit-floor release rounding
    "dp_counts" ->
      """WITH g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dp:v1:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM documents GROUP BY 1),
        |n AS (
        |  SELECT source, n_docs,
        |    CAST(FLOOR(-2.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g)
        |SELECT source, n_docs, noise_micro,
        |  n_docs + CAST(FLOOR((noise_micro + 500000) / 1000000.0)
        |    AS BIGINT) AS released
        |FROM n ORDER BY source""".stripMargin,

    // the public literal domain (src0..src24) LEFT-joined to the true
    // counts — absent keys release 0 + noise; seed 'dpd:v1:'
    // top-k of the RELEASED known-domain counts (seed 'dpt:v1:',
    // scale 1/ε = 2.0), ties by key — the rank never sees a true count
    "dp_topk_release" ->
      """WITH dom AS (
        |  SELECT 'src' || CAST(i AS VARCHAR) AS source
        |  FROM range(0, 25) t(i)),
        |cnt AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_present
        |  FROM documents GROUP BY 1),
        |g AS (
        |  SELECT dom.source,
        |    COALESCE(cnt.n_present, CAST(0 AS BIGINT)) AS n_true,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpt:v1:' || CAST(dom.source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM dom LEFT JOIN cnt ON dom.source = cnt.source),
        |n AS (
        |  SELECT source, n_true,
        |    CAST(FLOOR(-2.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g),
        |r AS (
        |  SELECT source, n_true + CAST(FLOOR((noise_micro + 500000) /
        |    1000000.0) AS BIGINT) AS released_count FROM n),
        |t AS (
        |  SELECT source, released_count,
        |    CAST(ROW_NUMBER() OVER (ORDER BY released_count DESC,
        |      source) AS BIGINT) AS released_rank
        |  FROM r)
        |SELECT source, released_count, released_rank
        |FROM t WHERE released_rank <= 5
        |ORDER BY released_rank""".stripMargin,

    // two-way contingency release: 25×13 public cell domain left-
    // joined to the true cell counts; per-cell draw keys on
    // source || '|' || bucket under seed 'dpx:v1:', scale 1/ε = 2.0
    "dp_crosstab_release" ->
      """WITH dom AS (
        |  SELECT 'src' || CAST(i AS VARCHAR) AS source,
        |    CAST(b AS BIGINT) AS len_bucket
        |  FROM range(0, 25) t(i), range(0, 13) u(b)),
        |cnt AS (
        |  SELECT source, n_chars // 100 AS len_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_present
        |  FROM documents GROUP BY 1, 2),
        |g AS (
        |  SELECT dom.source, dom.len_bucket,
        |    COALESCE(cnt.n_present, CAST(0 AS BIGINT)) AS n_true,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpx:v1:' || dom.source || '|' ||
        |          CAST(dom.len_bucket AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM dom LEFT JOIN cnt
        |    ON dom.source = cnt.source
        |    AND dom.len_bucket = cnt.len_bucket),
        |n AS (
        |  SELECT source, len_bucket, n_true,
        |    CAST(FLOOR(-2.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g)
        |SELECT source, len_bucket, n_true, noise_micro,
        |  n_true + CAST(FLOOR((noise_micro + 500000) / 1000000.0)
        |    AS BIGINT) AS released
        |FROM n ORDER BY source, len_bucket""".stripMargin,

    "dp_counts_domain" ->
      """WITH dom AS (
        |  SELECT 'src' || CAST(i AS VARCHAR) AS source
        |  FROM range(0, 25) t(i)),
        |cnt AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_present
        |  FROM documents GROUP BY 1),
        |g AS (
        |  SELECT dom.source,
        |    COALESCE(cnt.n_present, CAST(0 AS BIGINT)) AS n_true,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpd:v1:' || CAST(dom.source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM dom LEFT JOIN cnt ON dom.source = cnt.source),
        |n AS (
        |  SELECT source, n_true,
        |    CAST(FLOOR(-2.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g)
        |SELECT source, n_true, noise_micro,
        |  n_true + CAST(FLOOR((noise_micro + 500000) / 1000000.0)
        |    AS BIGINT) AS released
        |FROM n ORDER BY source""".stripMargin,

    // clipped-sum release: clip n_chars into [−400, 400] per row
    // (exact longs), sum, noise at scale clip/ε = 800 under seed
    // 'dps:v1:'
    "dp_sum_release" ->
      """WITH c AS (
        |  SELECT source,
        |    GREATEST(LEAST(CAST(n_chars AS BIGINT), 400), -400) AS v
        |  FROM documents),
        |g AS (
        |  SELECT source, CAST(SUM(v) AS BIGINT) AS sum_clipped,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dps:v1:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM c GROUP BY 1),
        |n AS (
        |  SELECT source, sum_clipped,
        |    CAST(FLOOR(-800.0 * sign((u32 + 0.5) / 4294967296.0 - 0.5) *
        |      ln(1.0 - 2.0 * abs((u32 + 0.5) / 4294967296.0 - 0.5)) *
        |      1000000.0 + 0.5) AS BIGINT) AS noise_micro
        |  FROM g)
        |SELECT source, sum_clipped, noise_micro,
        |  sum_clipped + CAST(FLOOR((noise_micro + 500000) / 1000000.0)
        |    AS BIGINT) AS released
        |FROM n ORDER BY source""".stripMargin,

    // mean = the ε/2 + ε/2 count+sum pair (scales 2/ε = 4 and
    // 2·clip/ε = 1600) under derived seeds 'dpm:v1:count:' /
    // 'dpm:v1:sum:'; the published mean divides the noised pair
    // (denominator floored at 1) and quantizes q6
    "dp_mean_release" ->
      """WITH c AS (
        |  SELECT source,
        |    GREATEST(LEAST(CAST(n_chars AS BIGINT), 400), -400) AS v
        |  FROM documents),
        |g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_true,
        |    CAST(SUM(v) AS BIGINT) AS sum_clipped,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpm:v1:count:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS uc,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpm:v1:sum:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS us
        |  FROM c GROUP BY 1),
        |n AS (
        |  SELECT source,
        |    n_true + CAST(FLOOR((
        |      CAST(FLOOR(-4.0 * sign((uc + 0.5) / 4294967296.0 - 0.5) *
        |        ln(1.0 - 2.0 * abs((uc + 0.5) / 4294967296.0 - 0.5)) *
        |        1000000.0 + 0.5) AS BIGINT) + 500000) / 1000000.0)
        |      AS BIGINT) AS released_count,
        |    sum_clipped + CAST(FLOOR((
        |      CAST(FLOOR(-1600.0 * sign((us + 0.5) / 4294967296.0 - 0.5) *
        |        ln(1.0 - 2.0 * abs((us + 0.5) / 4294967296.0 - 0.5)) *
        |        1000000.0 + 0.5) AS BIGINT) + 500000) / 1000000.0)
        |      AS BIGINT) AS released_sum
        |  FROM g)
        |SELECT source, released_count, released_sum,
        |  FLOOR(CAST(released_sum AS DOUBLE) /
        |    CAST(GREATEST(released_count, CAST(1 AS BIGINT)) AS DOUBLE) *
        |    1000000.0 + 0.5) / 1000000.0 AS released_mean
        |FROM n ORDER BY source""".stripMargin,

    // the exponential mechanism replayed exactly: rank utility over
    // the public 0..600 grid, power-of-two weights 2^(20−k) (the one
    // power is exact in double), keyed-md5 draw, positive // division
    "dp_median_release" ->
      """WITH c AS (
        |  SELECT source,
        |    LEAST(GREATEST(CAST(n_chars AS BIGINT), 0), 600) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, CAST(g.range AS BIGINT) AS v
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN range(0, 601) g),
        |j AS (
        |  SELECT grid.source, grid.v,
        |    COALESCE(c.c, CAST(0 AS BIGINT)) AS c
        |  FROM grid LEFT JOIN c
        |    ON grid.source = c.source AND grid.v = c.v),
        |w AS (
        |  SELECT source, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v)
        |      AS BIGINT) AS le,
        |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_true
        |  FROM j),
        |x0 AS (
        |  SELECT source, v, n_true,
        |    ABS(2 * le - c - n_true)
        |      - MIN(ABS(2 * le - c - n_true))
        |        OVER (PARTITION BY source) AS k
        |  FROM w),
        |x AS (
        |  SELECT source, v, n_true,
        |    CASE WHEN k <= 20 THEN CAST(power(2.0, 20 - k) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS wt
        |  FROM x0),
        |y AS (
        |  SELECT source, v, n_true, wt,
        |    CAST(SUM(wt) OVER (PARTITION BY source ORDER BY v)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(wt) OVER (PARTITION BY source) AS BIGINT) AS totw,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpq:v1:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM x)
        |SELECT source, n_true, v AS released_median
        |FROM y
        |WHERE cumw > (u32 * totw) // 4294967296
        |  AND cumw - wt <= (u32 * totw) // 4294967296
        |ORDER BY source""".stripMargin,

    // general-ε twin: identical pipeline, but the weight comes from
    // the SAME driver-quantized literal table the Spark side embeds
    // (Privacy.medianWeightTable(0.5)) — neither engine evaluates
    // exp(), so the release replays bit-for-bit at any ε
    "dp_median_eps" -> {
      val table = graft.operators.Privacy.medianWeightTable(0.5)
      val lst = table.mkString("[", ", ", "]")
      s"""WITH c AS (
        |  SELECT source,
        |    LEAST(GREATEST(CAST(n_chars AS BIGINT), 0), 600) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, CAST(g.range AS BIGINT) AS v
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN range(0, 601) g),
        |j AS (
        |  SELECT grid.source, grid.v,
        |    COALESCE(c.c, CAST(0 AS BIGINT)) AS c
        |  FROM grid LEFT JOIN c
        |    ON grid.source = c.source AND grid.v = c.v),
        |w AS (
        |  SELECT source, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v)
        |      AS BIGINT) AS le,
        |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_true
        |  FROM j),
        |x0 AS (
        |  SELECT source, v, n_true,
        |    ABS(2 * le - c - n_true)
        |      - MIN(ABS(2 * le - c - n_true))
        |        OVER (PARTITION BY source) AS k
        |  FROM w),
        |x AS (
        |  SELECT source, v, n_true,
        |    CASE WHEN k < ${table.length}
        |      THEN CAST(list_extract($lst,
        |        CAST(k + 1 AS INT)) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS wt
        |  FROM x0),
        |y AS (
        |  SELECT source, v, n_true, wt,
        |    CAST(SUM(wt) OVER (PARTITION BY source ORDER BY v)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(wt) OVER (PARTITION BY source) AS BIGINT) AS totw,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpe:v1:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM x)
        |SELECT source, n_true, v AS released_median
        |FROM y
        |WHERE cumw > (u32 * totw) // 4294967296
        |  AND cumw - wt <= (u32 * totw) // 4294967296
        |ORDER BY source""".stripMargin
    },

    // arbitrary-quantile twin: Smith's utility |3·lt − gt| =
    // |4·le − 3·c − n| for q = 1/4 (sensitivity 3), weights from the
    // SAME driver-quantized literal table at ε/Δ = 0.5/3
    "dp_quantile_release" -> {
      val table = graft.operators.Privacy.medianWeightTable(0.5 / 3.0)
      val lst = table.mkString("[", ", ", "]")
      s"""WITH c AS (
        |  SELECT source,
        |    LEAST(GREATEST(CAST(n_chars AS BIGINT), 0), 600) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, CAST(g.range AS BIGINT) AS v
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN range(0, 601) g),
        |j AS (
        |  SELECT grid.source, grid.v,
        |    COALESCE(c.c, CAST(0 AS BIGINT)) AS c
        |  FROM grid LEFT JOIN c
        |    ON grid.source = c.source AND grid.v = c.v),
        |w AS (
        |  SELECT source, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v)
        |      AS BIGINT) AS le,
        |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_true
        |  FROM j),
        |x0 AS (
        |  SELECT source, v, n_true,
        |    ABS(4 * le - 3 * c - n_true)
        |      - MIN(ABS(4 * le - 3 * c - n_true))
        |        OVER (PARTITION BY source) AS k
        |  FROM w),
        |x AS (
        |  SELECT source, v, n_true,
        |    CASE WHEN k < ${table.length}
        |      THEN CAST(list_extract($lst,
        |        CAST(k + 1 AS INT)) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS wt
        |  FROM x0),
        |y AS (
        |  SELECT source, v, n_true, wt,
        |    CAST(SUM(wt) OVER (PARTITION BY source ORDER BY v)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(wt) OVER (PARTITION BY source) AS BIGINT) AS totw,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5('dpu:v1:' || CAST(source AS VARCHAR)),
        |          CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u32
        |  FROM x)
        |SELECT source, n_true, v AS released_quantile
        |FROM y
        |WHERE cumw > (u32 * totw) // 4294967296
        |  AND cumw - wt <= (u32 * totw) // 4294967296
        |ORDER BY source""".stripMargin
    },

    // the ledger's audit replayed from the fixture's release plan:
    // the key-domain sizes are data-dependent (distinct sources /
    // 100-char length buckets), the ε spends are the releases'
    // literal budgets in exact micro-ε; the duplicate record of
    // release id 1 must NOT appear (the idempotent-append no-op)
    "dp_budget_audit" ->
      """WITH ks AS (
        |  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n
        |  FROM documents),
        |kb AS (
        |  SELECT CAST(COUNT(DISTINCT n_chars // 100) AS BIGINT) AS n
        |  FROM documents),
        |rel AS (
        |  SELECT 'documents' AS dataset,
        |    CAST(500000 AS BIGINT) AS eps, ks.n AS n_keys FROM ks
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    CAST(25 AS BIGINT)
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    CAST(25 AS BIGINT)
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    CAST(325 AS BIGINT)
        |  UNION ALL SELECT 'documents_len', CAST(500000 AS BIGINT),
        |    kb.n FROM kb
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    ks.n FROM ks
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    ks.n FROM ks
        |  UNION ALL SELECT 'documents', CAST(1386294 AS BIGINT),
        |    ks.n FROM ks
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    ks.n FROM ks
        |  UNION ALL SELECT 'documents', CAST(500000 AS BIGINT),
        |    ks.n FROM ks)
        |SELECT dataset, CAST(COUNT(*) AS BIGINT) AS n_releases,
        |  CAST(SUM(eps) AS BIGINT) AS eps_micro_spent,
        |  CAST(SUM(n_keys) AS BIGINT) AS n_keys_released
        |FROM rel GROUP BY dataset ORDER BY dataset""".stripMargin,
  )
}
