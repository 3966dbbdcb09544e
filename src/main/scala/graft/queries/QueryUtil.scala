package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for DuckDB-oracle-exact aggregation.
  *
  * Double sums are order-dependent, and Spark's partitioned aggregation
  * order differs from DuckDB's — so a raw `sum(double)` can differ in the
  * last ulps and fail a hash compare. (Casting each row to DECIMAL is not
  * enough either: Spark and DuckDB round the double→decimal conversion
  * differently at half-way points, observed on ~0.4% of rows.)
  *
  * The recipe used throughout the query inventory:
  *
  *   1. keep per-row arithmetic in double — IEEE ops on identical inputs
  *      with identical expression shape are bitwise deterministic across
  *      engines;
  *   2. quantize per row with pure double ops: `floor(x * 1e4 + 0.5)` —
  *      still bitwise deterministic, yields an exactly-representable
  *      integer (Spark `floor` returns Long);
  *   3. sum the integers — exact, associative, partition-order-free;
  *   4. divide the final total by 1e4 in double.
  *
  * The DuckDB oracle mirrors this:
  *   `CAST(SUM(CAST(FLOOR(expr * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0`.
  *
  * This is also the 100 TB answer: integer partial sums are map-side
  * combinable and associative, so the plan stays a standard
  * partial → shuffle → final HashAggregate. (Long overflow headroom:
  * 2^63 / 1e4 ≈ 9.2e14 in value terms per group.)
  */
object QueryUtil {

  /** Order-independent, engine-exact sum of a double expression,
    * quantized to 4 decimal places. */
  def dsum(c: Column): Column =
    sum(floor(c * lit(10000.0) + lit(0.5))).cast("double") / lit(10000.0)

  /** Order-independent, engine-exact average (4-decimal quantization).
    * Standard AVG semantics: divides by the count of non-null inputs. */
  def davg(c: Column): Column =
    sum(floor(c * lit(10000.0) + lit(0.5))).cast("double") / lit(10000.0) /
      count(c)

  /** Deterministic 6-decimal quantization of a double expression —
    * for values computed identically up to libm/summation-order ulps
    * in both engines (ratios, norms, cosines, log10). */
  def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0)

  /** DuckDB-side SQL for [[q6]]. */
  def sqlQ6(e: String): String =
    s"(CAST(FLOOR(($e) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)"

  /** DuckDB-side SQL for [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"(CAST(SUM(CAST(FLOOR(($expr) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0)"

  /** DuckDB-side SQL for [[davg]]. */
  def sqlDavg(expr: String): String =
    s"(CAST(SUM(CAST(FLOOR(($expr) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT($expr))"
}

/** Per-dir cache of session-bound values (DataFrames, catalog table
  * names, structs of frames) shared across the query inventory, safe
  * against SparkSession restarts within one JVM: an entry is reused
  * only while the session it was built on is still the caller's live
  * session. Without the check, a frame cached under the first caller's
  * session outlives `spark.stop()` — the next session gets a frame
  * that throws on first use, and a `localCheckpoint`'ed labeling pins
  * executor blocks for the JVM lifetime. A stale entry is rebuilt on
  * the caller's session and replaced in place (`compute` keeps the
  * build atomic per key, matching the old computeIfAbsent contract).
  */
private[graft] final class SessionCache[V] {
  private final class Entry(
      val session: org.apache.spark.sql.SparkSession, val value: V)
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  def get(s: org.apache.spark.sql.SparkSession, dir: String)(
      build: String => V): V =
    m.compute(dir, (d, e) =>
      if (e != null && (e.session eq s) && !s.sparkContext.isStopped) e
      else new Entry(s, build(d))).value

  /** Dump-time read: the cached value for `dir` if its owning session
    * is still alive (oracle interpolation collects these frames right
    * after the same session constructed the query, which refreshed
    * the entry via [[get]]). */
  def peek(dir: String): Option[V] =
    Option(m.get(dir)).filterNot(_.session.sparkContext.isStopped)
      .map(_.value)
}
