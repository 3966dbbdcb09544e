package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the non-dominated set under
  * (minimize `costCol`, maximize `gainCol`): a row survives unless
  * some other row is no worse in both dimensions and strictly better
  * in one (Börzsönyi, Kossmann, Stocker, "The Skyline Operator", ICDE
  * 2001). The price/quality trade-off curve every "best value"
  * report draws. ([X] extension op over the reference's capability
  * envelope, `main.rs:3`.)
  *
  * NOT the naive quadratic NOT-EXISTS self-join: in 2-D the skyline
  * is a prefix-max scan — collapse to one row per distinct cost (its
  * max gain), then a cost group is on the frontier iff its max gain
  * strictly exceeds the running max over all strictly-cheaper groups.
  * O(n log n), and the one global scan is the [[PrefixSum]] two-phase
  * offset pattern with MAX instead of SUM (range-partition by cost +
  * a per-partition offset relation bounded by the partition count —
  * never a single-task global window over O(distinct costs) rows).
  *
  * Tie semantics (standard skyline): rows equal in BOTH dimensions
  * dominate neither each other nor anything more — all survive; a row
  * sharing its cost with a higher-gain row is dominated (strict in
  * gain); a row whose gain equals a strictly-cheaper row's gain is
  * dominated (strict in cost). Pure comparisons, no arithmetic — the
  * result is engine-exact on doubles.
  */
object Skyline {

  /** The frontier rows of `df` (all columns pass through).
    * `gainCol` must be INTEGRAL (it is compared as long — a
    * fractional gain would be silently truncated); `costCol` may be
    * any orderable type. */
  def frontier2d(df: DataFrame, costCol: String, gainCol: String): DataFrame = {
    val g = df
      .groupBy(col(costCol).as("__skCost"))
      .agg(max(col(gainCol).cast("long")).as("__skGmax"))
    // phase 1: the shared PrefixSum freeze — offset pass and scan
    // pass must read identical partition ids
    val parted = PrefixSum.frozenRangePartition(g, "__skPid",
      Seq(col("__skCost")))
    // phase 2: exclusive per-partition prefix max over the tiny
    // (one row per partition) offset relation
    val offW = Window.orderBy(col("__skPid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__skPid"))
      .agg(max(col("__skGmax")).as("__skPmax"))
      .withColumn("__skOff", max(col("__skPmax")).over(offW))
      .select(col("__skPid"), col("__skOff"))
    // phase 3: per-partition exclusive running max + the offset; the
    // strictly-cheaper contract holds because costs are UNIQUE after
    // the collapse (no within-cost peers to leak into the prefix)
    val inW = Window.partitionBy(col("__skPid")).orderBy(col("__skCost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = parted
      .join(broadcast(offsets), "__skPid")
      .withColumn("__skPrev",
        greatest(coalesce(max(col("__skGmax")).over(inW), lit(Long.MinValue)),
          coalesce(col("__skOff"), lit(Long.MinValue))))
      .filter(col("__skGmax") > col("__skPrev"))
      .select(col("__skCost"), col("__skGmax"))
    // a row is on the frontier iff its cost group survived AND it
    // carries the group's max gain (same-cost lower-gain rows are
    // dominated within the group)
    df.join(survivors,
      col(costCol) === col("__skCost") &&
        col(gainCol).cast("long") === col("__skGmax"),
      "left_semi")
  }

  /** DuckDB oracle twin — the plain single-window spelling (feasible
    * at test scale; the two-phase split is a plan property, not a
    * semantics change). `fromSql` must select `cost` and `gain`
    * (gain already integral). */
  def frontier2dSql(fromSql: String): String =
    s"""WITH pts AS ($fromSql),
       |g AS (SELECT cost, MAX(gain) AS gmax FROM pts GROUP BY 1),
       |r AS (
       |  SELECT cost, gmax,
       |    MAX(gmax) OVER (ORDER BY cost
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
       |  FROM g)
       |SELECT p.cost, p.gain
       |FROM pts p JOIN r ON p.cost = r.cost
       |WHERE p.gain = r.gmax AND (r.prev IS NULL OR r.gmax > r.prev)"""
      .stripMargin
}
