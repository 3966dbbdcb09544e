package graft.operators

import graft.functions.HilbertIndex2
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{Bridge => B}

/** d=2 Hilbert-curve layout key (Y6) — the locality-optimal
  * alternative to [[ZOrder]]: consecutive indices are always grid
  * neighbors, so a range probe's rectangle cuts strictly fewer cell
  * boundaries than under the Z interleave. Engine side is the
  * codegen'd [[graft.functions.HilbertIndex2]] expression; the oracle
  * side replays the identical bit descent as a generated
  * lateral-alias CHAIN (both DuckDB and Spark SQL resolve aliases
  * left-to-right inside one SELECT), so the two implementations share
  * no code — the driver compare is a real cross-check of the curve
  * arithmetic.
  */
object Hilbert {

  /** Hilbert index Column of (x, y) on the 2^bits square grid; inputs
    * must already be masked/scaled into range (the ZOrder contract). */
  def hvalue(x: Column, y: Column, bits: Int): Column =
    B.column(HilbertIndex2(B.expression(x), B.expression(y), bits))

  /** Recursive-CTE replay of [[graft.functions.HilbertCore.xy2d]] for
    * the DuckDB oracle (the part_rank / k-core MATERIALIZED-rounds
    * oracle pattern): the bit descent is data — one state row (rk, x,
    * y, d, s) per input row per bit plane, each round one relational
    * step, so nothing is inlined exponentially (a lateral-alias
    * spelling of the same chain explodes 4^bits under expression
    * inlining — measured fatal at bits=8).
    *
    * `baseSql` must yield columns `rk` (the row key to join results
    * back on), `hx`, `hy` (range-masked BIGINT coordinates). Returns a
    * complete `SELECT rk, h FROM ...` relation.
    */
  def hvalueRecSql(baseSql: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val top = 1L << (bits - 1)
    s"""(WITH RECURSIVE hrec AS (
       |  SELECT rk, CAST(hx AS BIGINT) AS x, CAST(hy AS BIGINT) AS y,
       |    CAST(0 AS BIGINT) AS d, CAST($top AS BIGINT) AS s
       |  FROM ($baseSql)
       |  UNION ALL
       |  SELECT rk,
       |    CASE WHEN (y & s) > 0 THEN x
       |      WHEN (x & s) > 0 THEN ((s - 1 - y) & (s - 1))
       |      ELSE y END,
       |    CASE WHEN (y & s) > 0 THEN y
       |      WHEN (x & s) > 0 THEN ((s - 1 - x) & (s - 1))
       |      ELSE x END,
       |    d + s * s * (CASE
       |      WHEN (x & s) = 0 AND (y & s) = 0 THEN 0
       |      WHEN (x & s) = 0 AND (y & s) > 0 THEN 1
       |      WHEN (x & s) > 0 AND (y & s) > 0 THEN 2
       |      ELSE 3 END),
       |    s // 2
       |  FROM hrec WHERE s > 0)
       |SELECT rk, d AS h FROM hrec WHERE s = 0)""".stripMargin
  }
}
