package graft.operators

import graft.functions.{HilbertIndex2, HilbertIndexN}
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

  /** General-d Hilbert index Column on the 2^bits grid — the
    * [[ZOrder.zvalueN]] twin for the locality-optimal curve (Skilling
    * transform, [[graft.functions.HilbertCore.axesToIndex]]): with it
    * the Y7 curve-decision harness can answer the layout question at
    * d ≥ 3, not just d = 2. Inputs must be masked/scaled into
    * [0, 2^bits) (the ZOrder contract); d·bits ≤ 63. */
  def hvalueN(coords: Seq[Column], bits: Int): Column =
    B.column(HilbertIndexN(coords.map(B.expression), bits))

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

  /** Recursive-CTE replay of
    * [[graft.functions.HilbertCore.axesToIndex]] for the DuckDB
    * oracle — general d. The inverse-undo loop is data (one state row
    * per input row per bit plane); the n SEQUENTIAL within-plane
    * sub-steps (X[0] evolves as i advances) unroll as a lateral-alias
    * chain INSIDE one recursive step — constant depth, so nothing
    * inlines exponentially. The closing SELECT does the Gray encode,
    * the t-fold in closed form (bit k of t = parity of the set bits of
    * the last transposed coordinate above position k), the final xor
    * and the plane-major interleave.
    *
    * `baseSql` must yield `rk` plus `x0..x{n-1}` (range-masked BIGINT
    * coordinates). Returns a complete `SELECT rk, h FROM ...`.
    */
  def hvalueNRecSql(baseSql: String, bits: Int, n: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(n >= 2 && n <= 8, s"n must be in [2,8], got $n")
    require(n * bits <= 63, s"$n dims x $bits bits overflow")
    val M = 1L << (bits - 1)
    val xsIn = (0 until n).map(i => s"x$i")
    // one recursive round: the n sequential sub-steps, a{i} = X[0]
    // after sub-step i, nx{i} = X[i] after its own sub-step
    val subSteps = {
      val sb = Seq.newBuilder[String]
      sb += s"CASE WHEN (x0 & q) > 0 THEN xor(x0, q - 1) ELSE x0 END AS a0"
      for (i <- 1 until n) {
        val prev = s"a${i - 1}"
        sb += s"""CASE WHEN (x$i & q) > 0 THEN xor($prev, q - 1)
                 |      ELSE xor($prev, xor($prev, x$i) & (q - 1)) END AS a$i""".stripMargin
        sb += s"""CASE WHEN (x$i & q) > 0 THEN x$i
                 |      ELSE xor(x$i, xor($prev, x$i) & (q - 1)) END AS nx$i""".stripMargin
      }
      sb.result().mkString(",\n    ")
    }
    val newXs = (s"a${n - 1} AS x0" +:
      (1 until n).map(i => s"nx$i AS x$i")).mkString(", ")
    // closing select: Gray encode g0..g{n-1}, closed-form t, final
    // f{i}, plane-major interleave
    val grays = (s"x0 AS g0" +:
      (1 until n).map(i => s"xor(x$i, g${i - 1}) AS g$i"))
      .mkString(",\n    ")
    val tExpr =
      if (bits == 1) "CAST(0 AS BIGINT)"
      else (0 until bits - 1).map(k =>
        s"((CAST(bit_count(g${n - 1} >> ${k + 1}) AS BIGINT) & 1) << $k)")
        .mkString("(", " | ", ")")
    val finals = (0 until n).map(i => s"xor(g$i, t) AS f$i")
      .mkString(",\n    ")
    val hExpr = (for (p <- 0 until bits; i <- 0 until n) yield
      s"(((f$i >> $p) & 1) << ${p * n + (n - 1 - i)})")
      .mkString("(", " | ", ")")
    s"""(WITH RECURSIVE hrecn AS (
       |  SELECT rk, ${xsIn.map(x => s"CAST($x AS BIGINT) AS $x")
        .mkString(", ")},
       |    CAST($M AS BIGINT) AS q
       |  FROM ($baseSql)
       |  UNION ALL
       |  SELECT rk, $newXs, q // 2 AS q FROM (
       |    SELECT rk, q,
       |    $subSteps
       |    FROM hrecn WHERE q > 1))
       |SELECT rk, $hExpr AS h FROM (
       |  SELECT rk,
       |    $grays,
       |    $tExpr AS t,
       |    $finals
       |  FROM hrecn WHERE q = 1))""".stripMargin
  }
}
