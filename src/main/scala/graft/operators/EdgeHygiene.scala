package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The iterative-graph family's input-hygiene contract in ONE place
  * (it previously lived copy-pasted in each operator): an input edge
  * list becomes the canonical symmetrized relation by
  *
  *  1. id-canonicalizing to (lo, hi) BEFORE distinct — an input
  *     carrying both (a,b) and (b,a) is one undirected edge, not a
  *     double-weight one;
  *  2. dropping self-loops;
  *  3. deduplicating;
  *  4. symmetrizing (one row per direction).
  *
  * [[KCore]], [[HopLevels]] and [[LabelPropagation]] consume the
  * DataFrame form; their oracle twins consume [[symSqlCte]], so a
  * hygiene change lands in engine and oracle together.
  * ([[Triangles]] keeps its own orientation-specific preparation —
  * it must NOT symmetrize.)
  */
object EdgeHygiene {

  /** Canonical symmetrized edges: DataFrame[u: long, v: long], one
    * row per direction. */
  def symmetrized(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
  }

  /** The identical hygiene as SQL CTE bodies (`und`, `sym`) over an
    * `edgesSql` selecting (u, v) — prepend inside a WITH clause. */
  def symSqlCte(edgesSql: String): String =
    s"""und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v
       |  FROM ($edgesSql) WHERE u <> v),
       |sym AS MATERIALIZED (
       |  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und)"""
      .stripMargin
}
