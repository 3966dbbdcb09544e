package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-horizon weighted shortest paths — the WEIGHTED min-plus
  * member of the iterative graph family ([[HopLevels]] with a cost per
  * edge instead of +1 per hop): after `rounds` synchronous
  * relaxations every node carries the exact minimum path COST from
  * the seed set over paths of ≤ `rounds` edges (bounded-horizon
  * Bellman–Ford — the same fixed-depth contract as every oracle-
  * checked recursion here; nodes beyond the horizon are absent).
  * ([X] extension op over the reference's envelope, `main.rs:3`.)
  *
  * DETERMINISTIC + oracle-checkable: integer edge costs make every
  * distance a pure min over integer path sums — no tie-break, no
  * float drift — and the fixed round count unrolls into an ANSI CTE
  * ([[distancesSql]]).
  *
  * Scale contract (100 TB): each round expands ONLY the nodes whose
  * distance improved in the previous round (the delta-frontier
  * optimization — expanding an unchanged node re-derives candidates
  * already folded in, so skipping it cannot change the fixpoint),
  * joined against the once-materialized symmetric edge relation and
  * folded with a map-combinable MIN. No O(nodes) broadcast, no
  * driver-side priority queue — Dijkstra's heap does not distribute;
  * synchronous relaxation does. Lineage truncates per round via
  * [[Checkpointing]] (reliable under `checkpointDir`, else local).
  */
object MinPlusPaths {

  /** Minimum path costs after `rounds` relaxations:
    * DataFrame[node: long, dist: long] — dist 0 = seed, absent =
    * unreached within `rounds` edges. Edges are treated as
    * UNDIRECTED (symmetrized); `cCol` must be a positive integer
    * cost column. */
  def distances(edges: DataFrame, aCol: String, bCol: String,
      cCol: String, isSeed: Column => Column, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val reliable = checkpointDir.isDefined
    Checkpointing.withTruncation(edges.sparkSession, checkpointDir) { ckpt =>
      def free(df: DataFrame): Unit = Checkpointing.free(df, reliable)
      val sym = ckpt(edges
        .select(col(aCol).cast("long").as("u"),
          col(bCol).cast("long").as("v"), col(cCol).cast("long").as("c"))
        .unionAll(edges.select(col(bCol).cast("long").as("u"),
          col(aCol).cast("long").as("v"), col(cCol).cast("long").as("c")))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v").agg(min("c").as("c")))

      val nodes = sym.select(col("u").as("node")).distinct()
      var dist = ckpt(nodes.filter(isSeed(col("node")))
        .select(col("node"), lit(0L).as("dist")))
      var frontier = dist
      for (_ <- 1 to rounds) {
        val expanded = sym
          .join(frontier.select(col("node").as("u"), col("dist")), "u")
          .select(col("v").as("node"), (col("dist") + col("c")).as("dist"))
        val folded = ckpt(dist.unionAll(expanded)
          .groupBy("node").agg(min(col("dist")).as("dist")))
        // delta frontier: nodes that improved (or appeared) this
        // round — materialized so the superseded dist (its only other
        // reader) can be freed; the frontier shrinks, so this is the
        // cheap side of the round
        val prevFrontier = frontier
        frontier = ckpt(folded
          .join(dist.select(col("node"), col("dist").as("prev")),
            Seq("node"), "left")
          .filter(col("prev").isNull || col("dist") < col("prev"))
          .select(col("node"), col("dist")))
        if (prevFrontier ne dist) free(prevFrontier)
        free(dist)
        dist = folded
      }
      free(frontier)
      free(sym)
      dist
    }
  }

  /** The identical bounded recursion as unrolled ANSI SQL — the
    * oracle twin (FULL relaxation per round; the delta frontier only
    * skips no-op expansions, so the results coincide). `edgesSql`
    * must select (u, v, c); `seedPred` is a predicate over `node`. */
  def distancesSql(edgesSql: String, seedPred: String, rounds: Int): String = {
    require(rounds >= 1)
    val steps = (1 to rounds).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT e.v AS node, f.dist + e.c AS dist
         |    FROM sym e JOIN $prev f ON e.u = f.node) t
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""sym AS (
       |  SELECT u, v, MIN(c) AS c FROM (
       |    SELECT u, v, c FROM ($edgesSql) e0
       |    UNION ALL
       |    SELECT v AS u, u AS v, c FROM ($edgesSql) e1) b
       |  WHERE u <> v GROUP BY 1, 2),
       |d0 AS (
       |  SELECT node, CAST(0 AS BIGINT) AS dist FROM
       |    (SELECT DISTINCT u AS node FROM sym) n WHERE $seedPred),
       |$steps
       |SELECT node, dist FROM d$rounds""".stripMargin
  }
}
