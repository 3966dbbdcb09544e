package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-source BFS hop levels — the min-plus member of the
  * iterative-graph family (components = min over labels, rank = sum
  * over mass, communities = mode over labels, k-core = degree
  * threshold, hop levels = MIN over distance+1): after `rounds`
  * synchronous frontier expansions every node reachable from the seed
  * set within `rounds` hops carries its exact hop distance. This is
  * the "link distance from trusted seeds" signal TrustRank
  * thresholds continuously ([[PageRank.ranksSeeded]]) discretized to
  * hops — the spam-farm distance filter and the reachability-radius
  * audit over link/co-occurrence graphs. ([X] extension op over the
  * reference's capability envelope, `main.rs:3`.)
  *
  * DETERMINISTIC + oracle-checkable: hop distance is a pure min over
  * integer path lengths — no tie-break needed — and the fixed round
  * count unrolls into an ANSI CTE ([[levelsSql]]). Nodes farther than
  * `rounds` hops (or disconnected) are absent, exactly the BFS-cut
  * contract.
  *
  * Scale contract (100 TB): each round joins the CURRENT FRONTIER
  * ONLY (level = round-1, shrinking O(frontier) relation) against the
  * once-materialized symmetrized edges, then folds with a
  * map-combinable MIN keyed by node. No O(nodes) broadcast, no
  * driver-side queue — the textbook Pregel BFS as two shuffles per
  * round. Lineage truncation per round via [[Checkpointing]]
  * (reliable under `checkpointDir`, else local).
  */
object HopLevels {

  /** Hop distances after `rounds` synchronous expansions:
    * DataFrame[node: long, level: int] — level 0 = seed, absent =
    * unreached within `rounds`. `isSeed` selects seeds from the
    * node-id column (applied to the long-cast node id).
    *
    * @param checkpointDir reliable lineage truncation when given;
    *                      results bitwise-identical either way. */
  def levels(edges: DataFrame, aCol: String, bCol: String,
      isSeed: Column => Column, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    Checkpointing.withTruncation(edges.sparkSession, checkpointDir) { ckpt =>
      val sym = ckpt(EdgeHygiene.symmetrized(edges, aCol, bCol))

      val nodes = sym.select(col("u").as("node")).distinct()
      var lv = ckpt(nodes.filter(isSeed(col("node")))
        .select(col("node"), lit(0).as("level")))
      for (i <- 1 to rounds) {
        val frontier = lv.filter(col("level") === (i - 1))
        val expanded = sym
          .join(frontier.select(col("node").as("u"), col("level")), "u")
          .select(col("v").as("node"), (col("level") + 1).as("level"))
        lv = ckpt(lv.unionAll(expanded)
          .groupBy("node")
          .agg(min(col("level")).as("level")))
      }
      lv
    }
  }

  /** The identical recursion as unrolled ANSI SQL — the oracle twin.
    * `edgesSql` must select (u, v); `seedPred` is a predicate over
    * `node`. Yields (node, level). */
  def levelsSql(edgesSql: String, seedPred: String, rounds: Int): String = {
    require(rounds >= 1)
    val steps = (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
         |  SELECT node, MIN(level) AS level FROM (
         |    SELECT node, level FROM $prev
         |    UNION ALL
         |    SELECT e.v AS node, f.level + 1 AS level
         |    FROM sym e JOIN $prev f ON e.u = f.node
         |    WHERE f.level = ${i - 1}) t
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${EdgeHygiene.symSqlCte(edgesSql)},
       |l0 AS (
       |  SELECT node, 0 AS level FROM
       |    (SELECT DISTINCT u AS node FROM sym) n WHERE $seedPred),
       |$steps
       |SELECT node, level FROM l$rounds""".stripMargin
  }
}
