package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the degeneracy member of the iterative-graph
  * family: ConnectedComponents closes reachability (min-aggregation),
  * PageRank spreads mass (sum-aggregation), LabelPropagation finds
  * dense regions (mode-aggregation), k-core finds ROBUST regions
  * (threshold-filter aggregation): repeatedly delete every node of
  * degree < k until none remains (Seidman, "Network structure and
  * minimum degree", Social Networks 1983). The surviving subgraph is
  * the k-core — the standard spam/bot-farm and dense-community
  * pre-filter over link and co-occurrence graphs. ([X] extension op
  * over the reference's capability envelope, `main.rs:3` — it has no
  * graph surface.)
  *
  * DETERMINISTIC + oracle-checkable: a FIXED number of synchronous
  * peel rounds (every under-degree node removed simultaneously each
  * round), so the whole recursion unrolls into an ANSI CTE
  * ([[coreSql]]). Peeling is monotone — once the node set is stable
  * one extra round changes nothing — so callers pick `rounds` ≥ the
  * graph's peel depth and a spec asserts the fixture converges
  * (KCoreSpec); at unknown depth, run again with more rounds and
  * compare counts (the production convergence probe, outside the
  * oracle surface).
  *
  * Scale contract (100 TB): each round is one map-combinable degree
  * count keyed by node plus two semi-joins (edges ⋉ survivors on each
  * endpoint) — standard shuffles on node keys; no O(nodes) broadcast,
  * no driver-side graph. The symmetrized edge relation is materialized
  * once per round via the shared [[Checkpointing]] plumbing (reliable
  * `checkpoint()` under `checkpointDir` for cluster fault tolerance,
  * else `localCheckpoint()`), keeping lineage O(1) per round.
  */
object KCore {

  /** Nodes surviving `rounds` synchronous peel rounds at threshold
    * `k`, with their degree inside the surviving subgraph:
    * DataFrame[node: long, degree: long]. Input hygiene matches the
    * family: id-canonical undirected edges, self-loops and duplicates
    * dropped.
    *
    * @param checkpointDir reliable lineage truncation when given (see
    *                      [[Checkpointing.withTruncation]]); results
    *                      are bitwise-identical either way. */
  def core(edges: DataFrame, aCol: String, bCol: String, k: Long,
      rounds: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1L, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    Checkpointing.withTruncation(edges.sparkSession, checkpointDir) { ckpt =>
      var sym = ckpt(EdgeHygiene.symmetrized(edges, aCol, bCol))

      def degrees(e: DataFrame): DataFrame =
        e.groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))

      for (i <- 1 to rounds) {
        val keep = degrees(sym).filter(col("degree") >= k).select("node")
        val restricted = sym
          .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .select("u", "v")
        // truncate lineage between rounds; the FINAL round stays lazy
        // (bounded plan: one degree agg + two semi-joins) so the
        // output's physical plan is inspectable and one
        // materialization is saved
        sym = if (i < rounds) ckpt(restricted) else restricted
      }
      // the final degree count doubles as the membership test: a node
      // that survived every peel but fell under k in the LAST round's
      // restriction is dropped here (same as one more round's removal
      // set — the fixpoint spec pins the two views agree when
      // converged)
      degrees(sym).filter(col("degree") >= k)
    }
  }

  /** The identical recursion as unrolled ANSI SQL — the oracle twin.
    * `edgesSql` must select (u, v); hygiene replays inside. Yields
    * (node, degree). */
  def coreSql(edgesSql: String, k: Long, rounds: Int): String = {
    require(k >= 1L && rounds >= 1)
    // MATERIALIZED is load-bearing: each round references the
    // previous THREE times (the edge scan + both endpoint semi
    // filters), so an inlining planner would expand e_rounds into
    // 3^rounds base scans — at depth 10 that exhausts file handles
    // before it exhausts patience
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "sym" else s"e${i - 1}"
      s"""k$i AS MATERIALIZED (
         |  SELECT u AS node FROM $prev GROUP BY 1 HAVING COUNT(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM $prev e
         |  JOIN k$i a ON e.u = a.node
         |  JOIN k$i b ON e.v = b.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${EdgeHygiene.symSqlCte(edgesSql)},
       |$steps
       |SELECT u AS node, COUNT(*) AS degree FROM e$rounds
       |GROUP BY 1 HAVING COUNT(*) >= $k""".stripMargin
  }
}
