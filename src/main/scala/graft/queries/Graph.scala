package graft.queries

import graft.Tables
import graft.operators.{HopLevels, KCore, LabelPropagation, PageRank, Triangles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics queries — the iterative-equi-shuffle family next to
  * ConnectedComponents ([X] extension ops; the reference has no graph
  * surface, `main.rs:3`). The rank arithmetic is integer-exact
  * ([[graft.operators.PageRank]]), so the DuckDB oracle replays every
  * round bit-for-bit from the same unrolled recursion. */
object Graph {

  /** Fixed round count — production web-rank style (no convergence
    * probe); ranks are within damping^3 ≈ 0.6 of fixpoint ordering,
    * which is ranking-stable on this graph and keeps the oracle CTE
    * depth bounded. */
  private val PrIterations = 3

  /** Fixed LPA round count — deterministic by construction (VERDICT
    * on classic LPA's random tie-breaks: not oracle-checkable). */
  private val LpaRounds = 3

  /** k-core threshold and synchronous peel rounds — KCoreSpec pins
    * that the peel converges within this depth at EVERY fixture sf
    * (one extra round changes nothing), so the fixed-round recursion
    * IS the true 3-core on the test graphs. Measured peel depths:
    * sf0.001 = 0, sf0.01 = 8, sf0.1 = 2 — 10 leaves headroom. */
  private val CoreK = 3L
  private val CoreRounds = 10

  /** BFS expansion rounds — the reachability horizon; nodes farther
    * than this from the seed set are reported unreached. */
  private val HopRounds = 3

  /** The support-thresholded co-purchase edge CTE shared by the
    * triangle and community oracles. */
  private val SupportedEdgesSql =
    """SELECT u, v FROM (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2) p WHERE w >= 2""".stripMargin

  /** Co-purchase edges: parts that appear in the same order, both
    * directions. The self-join key is l_orderkey — per-order fan is
    * bounded by lines-per-order (≤ 17 in the fixture, bounded small in
    * any order-lines schema), so the join is skew-safe by data
    * contract. */
  private val EdgesSql =
    """SELECT a.l_partkey AS src, b.l_partkey AS dst
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"""
      .stripMargin

  /** Canonical (u < v, w) co-purchase pair counts, MATERIALIZED once
    * per dir per JVM (`localCheckpoint`) — all three graph queries
    * (rank / triangles / communities) consume this same build, so a
    * Verify/Bench JVM pays the lineitem self-join + count shuffle
    * once (the curation-stages / cluster_stats caching pattern). */
  private val pairCache = new SessionCache[DataFrame]

  /** Per-dir prepared PageRank graphs (edges-with-outdeg, nodes) —
    * the one-time [[PageRank.prepare]] builds, cached like
    * [[pairCounts]] so repeated rankings re-read the materialized
    * graph instead of re-running hygiene + out-degree + node builds. */
  private val rankGraphCache = new SessionCache[(DataFrame, DataFrame)]
  private val trustGraphCache = new SessionCache[(DataFrame, DataFrame)]

  private def pairCounts(s: SparkSession, dir: String): DataFrame =
    pairCache.get(s, dir) { d =>
      import s.implicits._
      // restart-survivable (the ArtifactStore contract): the lineitem
      // self-join + count shuffle runs once per (dir, version) EVER,
      // not once per JVM — every later session reads the parquet
      graft.operators.ArtifactStore.getOrBuild(s, d,
        "copurchase_pairs", "v1") {
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey")
        li.as("a").join(li.as("b"), Seq("l_orderkey"))
          .filter($"a.l_partkey" < $"b.l_partkey")
          .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
          .agg(count(lit(1)).as("w"))
      }
      // hot path: the iterative consumers re-read this relation every
      // round — pin the (one-time) artifact read in executor memory
      .localCheckpoint()
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // L48: integer-exact PageRank over the part co-purchase graph —
    // the centrality weighting a curation pipeline applies to a link
    // graph (source authority) spelled on the fixture's natural graph.
    // Three rounds of edges⋈ranks equi-joins + map-combinable integer
    // sums; the edge relation (with out-degrees) is materialized once
    // PER DIR (PageRank.prepare under the pairCounts caching pattern —
    // the hygiene/out-degree/node builds are graph properties, not
    // per-ranking work, so repeated rankings of one graph re-read
    // them).
    "part_rank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val (e, nodes) = rankGraphCache.get(s, dir) { d =>
        val pairs = pairCounts(s, d)
        val edges = pairs.select($"u".as("src"), $"v".as("dst"))
          .unionAll(pairs.select($"v".as("src"), $"u".as("dst")))
        PageRank.prepare(edges, "src", "dst")
      }
      PageRank.ranksPrepared(e, nodes, PrIterations)
        .orderBy($"rank".desc, $"node")
        .limit(40)
        .select($"node".as("partkey"), $"rank")
    }),

    // L52: triangle enumeration over the SUPPORTED co-purchase graph
    // (pairs bought together in >= 2 orders — the support threshold is
    // what separates signal edges from one-off basket noise, and it is
    // a plain HAVING on the map-combinable pair count). Triangles =
    // "cliques of 3 frequently-co-bought parts", the cohesion motif
    // behind bundle/community detection. The operator orients edges by
    // (degree, id) rank so every triangle is found exactly once at its
    // lowest-rank vertex and a hub's wedge fan-out is bounded by its
    // OUT-degree (Suri-Vassilvitskii) — the oracle replays the naive
    // id-ordered 3-way join, feasible only because the thresholded
    // test graph is small (which is the point of the orientation).
    "copurchase_triangles" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Triangles.triangles(pairCounts(s, dir).filter($"w" >= 2), "u", "v")
        .orderBy($"n1", $"n2", $"n3")
    }),

    // L57: weighted seed-personalized rank (TrustRank) — teleport
    // mass returns only to the trusted seed set (part ids ≡ 0 mod
    // 97), and co-purchase multiplicities weight the walk, so rank
    // measures WEIGHTED PROXIMITY TO TRUST rather than global
    // centrality — the production form of source-authority weighting
    // (seed = editorially trusted domains). Same integer-exact
    // recursion, same shared pair cache; the two driver scalars
    // (node/seed counts) are the only collected values.
    "part_trustrank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val (e, nodes) = trustGraphCache.get(s, dir) { d =>
        val pairs = pairCounts(s, d)
        val edges = pairs.select($"u".as("src"), $"v".as("dst"), $"w")
          .unionAll(pairs.select($"v".as("src"), $"u".as("dst"), $"w"))
        PageRank.prepareSeeded(edges, "src", "dst", "w", n => n % 97 === 0)
      }
      PageRank.ranksSeededPrepared(e, nodes, PrIterations)
        .orderBy($"rank".desc, $"node")
        .limit(40)
        .select($"node".as("partkey"), $"rank")
    }),

    // L56: community detection on the supported co-purchase graph —
    // the mode-aggregation member of the iterative-graph family
    // (components = min, rank = sum, communities = neighbor-label
    // mode). Three deterministic synchronous LPA rounds, smallest-
    // label tie-break; output is the community profile (size + id
    // range per label, communities of >= 2 parts) so the result stays
    // compact and order-stable at any sf.
    "part_communities" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      LabelPropagation
        .communities(pairCounts(s, dir).filter($"w" >= 2), "u", "v", LpaRounds)
        .groupBy($"label")
        .agg(count(lit(1)).as("n_parts"),
          min($"node").as("min_part"), max($"node").as("max_part"))
        .filter($"n_parts" >= 2)
        .orderBy($"label")
    }),

    // L68: k-core of the supported co-purchase graph — the robustness
    // pre-filter (a node survives only while >= k of its co-purchase
    // partners also survive; one-off hub spokes peel away). Output =
    // surviving parts with their in-core degree. Fixed synchronous
    // peel depth; KCoreSpec pins the fixture converges inside it, so
    // this IS the true 3-core here.
    "part_kcore" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      KCore.core(pairCounts(s, dir).filter($"w" >= 2), "u", "v",
          CoreK, CoreRounds)
        .orderBy($"node")
        .select($"node".as("partkey"), $"degree")
    }),

    // L69: BFS hop levels from the trusted seed set (part ids ≡ 0 mod
    // 97 — the TrustRank seed idiom) over the supported co-purchase
    // graph: the discrete "link distance from trust" signal, reported
    // as the per-level reachability profile (count + id range) so the
    // result stays compact and order-stable at any sf.
    "part_hops" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      HopLevels.levels(pairCounts(s, dir).filter($"w" >= 2), "u", "v",
          n => n % 97 === 0, HopRounds)
        .groupBy($"level")
        .agg(count(lit(1)).as("n_nodes"),
          min($"node").as("min_part"), max($"node").as("max_part"))
        .orderBy($"level")
    }),

    // L87: hierarchy rollup via aggregate-lattice reuse — the
    // BOM/org-chart/geo-drilldown aggregation class over the
    // fixture's radix hierarchy (ancestor at level k = partkey DIV
    // 10^k: 2000 leaves → 200 → 20 → 2 → 1 node, depth 4). The point
    // is the LATTICE: level k+1 re-aggregates level k's PARTIALS —
    // each step shuffles the previous level's node count (2000 → 200
    // → 20 → …), never the fact table; the naive spelling rescans
    // the leaves once per level, 4× the input at 100 TB. Exact
    // integer value lane; (node, level) is the identity (an id can
    // appear at several levels of a radix tree).
    "hierarchy_rollup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val leaves = Tables.part(s, dir)
        .select($"p_partkey".as("node"),
          floor($"p_retailprice" * lit(10000.0) + lit(0.5)).cast("long")
            .as("v_micro"))
      var cur = leaves
      var acc: DataFrame = null
      for (lvl <- 1 to 4) {
        cur = cur
          .select(expr("node DIV 10").as("node"), $"v_micro")
          .groupBy($"node").agg(sum($"v_micro").as("v_micro"))
        val tagged = cur.withColumn("level", lit(lvl).cast("long"))
        acc = if (acc == null) tagged else acc.unionByName(tagged)
      }
      acc.select($"node", $"level",
          ($"v_micro".cast("double") / lit(10000.0)).as("subtree_value"))
        .orderBy($"level", $"node")
    }),

    // L85: bounded-horizon weighted shortest paths — HopLevels'
    // weighted sibling: cost = ⌈1000 / w⌉ per supported co-purchase
    // edge (strong ties are cheap to traverse), exact min path cost
    // from the trusted seeds over ≤ 3 edges. A cheaper 2-edge path
    // through strong ties beats a direct weak tie — the signal hop
    // counting cannot express. Integer costs end to end.
    "part_shortest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val e = pairCounts(s, dir).filter($"w" >= 2)
        .select($"u", $"v", expr("(1000 + w - 1) DIV w").as("c"))
      graft.operators.MinPlusPaths.distances(e, "u", "v", "c",
          n => n % 97 === 0, HopRounds)
        .orderBy($"node")
        .select($"node".as("partkey"), $"dist")
    }),

    // L82: strongly connected components of the DIRECTED regional
    // trade graph — supplier → customer when goods ship (≥ 2 lines),
    // customer → supplier when goods come back (a return line), both
    // restricted to same-region pairs: an SCC is a mutual trade loop.
    // The directed sibling of neardup_clusters' undirected closure —
    // forward/backward min-label coloring with pointer jumping
    // (operators.Scc), labels = exact min member id, oracle = the
    // recursive-CTE transitive closure intersected both ways. Five
    // nontrivial SCCs (one per region) + singleton stragglers at
    // every fixture sf, so the peel rounds do real work.
    "trade_scc" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      sccLabels(s, dir)
        .groupBy($"scc")
        .agg(count(lit(1)).as("n_nodes"),
          sum(when($"node" % 2 === 0, 1L).otherwise(0L)).as("n_suppliers"),
          sum(when($"node" % 2 === 1, 1L).otherwise(0L)).as("n_customers"),
          min($"node").as("min_node"), max($"node").as("max_node"))
        .filter($"n_nodes" >= 2)
        .orderBy($"scc")
    }),

    // L82 node-level: the full (node, scc) labeling — the per-row
    // twin that makes the group row above hash-checkable end to end.
    "trade_scc_nodes" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      sccLabels(s, dir).orderBy($"node")
    }),

    // L82 downstream: the CONDENSATION DAG — inter-SCC trade edges
    // (which mutual-trade loops feed which), the relation a scheduler
    // topo-sorts and an exposure audit walks. This is the second
    // consumer of the persisted SCC labeling artifact: the FW-BW loop
    // ran once (ArtifactStore `trade_scc_labels`, build-once pinned in
    // ArtifactStoreSpec); this row is two broadcast-scale label joins
    // over the one-pass edge relation — no iteration anywhere. Oracle
    // shares the recursive-CTE labeling and regroups the edges.
    "trade_scc_condensed" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val lab = sccLabels(s, dir)
      tradeEdgesCached(s, dir)
        .join(lab.select($"node".as("src"), $"scc".as("scc_src")), "src")
        .join(lab.select($"node".as("dst"), $"scc".as("scc_dst")), "dst")
        .filter($"scc_src" =!= $"scc_dst")
        .groupBy($"scc_src", $"scc_dst")
        .agg(count(lit(1)).as("n_edges"))
        .orderBy($"scc_src", $"scc_dst")
    }),
  )

  /** Directed trade edges: supplier → customer for shipped volume
    * (≥ 2 non-return lines), customer → supplier for returns, both
    * same-region only. Node ids interleave the two key spaces
    * disjointly — supplier = 2·s_suppkey, customer = 2·o_custkey + 1 —
    * so no key magnitude can ever collide the spaces (an additive
    * offset would silently merge distinct nodes once suppkeys reach
    * it; at TPC-H sf ≥ 1 suppkeys pass 10 000). lineitem ⋈
    * orders ⋈ customer merge-pinned (all huge at 100 TB); supplier +
    * both nation lookups broadcast. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sn = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_regionkey".as("s_region"))
    val cn = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_regionkey".as("c_region"))
    val pairs = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
        .hint("merge"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sn), $"l_suppkey" === $"s_suppkey")
      .join(cn.hint("merge"), $"o_custkey" === $"c_custkey")
      .filter($"s_region" === $"c_region")
      .groupBy($"l_suppkey", $"o_custkey",
        ($"l_returnflag" === "R").as("ret"))
      .agg(count(lit(1)).as("w"))
    pairs.filter(!$"ret" && $"w" >= 2)
      .select(($"l_suppkey" * 2L).as("src"),
        ($"o_custkey" * 2L + 1L).as("dst"))
      .unionAll(pairs.filter($"ret" && $"w" >= 1)
        .select(($"o_custkey" * 2L + 1L).as("src"),
          ($"l_suppkey" * 2L).as("dst")))
  }

  /** Per-dir SCC labeling, computed once per JVM (the pairCounts
    * caching pattern — the iterative peel must not re-run per
    * bench pass or per query sharing it). */
  private val sccCache = new SessionCache[DataFrame]

  /** Per-dir materialized trade-edge relation (the pairCounts pattern
    * for the DIRECTED graph): the lineitem⋈orders⋈customer derivation
    * is the graph's build — consumers (the condensation row, SCC-seeded
    * audits) re-read it instead of re-running the three-table join. */
  private val tradeEdgeCache = new SessionCache[DataFrame]

  private def tradeEdgesCached(s: SparkSession, dir: String): DataFrame =
    tradeEdgeCache.get(s, dir)(d => tradeEdges(s, d).localCheckpoint())

  private def sccLabels(s: SparkSession, dir: String): DataFrame =
    sccCache.get(s, dir)(d =>
      // persisted ArtifactStore layout (the semdedup_components
      // pattern): the FW-BW loop runs once per corpus version, and
      // every downstream consumer — the group row, the node row, the
      // condensation DAG, SCC-seeded audits — reads the labeling at
      // rest instead of re-running the iteration
      graft.operators.ArtifactStore.getOrBuild(s, d,
        "trade_scc_labels", "v1")(
        graft.operators.Scc.components(tradeEdges(s, d), "src", "dst")))

  /** The recursive-CTE SCC labeling shared by both trade_scc oracles:
    * transitive closure along edges, intersected with its reverse —
    * scc(v) = min u with u→*v and v→*u (u including v). */
  private val SccLabelSql =
    """pairs AS (
      |  SELECT l_suppkey AS s, o_custkey AS c,
      |         l_returnflag = 'R' AS ret, COUNT(*) AS w
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  WHERE sn.n_regionkey = cn.n_regionkey
      |  GROUP BY 1, 2, 3),
      |edges AS (
      |  SELECT 2 * s AS src, 2 * c + 1 AS dst FROM pairs
      |  WHERE NOT ret AND w >= 2
      |  UNION ALL
      |  SELECT 2 * c + 1 AS src, 2 * s AS dst FROM pairs
      |  WHERE ret AND w >= 1),
      |nodes AS (SELECT DISTINCT src AS node FROM edges
      |          UNION SELECT DISTINCT dst FROM edges),
      |r(a, b) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src),
      |rs AS (SELECT a, b FROM r UNION SELECT node, node FROM nodes),
      |lab AS (
      |  SELECT v.node, MIN(f.a) AS scc FROM nodes v
      |  JOIN rs f ON f.b = v.node
      |  JOIN rs g ON g.a = v.node AND g.b = f.a
      |  GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    // independent spelling: each level grouped DIRECTLY from the
    // leaves (no lattice reuse) — verifies the partial re-aggregation
    "hierarchy_rollup" -> {
      val level = (k: Int) => {
        val div = math.pow(10, k).toLong
        s"""SELECT p_partkey // $div AS node, CAST($k AS BIGINT) AS level,
           |  CAST(SUM(CAST(FLOOR(p_retailprice * 10000.0 + 0.5)
           |    AS BIGINT)) AS DOUBLE) / 10000.0 AS subtree_value
           |FROM part GROUP BY 1""".stripMargin
      }
      s"""${(1 to 4).map(level).mkString("\nUNION ALL\n")}
         |ORDER BY level, node""".stripMargin
    },

    "part_shortest" -> {
      val weighted =
        """SELECT u, v, (1000 + w - 1) // w AS c FROM (
          |  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2) p WHERE w >= 2""".stripMargin
      s"""WITH sp AS (
         |WITH ${graft.operators.MinPlusPaths.distancesSql(weighted,
            "node % 97 = 0", HopRounds)})
         |SELECT node AS partkey, dist FROM sp ORDER BY partkey""".stripMargin
    },

    "trade_scc" ->
      s"""WITH RECURSIVE $SccLabelSql
         |SELECT scc, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_suppliers,
         |  CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_customers,
         |  MIN(node) AS min_node, MAX(node) AS max_node
         |FROM lab GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY scc""".stripMargin,

    "trade_scc_nodes" ->
      s"""WITH RECURSIVE $SccLabelSql
         |SELECT node, scc FROM lab ORDER BY node""".stripMargin,

    // the condensation: shared labeling CTE, edges regrouped by the
    // endpoint SCCs
    "trade_scc_condensed" ->
      s"""WITH RECURSIVE $SccLabelSql
         |SELECT la.scc AS scc_src, lb.scc AS scc_dst,
         |  CAST(COUNT(*) AS BIGINT) AS n_edges
         |FROM edges e
         |JOIN lab la ON la.node = e.src
         |JOIN lab lb ON lb.node = e.dst
         |WHERE la.scc <> lb.scc
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "part_rank" ->
      s"""WITH pr AS (${PageRank.ranksSql(EdgesSql, PrIterations)})
         |SELECT node AS partkey, rank FROM pr
         |ORDER BY rank DESC, node LIMIT 40""".stripMargin,

    // naive id-ordered 3-way join over the same supported edge list —
    // u < v < w triples enumerate each triangle exactly once
    "copurchase_triangles" ->
      """WITH p AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |e AS (SELECT u, v FROM p WHERE w >= 2)
        |SELECT a.u AS n1, a.v AS n2, b.v AS n3
        |FROM e a JOIN e b ON a.v = b.u
        |         JOIN e c ON c.u = a.u AND c.v = b.v
        |ORDER BY 1, 2, 3""".stripMargin,

    "part_trustrank" -> {
      val weightedEdges =
        """SELECT u AS src, v AS dst, w FROM (
          |  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2) p
          |UNION ALL
          |SELECT v AS src, u AS dst, w FROM (
          |  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2) p""".stripMargin
      s"""WITH tr AS (
         |${PageRank.ranksSeededSql(weightedEdges, "node % 97 = 0",
            PrIterations)})
         |SELECT node AS partkey, rank FROM tr
         |ORDER BY rank DESC, node LIMIT 40""".stripMargin
    },

    "part_communities" ->
      s"""WITH lpa AS (
         |${LabelPropagation.communitiesSql(SupportedEdgesSql, LpaRounds)}),
         |g AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_parts,
         |    MIN(node) AS min_part, MAX(node) AS max_part
         |  FROM lpa GROUP BY 1)
         |SELECT label, n_parts, min_part, max_part FROM g
         |WHERE n_parts >= 2 ORDER BY label""".stripMargin,

    "part_kcore" ->
      s"""WITH core AS (${KCore.coreSql(SupportedEdgesSql, CoreK, CoreRounds)})
         |SELECT node AS partkey, degree FROM core ORDER BY partkey""".stripMargin,

    "part_hops" ->
      s"""WITH lv AS (
         |${HopLevels.levelsSql(SupportedEdgesSql, "node % 97 = 0", HopRounds)})
         |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  MIN(node) AS min_part, MAX(node) AS max_part
         |FROM lv GROUP BY 1 ORDER BY level""".stripMargin,
  )
}
