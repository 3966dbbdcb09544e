package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the graph-centrality
  * operator a curation pipeline uses to weight sources by link
  * authority (web-graph quality weighting for pretraining corpora) or
  * to rank entities in a co-occurrence graph. An [X]-extension op (the
  * reference's envelope, `main.rs:3`, has no graph surface); same
  * iterative-equi-shuffle regime as
  * [[graft.operators.ConnectedComponents]].
  *
  * INTEGER-EXACT variant: ranks are maintained as integer micro-units
  * (`scale` = one unit of mass) and every step is integer arithmetic —
  * `contrib = rank DIV outdeg`, `rank' = ((den-num)*scale) DIV den +
  * (num * Σcontrib) DIV den` — so the result is bitwise reproducible
  * across engines, partitionings, and retries (no double-sum order
  * dependence), and an independent SQL engine can replay it exactly
  * ([[ranksSql]]). The DIV truncation loses at most `outdeg` micro-units
  * per node per round — with scale = 1e6 that is a relative error of
  * ~1e-6·outdeg, far below any ranking-relevant difference.
  *
  * Semantics (documented, deterministic):
  *   - the graph is the DISTINCT directed edge set, self-loops dropped;
  *   - nodes = every id appearing as src or dst;
  *   - ranks start at `scale` per node (total mass n·scale);
  *   - dangling nodes (no out-edges) leak their damped mass — the
  *     classic "PageRank with leak" formulation. Redistribution would
  *     need an O(1) driver scalar per round; leak keeps every round a
  *     pure two-equi-join dataflow and is the standard choice for
  *     ranking (only the normalization differs).
  *
  * Scale contract (100 TB): each of the fixed `iterations` rounds is
  * one equi-join of edges⋈ranks on src (the out-degree column rides
  * the materialized edge relation — it never rejoins) followed by one
  * map-side-combinable integer sum keyed by dst — no broadcast of
  * anything O(nodes), no driver-side graph, no convergence probe (the
  * round count is a parameter, as in production web-rank jobs). The
  * edge relation (+outdeg) is materialized ONCE — reliably checkpointed
  * when `checkpointDir` is given (cluster fault tolerance), else
  * `localCheckpoint` — so an expensive upstream edge generator (e.g. a
  * self-join) never re-runs across rounds, and lineage stays O(1) per
  * round.
  * Long-overflow headroom: `num · n · scale` must stay under 2^63 —
  * at web scale (n = 1e10) use scale = 1e4 (documented knob), which
  * still separates ranks to 1e-4 of a unit.
  */
object PageRank extends Logging {

  /** Final ranks after `iterations` rounds: DataFrame[node: long,
    * rank: long] (rank in micro-units of `scale`).
    *
    * @param edges      one row per directed edge (duplicates and
    *                   self-loops are dropped)
    * @param srcCol     source-node column (castable to long)
    * @param dstCol     destination-node column
    * @param iterations fixed round count (production web-rank style);
    *                   ranks are within ~damping^k of the fixpoint
    * @param scale      integer mass per node at start — the
    *                   reproducibility/overflow knob
    * @param dampNum    damping numerator (default 85)
    * @param dampDen    damping denominator (default 100: d = 0.85)
    * @param checkpointDir when given, materializations use reliable
    *                   `checkpoint()` into this directory
    *                   (fault-tolerant at cluster scale — an executor
    *                   loss re-reads files instead of killing the
    *                   job); when absent, `localCheckpoint()`
    *                   (executor-memory, faster). Bitwise-identical
    *                   results either way (integer arithmetic; see
    *                   PageRankSpec).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointDir: Option[String] = None): DataFrame = {
    val (e, nodes) = prepare(edges, srcCol, dstCol, checkpointDir)
    ranksPrepared(e, nodes, iterations, scale, dampNum, dampDen)
  }

  /** The one-time half of [[ranks]]: edge hygiene (distinct, self-loop
    * drop), out-degree attachment, node derivation — each materialized
    * (checkpoint) so the iteration re-reads, never re-runs, the
    * upstream generator. Split out so a caller that ranks the SAME
    * graph repeatedly (a bench pass, a what-if damping sweep) pays the
    * build once and hands the prepared pair to [[ranksPrepared]];
    * `ranks` == `prepare` + `ranksPrepared` by construction. */
  def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      checkpointDir: Option[String] = None): (DataFrame, DataFrame) =
    Checkpointing.withTruncation(edges.sparkSession, checkpointDir) { ckpt =>

    // Distinct edge set with per-src out-degree attached ONCE —
    // materialized so iterations re-read, never re-run the upstream
    // generator (the ConnectedComponents pattern; a co-occurrence
    // edge generator is typically a self-join).
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // Checkpointed PRE-PARTITIONED on src: `checkpoint` preserves the
    // child plan's output partitioning, so every round's edges⋈ranks
    // join finds the big side already clustered on the join key and
    // shuffles only the O(nodes) rank relation — the per-round data
    // movement is ranks out (hash by src) and contributions back
    // (hash by dst), never the edge set.
    val e = ckpt(e0
      .join(e0.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")))

    // Also materialized once: every round's left join re-reads the
    // node set, and without the checkpoint each reference would
    // recompute the O(edges) union+distinct (measured ~40% of the
    // query at sf0.1). O(nodes) storage — tiny next to the edges.
    val nodes = ckpt(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct())
    (e, nodes)
    }

  /** The iteration half of [[ranks]] over a [[prepare]]d graph. */
  def ranksPrepared(e: DataFrame, nodes: DataFrame,
      iterations: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    require(dampNum >= 0L && dampNum <= dampDen && dampDen >= 1L,
      s"damping $dampNum/$dampDen is not in [0,1]")
    val base = ((dampDen - dampNum) * scale) / dampDen // Scala long div
    var r = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(r.select(col("node").as("src"), col("rank").as("src_rank")),
          "src")
        .select(col("dst").as("node"),
          expr("src_rank DIV outdeg").as("contrib"))
        .groupBy("node")
        .agg(sum(col("contrib")).as("c"))
      r = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampNum * COALESCE(c, 0L)) DIV $dampDen")).as("rank"))
    }
    r
  }

  /** Weighted, seed-personalized variant — TrustRank (Gyöngyi,
    * Garcia-Molina, Pedersen, "Combating Web Spam with TrustRank",
    * VLDB'04): teleport mass returns ONLY to the `seed` nodes, so
    * rank measures proximity to a trusted set rather than global
    * centrality — the production form of source-authority weighting
    * for corpus curation (seeds = editorially trusted domains). Edge
    * weights (multiplicities) steer the walk: `contrib = (rank · w)
    * DIV strength(u)`, strength = Σ out-weights. Same integer-exact,
    * unrolled-oracle contract as [[ranks]]; duplicate (src, dst) rows
    * SUM their weights. Overflow headroom: num · n · scale · w_max
    * must stay under 2^63 — size `scale` accordingly.
    *
    * Base mass: every node starts at `scale`; each round, seeds get
    * the whole teleport budget `((den-num) · scale · n) DIV den DIV
    * |seeds|` (mass n·scale redistributes over the seed set — the
    * dangling/non-seed leak is the standard formulation), plus the
    * damped weighted in-flow.
    *
    * @param seedPred  deterministic membership predicate on the node
    *                  id column (evaluated on the derived node set)
    */
  def ranksSeeded(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seedPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      iterations: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointDir: Option[String] = None): DataFrame = {
    val (e, nodes) =
      prepareSeeded(edges, srcCol, dstCol, wCol, seedPred, checkpointDir)
    ranksSeededPrepared(e, nodes, iterations, scale, dampNum, dampDen)
  }

  /** The one-time half of [[ranksSeeded]] (the [[prepare]] twin):
    * weight-summed edge relation with per-src strength attached, and
    * the node set with seed membership — both materialized. */
  def prepareSeeded(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seedPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      checkpointDir: Option[String] = None): (DataFrame, DataFrame) =
    Checkpointing.withTruncation(edges.sparkSession, checkpointDir) { ckpt =>

    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .filter(col("src") =!= col("dst") && col("w") > 0L)
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val e = ckpt(e0
      .join(e0.groupBy("src").agg(sum(col("w")).as("strength")), "src")
      .repartition(col("src")))
    val nodes = ckpt(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .withColumn("is_seed", seedPred(col("node"))))
    (e, nodes)
    }

  /** The iteration half of [[ranksSeeded]] over a [[prepareSeeded]]d
    * graph. */
  def ranksSeededPrepared(e: DataFrame, nodes: DataFrame,
      iterations: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && scale >= 1L &&
      dampNum >= 0L && dampNum <= dampDen && dampDen >= 1L,
      s"bad parameters ($iterations, $scale, $dampNum/$dampDen)")
    // teleport budget per seed, fixed integers computed once
    val Row(nNodes: Long, nSeeds: Long) = nodes
      .agg(count(lit(1)), sum(col("is_seed").cast("long"))).head()
    require(nSeeds > 0L, "seed predicate selected no nodes")
    val seedBase = (((dampDen - dampNum) * scale * nNodes) / dampDen) / nSeeds

    var r = nodes.select(col("node"), col("is_seed"), lit(scale).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(r.select(col("node").as("src"), col("rank").as("src_rank")),
          "src")
        .select(col("dst").as("node"),
          expr("(src_rank * w) DIV strength").as("contrib"))
        .groupBy("node")
        .agg(sum(col("contrib")).as("c"))
      r = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(seedBase)).otherwise(lit(0L)) +
            expr(s"($dampNum * COALESCE(c, 0L)) DIV $dampDen")).as("rank"))
    }
    r.select("node", "rank")
  }

  /** Oracle twin of [[ranksSeeded]]: `edgesSql` selects (src, dst, w);
    * `seedSql` is a boolean SQL predicate over a column named `node`.
    * The seed count and teleport budget are replayed inside. */
  def ranksSeededSql(edgesSql: String, seedSql: String, iterations: Int,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): String = {
    require(iterations >= 1)
    val rounds = (1 to iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT n.node,
         |    (CASE WHEN n.is_seed THEN sb.seed_base ELSE 0 END)
         |      + ($dampNum * COALESCE(c.c, 0)) // $dampDen AS rank
         |  FROM nodes n CROSS JOIN sb LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM((r.rank * e.w) // e.strength) AS BIGINT) AS c
         |    FROM e JOIN $prev r ON e.src = r.node
         |    GROUP BY 1) c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
       |  FROM ($edgesSql) WHERE src <> dst AND w > 0 GROUP BY 1, 2),
       |e AS (
       |  SELECT e0.src, e0.dst, e0.w, s.strength
       |  FROM e0 JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS strength
       |                FROM e0 GROUP BY 1) s ON e0.src = s.src),
       |nodes AS (
       |  SELECT node, ($seedSql) AS is_seed FROM
       |    (SELECT src AS node FROM e0 UNION SELECT dst FROM e0) n),
       |sb AS (
       |  SELECT ((($dampDen - $dampNum) * $scale *
       |      (SELECT COUNT(*) FROM nodes)) // $dampDen)
       |    // (SELECT CAST(SUM(CAST(is_seed AS INT)) AS BIGINT)
       |        FROM nodes) AS seed_base),
       |r0 AS (SELECT node, is_seed, CAST($scale AS BIGINT) AS rank
       |       FROM nodes),
       |$rounds
       |SELECT node, rank FROM r$iterations""".stripMargin
  }

  /** The identical computation as unrolled ANSI SQL (DuckDB-ready) —
    * the oracle twin of [[ranks]]. `edgesSql` must select columns
    * (src, dst); duplicate/self-loop hygiene and all rank arithmetic
    * are replayed inside. Returns a query yielding (node, rank).
    * DuckDB's `//` floor-division matches Spark's `DIV` truncation on
    * the all-nonnegative values that occur here; sums are cast back to
    * BIGINT (DuckDB widens SUM(BIGINT) to HUGEINT). */
  def ranksSql(edgesSql: String, iterations: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): String = {
    require(iterations >= 1)
    val base = ((dampDen - dampNum) * scale) / dampDen
    val rounds = (1 to iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT n.node,
         |    $base + ($dampNum * COALESCE(c.c, 0)) // $dampDen AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM(r.rank // e.outdeg) AS BIGINT) AS c
         |    FROM e JOIN $prev r ON e.src = r.node
         |    GROUP BY 1) c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT src, dst FROM ($edgesSql) WHERE src <> dst),
       |e AS (
       |  SELECT e0.src, e0.dst, d.outdeg
       |  FROM e0 JOIN (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
       |                FROM e0 GROUP BY 1) d ON e0.src = d.src),
       |nodes AS (
       |  SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
       |r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT node, rank FROM r$iterations""".stripMargin
  }
}
