package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA) for community detection — the
  * third member of the iterative-graph family: ConnectedComponents
  * closes reachability (min-aggregation), PageRank spreads mass
  * (sum-aggregation), LPA finds DENSE regions (mode-aggregation):
  * each round every node adopts the most frequent label among its
  * neighbors (Raghavan, Albert, Kumara, "Near linear time algorithm
  * to detect community structures in large-scale networks", Phys.
  * Rev. E 2007). Communities split where connectivity is thin —
  * unlike components, a bridge edge does not merge two dense
  * clusters. ([X] extension op over the reference's capability
  * envelope, `main.rs:3` — it has no graph surface.)
  *
  * DETERMINISTIC variant (classic LPA breaks ties randomly and
  * converges non-deterministically — useless for a driver-checked
  * oracle): fixed round count, synchronous updates, and the mode
  * tie-break is the SMALLEST label (row_number over (count DESC,
  * label)), so the whole recursion replays exactly in any engine.
  *
  * Scale contract (100 TB): each round is one edges⋈labels equi-join
  * on the neighbor key, one map-combinable (node, label) count, and
  * one per-node top-1 window (WindowGroupLimit plans the rank filter
  * map-side); the symmetrized edge relation is materialized once; no
  * O(nodes) broadcast, no driver-side graph.
  */
object LabelPropagation {

  /** Labels after `rounds` synchronous LPA rounds:
    * DataFrame[node: long, label: long]. Label = node id at round 0;
    * every node appearing in an edge participates (self-loops and
    * duplicate edges are dropped).
    *
    * @param checkpointDir when given, the symmetrized edge relation is
    *                reliably `checkpoint()`ed into this directory
    *                (fault-tolerant at cluster scale); when absent,
    *                `localCheckpoint()` (executor-memory, faster).
    *                Bitwise-identical labels either way (deterministic
    *                tie-break; see LabelPropagationSpec). */
  def communities(edges: DataFrame, aCol: String, bCol: String,
      rounds: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    Checkpointing.withTruncation(edges.sparkSession, checkpointDir) { ckpt =>
    val sym = ckpt(EdgeHygiene.symmetrized(edges, aCol, bCol))

    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("label"))
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node").as("v"), col("label")), "v")
        .groupBy(col("u").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
    }
    labels
    }
  }

  /** The identical recursion as unrolled ANSI SQL — the oracle twin.
    * `edgesSql` must select (u, v); hygiene and the (count DESC,
    * label) mode tie-break replay inside. Yields (node, label). */
  def communitiesSql(edgesSql: String, rounds: Int): String = {
    require(rounds >= 1)
    val steps = (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
         |  SELECT node, label FROM (
         |    SELECT e.u AS node, r.label,
         |      COUNT(*) AS c,
         |      row_number() OVER (PARTITION BY e.u
         |        ORDER BY COUNT(*) DESC, r.label) AS rn
         |    FROM sym e JOIN $prev r ON e.v = r.node
         |    GROUP BY 1, 2) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${EdgeHygiene.symSqlCte(edgesSql)},
       |l0 AS (
       |  SELECT node, node AS label FROM
       |    (SELECT DISTINCT u AS node FROM sym) n),
       |$steps
       |SELECT node, label FROM l$rounds""".stripMargin
  }
}
