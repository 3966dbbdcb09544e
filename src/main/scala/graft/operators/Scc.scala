package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED edge list — the
  * mutual-reachability sibling of [[ConnectedComponents]] ([X]
  * extension op; the reference has no graph surface, `main.rs:3`).
  *
  * Algorithm: deterministic forward–backward min-label coloring (the
  * FW-BW peeling idea of Fleischer/Hendrickson/Pinar, "On identifying
  * strongly connected components in parallel", 2000, in its min-label
  * form — no pivots, no randomness):
  *
  *   fwd(v) = min id over {v} ∪ ancestors(v)   (min flows WITH edges)
  *   bwd(v) = min id over {v} ∪ descendants(v) (min flows AGAINST)
  *
  * If fwd(v) = bwd(v) = m then m reaches v and v reaches m, so
  * v ∈ SCC(m); and no smaller mutual partner can exist (it would be
  * an ancestor, contradicting fwd = m) — so m is exactly the SCC's
  * min member id. Labeled nodes peel off, edges restrict to the
  * remainder, and the next round labels the new minimum's SCC: every
  * round is guaranteed progress (the smallest remaining id always
  * satisfies fwd = bwd = itself), so outer rounds ≤ #SCCs, and in
  * practice one round labels every SCC whose min is not "shadowed"
  * by a smaller non-mutual ancestor/descendant.
  *
  * Each outer round first TRIMS to fixpoint: nodes missing an in- or
  * out-edge in the live subgraph cannot sit on a cycle and peel as
  * singletons with cheap degree joins — DAG-shaped mass and chains
  * (the min-label peel's worst case: one SCC per round) never reach
  * the propagation passes. The `maxOuter` cap is a safety valve for
  * adversarial cycle-chain topologies (an SCC chain deeper than
  * maxOuter aborts loudly rather than running unbounded; raise the
  * cap for such graphs).
  *
  * Each propagation is the hash-min loop with POINTER JUMPING
  * (labels are node ids, so lbl(v) may adopt lbl(lbl(v)) — min over
  * ancestors is transitive), giving O(log diameter) rounds per
  * fixpoint, the [[ConnectedComponents]] recipe applied directionally.
  *
  * 100 TB contract: state is one (node, label) relation per pass —
  * all steps are equi-joins + min-aggregations on the node key (no
  * broadcast of O(nodes) state, no driver materialization; the only
  * driver probes are emptiness checks on change-filtered frames, the
  * ConnectedComponents precedent). Lineage truncates per iteration
  * through [[Checkpointing.withTruncation]]: pass a reliable
  * `checkpointDir` for cluster fault tolerance.
  */
object Scc extends Logging {

  /** SCC labels for a directed edge list.
    *
    * @param edges     directed edges; self-loops dropped
    * @param srcCol    source-node column (long ids)
    * @param dstCol    destination-node column
    * @param maxOuter  peel-round bound (≥ #SCCs is always enough)
    * @param maxProp   per-fixpoint propagation-round bound
    * @param checkpointDir reliable-checkpoint dir (cluster mode);
    *                  None = localCheckpoint (identical results)
    * @return (node, scc) — scc is the minimum member id of the
    *         node's strongly connected component
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxOuter: Int = 100, maxProp: Int = 40,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val reliable = checkpointDir.isDefined
    Checkpointing.withTruncation(spark, checkpointDir) { ckpt =>
      def free(df: DataFrame): Unit = Checkpointing.free(df, reliable)
      val typed = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      // node set BEFORE dropping self-loops: a node whose only edge
      // is (v, v) is trivially its own SCC and must still be labeled
      // (it falls out of the first trim round, having no live edges)
      var nodes = ckpt(typed.select($"s".as("node"))
        .unionAll(typed.select($"d".as("node"))).distinct())
      var live = ckpt(typed.filter($"s" =!= $"d").distinct())
      var out = spark.emptyDataset[(Long, Long)].toDF("node", "scc")

      def restrictLive(): Unit = {
        val prev = live
        live = ckpt(live
          .join(nodes.select($"node".as("s")), Seq("s"), "left_semi")
          .join(nodes.select($"node".as("d")), Seq("d"), "left_semi")
          .select($"s", $"d"))
        free(prev)
      }

      var outer = 0
      while (!nodes.isEmpty) {
        require(outer < maxOuter,
          s"SCC peeling did not converge in $maxOuter rounds")
        // TRIM to fixpoint: a node without BOTH an in- and an
        // out-edge in the live subgraph cannot sit on a cycle — it is
        // its own SCC. Iterated trimming resolves DAG-shaped mass
        // (and whole chains — the min-label peel's worst case, one
        // SCC per round) with cheap degree joins instead of full
        // forward/backward propagations. Bounded by maxProp per
        // outer round: a partial trim is only a missed optimization.
        var t = 0
        var more = true
        while (more && t < maxProp && !nodes.isEmpty) {
          val cyclic = live.select($"s".as("node")).distinct()
            .join(live.select($"d".as("node")).distinct(), "node")
          // materialized once: the emptiness probe, the node-set
          // update and the final out lineage all read THIS frame —
          // without the ckpt each would re-run the degree joins
          val single = ckpt(nodes.join(cyclic, Seq("node"), "left_anti")
            .select($"node", $"node".as("scc")))
          if (single.isEmpty) more = false
          else {
            out = out.unionAll(single)
            val prevNodes = nodes
            nodes = ckpt(nodes.join(single.select($"node"),
              Seq("node"), "left_anti"))
            free(prevNodes)
            restrictLive()
            t += 1
          }
        }
        if (!nodes.isEmpty) {
          val fwd = propagate(live.select($"s".as("from"), $"d".as("to")),
            nodes, maxProp, ckpt, free).withColumnRenamed("lbl", "f")
          val bwd = propagate(live.select($"d".as("from"), $"s".as("to")),
            nodes, maxProp, ckpt, free).withColumnRenamed("lbl", "b")
          val both = ckpt(fwd.join(bwd, "node"))
          free(fwd); free(bwd)
          out = out.unionAll(ckpt(
            both.filter($"f" === $"b").select($"node", $"f".as("scc"))))
          val prevNodes = nodes
          nodes = ckpt(both.filter($"f" =!= $"b").select($"node"))
          free(prevNodes); free(both)
          restrictLive()
        }
        outer += 1
      }
      free(live)
      logInfo(s"SCC converged in $outer peel rounds")
      // the union of per-round label fragments is small (one row per
      // node total) and each fragment is already materialized;
      // checkpoint the union so callers re-read, never re-peel
      ckpt(out)
    }
  }

  /** Min-label fixpoint along `from → to` over the induced subgraph
    * on `nodes`: returns (node, lbl) with lbl = min id over the node
    * and everything that reaches it via the given direction. The
    * caller owns freeing the returned frame; superseded iterations
    * are freed here. */
  private def propagate(adj: DataFrame, nodes: DataFrame, maxProp: Int,
      ckpt: DataFrame => DataFrame,
      free: DataFrame => Unit): DataFrame = {
    val spark = adj.sparkSession
    import spark.implicits._
    var lbl = ckpt(nodes.select($"node", $"node".as("lbl")))
    var iter = 0
    var converged = lbl.isEmpty
    while (!converged) {
      require(iter < maxProp,
        s"SCC min-label propagation did not converge in $maxProp rounds")
      val inMin = adj
        .join(lbl.select($"node".as("from"), $"lbl".as("flbl")), "from")
        .groupBy($"to".as("node")).agg(min($"flbl").as("nmin"))
      val stepped = lbl.join(inMin, Seq("node"), "left")
        .select($"node",
          least($"lbl", coalesce($"nmin", $"lbl")).as("lbl"),
          $"lbl".as("prev"))
      // pointer jumping: lbl(v) is an ancestor-or-self of v (in the
      // traversal direction), so lbl(lbl(v)) is too; labels satisfy
      // lbl(u) <= u, hence jmp = lbl(lbl(v)) <= lbl(v) — adopt it
      val hop = stepped.select($"node".as("lbl"), $"lbl".as("jmp"))
      val jumped = ckpt(stepped.join(hop, "lbl")
        .select($"node", $"jmp".as("lbl"), $"prev"))
      converged = jumped.filter($"lbl" =!= $"prev").isEmpty
      free(lbl)
      lbl = jumped.select($"node", $"lbl")
      iter += 1
    }
    lbl
  }
}
