package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.operators.Scc

/** Scc — brute Tarjan parity on the fixture graph, reliable-checkpoint
  * equality, and structural invariants of the labeling. */
class SccSpec extends SparkSuite {
  import spark.implicits._

  /** Iterative Tarjan (explicit stack — no recursion depth limit). */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val index = mutable.Map.empty[Long, Int]
    val low = mutable.Map.empty[Long, Int]
    val onStack = mutable.Set.empty[Long]
    val stack = mutable.ArrayBuffer.empty[Long]
    val comp = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // frames: (node, iterator over successors)
      val frames = mutable.ArrayBuffer((root, adj.getOrElse(root, Seq.empty).iterator))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      while (frames.nonEmpty) {
        val (v, it) = frames.last
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            frames += ((w, adj.getOrElse(w, Seq.empty).iterator))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          frames.remove(frames.length - 1)
          if (frames.nonEmpty) {
            val p = frames.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val members = mutable.ArrayBuffer.empty[Long]
            var done = false
            while (!done) {
              val w = stack.remove(stack.length - 1); onStack -= w
              members += w
              done = w == v
            }
            members.foreach(m => comp(m) = members)
          }
        }
      }
    }
    comp.map { case (n, members) => n -> members.min }.toMap
  }

  private lazy val edges: Seq[(Long, Long)] = {
    // a small synthetic directed graph with known structure PLUS the
    // fixture graph via the driver row — here build a deterministic
    // random-ish graph from modular arithmetic: nodes 0..59, edges
    // i -> (i*7+3) mod 60 (a functional graph: cycles + trees) and
    // i -> (i+1) mod 20 for i < 20 (one 20-cycle)
    val f = (0L until 60L).map(i => (i, (i * 7 + 3) % 60))
    val c = (0L until 20L).map(i => (i, (i + 1) % 20))
    (f ++ c).distinct
  }

  test("matches iterative Tarjan on a functional-graph + cycle fixture") {
    val df = edges.toDF("src", "dst")
    val got = Scc.components(df, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val want = tarjan(edges)
    assert(got == want)
    // sanity: the explicit 20-cycle is one SCC labeled by its min (0)
    assert((0L until 20L).forall(i => got(i) == got(0L)))
  }

  test("fixture trade graph: labels equal Tarjan; 5 regional SCCs") {
    val labeled = graft.queries.Graph.queries("trade_scc_nodes")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // independent edge build straight from parquet via SQL
    val li = Tables.lineitem(spark, sf)
    val e = li.select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      .join(Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, sf)
        .join(Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_regionkey".as("sr")),
        $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(spark, sf)
        .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_regionkey".as("cr")),
        $"o_custkey" === $"c_custkey")
      .filter($"sr" === $"cr")
      .groupBy($"l_suppkey", $"o_custkey", ($"l_returnflag" === "R").as("r"))
      .agg(count(lit(1)).as("w"))
    val fwd = e.filter(!$"r" && $"w" >= 2)
      .select($"l_suppkey" * 2L, $"o_custkey" * 2L + 1L)
    val rev = e.filter($"r" && $"w" >= 1)
      .select($"o_custkey" * 2L + 1L, $"l_suppkey" * 2L)
    val pairs = fwd.unionAll(rev).as[(Long, Long)].collect().toSeq
    assert(labeled == tarjan(pairs))
    val nontrivial = labeled.groupBy(_._2).filter(_._2.size >= 2)
    assert(nontrivial.size == 5, s"one SCC per region, got ${nontrivial.size}")
  }

  test("a long directed chain resolves via trimming, not one-per-round peels") {
    // 60 singleton SCCs on a path: without trimming, min-label FW-BW
    // labels exactly one node per outer round (the review-found worst
    // case); with trimming the whole chain peels inside the degree
    // loop — prove it by capping outer rounds far below 60
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Scc.components(chain, "src", "dst", maxOuter = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 59L).map(i => i -> i).toMap)
  }

  test("reliable checkpointDir mode is bitwise-equal to localCheckpoint") {
    val dir = java.nio.file.Files.createTempDirectory("scc-ckpt").toString
    val df = edges.toDF("src", "dst")
    val local = Scc.components(df, "src", "dst")
      .as[(Long, Long)].collect().sorted.toSeq
    val reliable = Scc.components(df, "src", "dst",
      checkpointDir = Some(dir))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(local == reliable)
  }

  test("every SCC label is the component's own minimum member id") {
    val labeled = Scc.components(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect()
    labeled.groupBy(_._2).foreach { case (scc, members) =>
      assert(members.map(_._1).min == scc, s"scc $scc label not min member")
    }
  }
}
