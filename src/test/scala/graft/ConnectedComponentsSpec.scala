package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Connected components must agree exactly with an in-memory
  * union-find on arbitrary graphs, and the pointer-jumping step must
  * make the adversarial long-chain shape (worst case for plain
  * hash-min propagation) converge inside the iteration bound. */
class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  /** In-memory oracle: union-find with path compression, components
    * labeled by their minimum member id. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.valuesIterator.flatMap { members =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on random graphs (several densities)") {
    for (seed <- Seq(1, 2, 3); nEdges <- Seq(30, 300)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(nEdges)(
        (rnd.nextLong(200).abs, rnd.nextLong(200).abs))
        .filter(e => e._1 != e._2)
      val want = ufComponents(edges)
      val got = run(edges)
      assert(got == want, s"seed=$seed nEdges=$nEdges: " +
        s"${got.size} vs ${want.size} labeled nodes")
    }
  }

  test("a 2048-node path collapses to one component within the bound") {
    // worst case for plain hash-min (diameter = n); pointer jumping
    // must bring it inside the default 50-iteration bound
    val edges = (0L until 2047L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == 2048)
    assert(got.values.forall(_ == 0L), "all nodes must label to the min")
  }

  test("disjoint cliques keep distinct minimal labels; self-loops ignored") {
    val cliqueA = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val cliqueB = for (a <- 20L to 22L; b <- 20L to 22L if a < b) yield (a, b)
    val edges = cliqueA ++ cliqueB ++ Seq((30L, 30L), (40L, 41L))
    val got = run(edges)
    // the self-loop-only node 30 never appears (singleton contract)
    assert(!got.contains(30L))
    assert((10L to 13L).forall(got(_) == 10L))
    assert((20L to 22L).forall(got(_) == 20L))
    assert(got(40L) == 40L && got(41L) == 40L)
  }

  test("empty edge set yields an empty labeling") {
    assert(run(Seq.empty).isEmpty)
  }

  test("reliable-checkpoint mode matches union-find and writes the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    try {
      val rnd = new scala.util.Random(7)
      val edges = Seq.fill(120)(
        (rnd.nextLong(80).abs, rnd.nextLong(80).abs)).filter(e => e._1 != e._2)
      val got = ConnectedComponents.components(
          edges.toDF("a", "b"), "a", "b",
          checkpointDir = Some(dir.toString))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ufComponents(edges))
      // reliable mode must actually have checkpointed into the dir
      val wrote = java.nio.file.Files.walk(dir).count() > 1
      assert(wrote, s"no checkpoint files written under $dir")
      // and must not leave the session-global checkpoint dir pointed at
      // our (caller-reapable) directory when the caller had its own
      val prior = java.nio.file.Files.createTempDirectory("graft-cc-prior")
      try {
        spark.sparkContext.setCheckpointDir(prior.toString)
        ConnectedComponents.components(edges.toDF("a", "b"), "a", "b",
          checkpointDir = Some(dir.toString)).collect()
        // setCheckpointDir UUID-nests, so "restored" means back under
        // the caller's tree, not under ours
        val after = spark.sparkContext.getCheckpointDir
        assert(after.exists(_.contains(prior.toString)),
          s"components() must restore the caller's checkpoint dir, got $after")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(prior).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("near-dup clusters query: canonical doc is the cluster min and sizes add up") {
    val df = SparkEntry.queries("neardup_clusters")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "sf0.001 fixture must contain near-dup clusters")
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid,
        s"cluster $cid must be labeled by its min doc_id")
      assert(members.forall(_.getLong(2) == members.length),
        s"cluster $cid size column must equal the member count")
      assert(members.length >= 2, "clusters come from pairs: size >= 2")
    }
    // dedup twin: exactly the non-canonical members disappear
    val kept = SparkEntry.queries("neardup_dedup")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val total = Tables.documents(spark, sf).count()
    val dupes = rows.filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0))
    assert(dupes.forall(d => !kept.contains(d)))
    assert(kept.size == total - dupes.length)
  }

  test("merge(labels, newEdges) equals a full recompute on random graphs") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(240)(
        (rnd.nextLong(150).abs, rnd.nextLong(150).abs))
        .filter(e => e._1 != e._2)
      val (oldE, newE) = all.splitAt(160)
      val labels = ConnectedComponents.components(
        oldE.toDF("a", "b"), "a", "b")
      val got = ConnectedComponents.merge(labels, "node", "component",
          newE.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ufComponents(all), s"seed=$seed")
    }
  }

  test("merge with disjoint new edges: untouched labels pass through") {
    val oldE = Seq((0L, 1L), (1L, 2L), (5L, 6L))
    val labels = ConnectedComponents.components(oldE.toDF("a", "b"), "a", "b")
    // new edges share no node with the labeling (incl. a self-loop,
    // which must neither touch anything nor drop a label)
    val newE = Seq((100L, 101L), (101L, 102L), (5L, 5L))
    val got = ConnectedComponents.merge(labels, "node", "component",
        newE.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ufComponents(oldE ++ newE.filter(e => e._1 != e._2)))
  }

  test("merge bridges two old clusters through a brand-new node") {
    val oldE = Seq((0L, 1L), (1L, 2L), (10L, 11L))
    val labels = ConnectedComponents.components(oldE.toDF("a", "b"), "a", "b")
    val newE = Seq((2L, 50L), (50L, 10L))
    val got = ConnectedComponents.merge(labels, "node", "component",
        newE.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 0L, 11L -> 0L, 50L -> 0L))
  }

  test("fixture corpus: incremental cluster merge equals the full closure") {
    val full = SparkEntry.queries("neardup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val incr = SparkEntry.queries("incremental_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(incr == full)
    assert(incr.nonEmpty)
  }
}
