package graft

import graft.operators.ArtifactStore
import graft.queries.Pipeline
import org.apache.spark.sql.DataFrame

/** The restart-survivability contract of the shared-artifact layer:
  * an artifact is built at most once per (dir, name, version), a
  * SECOND SparkSession reads the published parquet without rebuilding,
  * and every consumer row is bitwise-identical across sessions (the
  * stored relations are deterministic — keyed hashes and integer
  * math). */
class ArtifactStoreSpec extends SparkSuite {
  import spark.implicits._

  private def failBuild(msg: String): DataFrame =
    sys.error(msg)

  test("getOrBuild publishes once; later calls and a second session " +
      "read without rebuilding") {
    val root = "/tmp/graft_artifacts_spec/" + System.nanoTime()
    withSQLConf("spark.graft.artifacts.dir" -> root) {
      val b0 = ArtifactStore.builds
      val a1 = ArtifactStore.getOrBuild(spark, sf, "spec_art", "v1")(
        spark.range(100).select($"id", ($"id" * $"id").as("sq")))
      val rows1 = a1.orderBy($"id").collect().toSeq
      assert(ArtifactStore.builds == b0 + 1)
      assert(rows1.size == 100)
      // warm read: the build thunk must never run
      val a2 = ArtifactStore.getOrBuild(spark, sf, "spec_art", "v1")(
        failBuild("warm path must not rebuild"))
      assert(a2.orderBy($"id").collect().toSeq == rows1)
      assert(ArtifactStore.builds == b0 + 1)
      // a SECOND session reads the same bytes, also without building
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.artifacts.dir", root)
      val a3 = ArtifactStore.getOrBuild(s2, sf, "spec_art", "v1")(
        failBuild("second session must not rebuild"))
      assert(a3.orderBy(org.apache.spark.sql.functions.col("id"))
        .collect().toSeq == rows1)
      assert(ArtifactStore.builds == b0 + 1)
      // content keying: name, version and input dir all separate
      val p = ArtifactStore.artifactPath(spark, sf, "spec_art", "v1")
      assert(ArtifactStore.artifactPath(spark, sf, "spec_art", "v2") != p)
      assert(ArtifactStore.artifactPath(spark, sf, "other", "v1") != p)
      assert(ArtifactStore.artifactPath(spark, "/x", "spec_art", "v1") != p)
      // a trailing slash on the input dir is the same artifact
      assert(ArtifactStore.artifactPath(spark, sf + "/", "spec_art",
        "v1") == p)
    }
  }

  test("shared cache family: a second session reads the persisted " +
      "artifacts, consumers bitwise-unchanged") {
    // force-publish via the first session (may be a warm read if a
    // previous run already published — either way the artifacts exist
    // after this line)
    val pairs1 = Pipeline.nearDupPairsCached(spark, sf)
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    val bpe1 = SparkEntry.queries("bpe_train")(spark, sf)
      .collect().toSeq
    val cent1 = SparkEntry.queries("source_affinity")(spark, sf)
      .collect().toSeq
    val clus1 = SparkEntry.queries("neardup_clusters")(spark, sf)
      .collect().toSeq

    val s2 = spark.newSession()
    val b1 = ArtifactStore.builds
    val pairs2 = Pipeline.nearDupPairsCached(s2, sf)
      .orderBy(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b")).collect().toSeq
    val bpe2 = SparkEntry.queries("bpe_train")(s2, sf).collect().toSeq
    val cent2 = SparkEntry.queries("source_affinity")(s2, sf)
      .collect().toSeq
    val clus2 = SparkEntry.queries("neardup_clusters")(s2, sf)
      .collect().toSeq
    assert(ArtifactStore.builds == b1,
      "the second session must read the published artifacts, not " +
        "rebuild them")
    assert(pairs2 == pairs1)
    assert(bpe2 == bpe1)
    assert(cent2 == cent1)
    assert(clus2 == clus1)
  }

  test("trade SCC labeling is a persisted artifact: the FW-BW loop " +
      "runs once; the condensation row rides it in a fresh session") {
    // session 1 publishes (or warm-reads) the labeling; both consumers
    // share it
    val nodes1 = SparkEntry.queries("trade_scc_nodes")(spark, sf)
      .collect().toSeq
    val cond1 = SparkEntry.queries("trade_scc_condensed")(spark, sf)
      .collect().toSeq
    assert(cond1.nonEmpty, "condensation must have inter-SCC edges")
    val s2 = spark.newSession()
    val b1 = ArtifactStore.builds
    val nodes2 = SparkEntry.queries("trade_scc_nodes")(s2, sf)
      .collect().toSeq
    val cond2 = SparkEntry.queries("trade_scc_condensed")(s2, sf)
      .collect().toSeq
    assert(ArtifactStore.builds == b1,
      "a second session must read the published SCC labeling, not " +
        "re-run the FW-BW loop")
    assert(nodes2 == nodes1 && cond2 == cond1)
  }
}
