package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Restart-survivable shared artifacts: content-keyed parquet layouts
  * for the expensive relations many queries share (the LSH pair
  * relation, closure labels, source centroids, BPE round tables).
  *
  * The in-JVM `SessionCache` + `localCheckpoint` layer is correct and
  * fast within one session, but rebuilds from scratch on every new
  * JVM; the BandIndex/InvertedIndex persisted layouts already show the
  * durable pattern. This store generalizes it: an artifact is keyed by
  * (canonical input dir, artifact name, version tag), where the
  * version tag encodes every tuning constant the build depends on —
  * two JVMs (or two sessions) asking for the same key read the same
  * parquet bytes, so every consumer row is bitwise-identical to the
  * session-cache path (all stored relations are deterministic: keyed
  * hashes and integer math, never rand() or timestamps).
  *
  * Write protocol: build → write to a unique temp dir → rename into
  * the final path if still absent (the loser of a cross-process race
  * deletes its temp dir and reads the winner's). `_SUCCESS` under the
  * final path is the commit marker; readers never see a half-written
  * layout because the rename is the publish.
  *
  * Root: `spark.graft.artifacts.dir` (session conf) if set, else
  * `java.io.tmpdir/graft_artifacts`. On a cluster point it at shared
  * storage; artifacts are ordinary parquet, so they also serve as the
  * hand-off format between pipeline stages owned by different jobs.
  */
object ArtifactStore {

  def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.artifacts.dir")
      .getOrElse(sys.props("java.io.tmpdir").stripSuffix("/") +
        "/graft_artifacts")

  /** Number of artifact BUILDS this JVM has run (not reads) — spec
    * instrumentation for the "second session reads without
    * rebuilding" contract. */
  private val buildCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def builds: Int = buildCount.get()

  /** Deterministic artifact location for (inputDir, name, version). */
  def artifactPath(s: SparkSession, inputDir: String, name: String,
      version: String): String = {
    val canon = new Path(inputDir).toUri.normalize().toString
      .stripSuffix("/")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$canon|$name|$version".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    s"${root(s)}/$name-$key"
  }

  /** Whether the artifact has been published (committed `_SUCCESS`
    * under its final path) — lets a caller that feeds SEVERAL
    * artifacts from one expensive build decide whether to run it at
    * all. */
  def isPublished(s: SparkSession, inputDir: String, name: String,
      version: String): Boolean = {
    val path = new Path(artifactPath(s, inputDir, name, version))
    path.getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new Path(path, "_SUCCESS"))
  }

  /** Read the artifact if it exists, else run `build`, publish it, and
    * read it back. The returned frame always scans the parquet layout
    * (never the build plan), so consumers get identical plans on warm
    * and cold paths. */
  def getOrBuild(s: SparkSession, inputDir: String, name: String,
      version: String)(build: => DataFrame): DataFrame = {
    val pathStr = artifactPath(s, inputDir, name, version)
    val path = new Path(pathStr)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val done = new Path(path, "_SUCCESS")
    if (!fs.exists(done)) {
      val tmp = new Path(pathStr + ".tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
      buildCount.incrementAndGet()
      build.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.mkdirs(path.getParent)
      // publish: the rename is atomic per filesystem; if another
      // process won the race (the final path exists at all — renaming
      // onto an existing directory would nest, not replace), keep its
      // layout and drop ours
      if (!fs.exists(path) && fs.rename(tmp, path)) ()
      else fs.delete(tmp, true)
      // the exists→rename pair is check-then-act: a concurrent
      // publisher landing between the two makes OUR rename succeed by
      // moving tmp INSIDE the winner's directory (Hadoop
      // rename-into-existing-directory semantics). A stray nested
      // .tmp-* breaks later parquet partition discovery — sweep it.
      val nested = new Path(path, tmp.getName)
      if (fs.exists(nested)) fs.delete(nested, true)
    }
    s.read.parquet(pathStr)
  }
}
