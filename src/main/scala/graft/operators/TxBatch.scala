package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-commit protocol for batch-maintained layouts — the atomic
  * publish that closes the crash window every marker-after-append
  * sink shares (commit the data, crash, never write the marker → the
  * retry re-appends a half-visible batch).
  *
  * Protocol: the batch's data (bucket-partitioned parquet) and any
  * side relations (stats) are staged under ONE hidden unique
  * directory `_staging-<id>-<uuid>`; publishing is a single atomic
  * `rename(staging, _batch-<id>)`. The committed directory is
  * simultaneously the data and the idempotence marker:
  *
  *  - crash before the rename → nothing visible anywhere (underscore
  *    paths are hidden from parquet listings); the retry restages
  *    under a fresh uuid and publishes — exactly-once;
  *  - crash after the rename → the retry sees `_batch-<id>` and is a
  *    no-op — exactly-once;
  *  - there is NO intermediate state: a reader either sees the whole
  *    batch (directory present) or none of it.
  *
  * Concurrent publishers of the same batch id race on the rename; the
  * loser (rename refused, or rename landed NESTED inside the winner's
  * directory — Hadoop rename-into-existing-dir semantics, the
  * [[ArtifactStore]] sweep) deletes its staging and reports
  * not-applied. Stale stagings of a settled id are swept.
  *
  * Read surface: committed batches are `_batch-<id>` directories,
  * hidden from plain `spark.read.parquet(root)` BY DESIGN — layout
  * owners expose a reader that unions the base with
  * [[committedDirs]] (InvertedIndex.readLayout, BandIndex.readLayout)
  * and the DSv2 connectors list them inside the scan.
  */
object TxBatch {

  /** Name of the staged stats subdirectory inside a batch directory
    * (underscore-hidden from the batch dir's own parquet listing;
    * read explicitly by the layout's stats reader). */
  val StatsDir = "_stats"

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Committed transactional batch directories under `root`, sorted.
    * Legacy marker FILES `_batch-<id>` (the pre-manifest protocol)
    * are not directories and are excluded — their data already lives
    * in the root bucket directories. */
  def committedDirs(s: SparkSession, root: String): Seq[String] = {
    val r = new Path(root)
    val fs = fsOf(s, r)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_batch-"))
      .map(_.getPath.toString).sorted
  }

  /** Stage `data` (+ optional one-row `stats`) for `batchId` under
    * `root` and publish atomically. Returns whether THIS call applied
    * the batch (false = already committed, or lost the publish race).
    *
    * `partitionCol` is the layout's partition key — `bucket` for the
    * term/band layouts, `cell` for the IVF cell layout; the protocol
    * is key-agnostic (the staging/rename dance never looks inside).
    *
    * `crashBeforePublish` is the spec failpoint: staging completes,
    * then the "driver dies" (throws) before the rename — the injected
    * crash the protocol must survive. */
  private[graft] def publish(s: SparkSession, root: String, batchId: Long,
      data: DataFrame, stats: Option[DataFrame],
      crashBeforePublish: Boolean = false,
      partitionCol: String = "bucket"): Boolean = {
    val committed = new Path(root, s"_batch-$batchId")
    val fs = fsOf(s, committed)
    def sweepStaleStagings(exceptName: String): Unit = {
      val r = new Path(root)
      if (fs.exists(r)) fs.listStatus(r).toSeq
        .filter(st => st.getPath.getName.startsWith(s"_staging-$batchId-") &&
          st.getPath.getName != exceptName)
        .foreach(st => fs.delete(st.getPath, true))
      // a race loser that crashed AFTER its rename nested its staging
      // inside the winner's committed directory but BEFORE the nested
      // delete leaves garbage no root-level scan sees (invisible to
      // readers — underscore paths — but persisted forever): sweep
      // _staging-* children of the committed directory too
      if (fs.exists(committed)) fs.listStatus(committed).toSeq
        .filter(_.getPath.getName.startsWith("_staging-"))
        .foreach(st => fs.delete(st.getPath, true))
    }
    if (fs.exists(committed)) {
      sweepStaleStagings(exceptName = "")
      return false
    }
    val staging = new Path(root, s"_staging-$batchId-" +
      java.util.UUID.randomUUID().toString.take(8))
    data.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(staging.toString)
    stats.foreach(_.write.mode(SaveMode.Overwrite)
      .parquet(new Path(staging, StatsDir).toString))
    if (crashBeforePublish)
      throw new RuntimeException(
        s"injected crash before publish of batch $batchId (test failpoint)")
    val won = !fs.exists(committed) && fs.rename(staging, committed)
    if (!won) {
      fs.delete(staging, true)
      sweepStaleStagings(exceptName = "")
      return false
    }
    // check-then-act residue: a concurrent publisher landing between
    // the exists check and our rename makes the rename succeed by
    // nesting our staging INSIDE the winner's directory — sweep it
    // and report not-applied (the winner's batch is the batch).
    val nested = new Path(committed, staging.getName)
    val lostNested = fs.exists(nested)
    if (lostNested) fs.delete(nested, true)
    sweepStaleStagings(exceptName = "")
    !lostNested
  }
}
