package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation plumbing for the iterative graph family
  * ([[PageRank]], [[LabelPropagation]]; [[ConnectedComponents]] carries
  * its own variant with per-iteration unpersist). Iterative dataflows
  * must cut lineage each materialization or the plan grows without
  * bound — but `localCheckpoint()` stores blocks in executor memory
  * only, so at real cluster scale losing ONE executor mid-job loses
  * the job. Callers that run long (many rounds, 100 TB inputs) pass a
  * reliable `dir`; local/test callers omit it and keep the faster
  * executor-memory path. Results are bitwise identical either way —
  * truncation changes where blocks live, not what they contain.
  */
object Checkpointing extends Logging {

  /** Drop the block-manager copy behind a `localCheckpoint`ed frame
    * (the frame must no longer be used). No-op under `reliable` —
    * reliable checkpoint files are reaped by the caller/dir owner,
    * not the block manager. Reaches the checkpoint RDD through the
    * LogicalRDD leaf — an INTERNAL Spark API: if an upgrade reshapes
    * the leaf this degrades to a warning (blocks then live until the
    * ContextCleaner or session end), never a failure. */
  def free(df: DataFrame, reliable: Boolean): Unit =
    if (!reliable) {
      // collect (not collectFirst): a frame built over several
      // checkpointed inputs — e.g. a union of per-round checkpoints —
      // has one LogicalRDD leaf per input, and freeing only the first
      // would silently pin the rest
      val leaves = df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
      if (leaves.isEmpty) logWarning(
        "no LogicalRDD leaf under a localCheckpoint'ed frame — Spark " +
          "internal plan shape changed; superseded checkpoint blocks " +
          "will not be freed eagerly")
      else leaves.foreach(_.unpersist(blocking = false))
    }

  /** Runs `body` with a truncation function: reliable `checkpoint()`
    * under `dir` when given, else `localCheckpoint()`.
    *
    * `SparkContext.setCheckpointDir` is SESSION-GLOBAL state, so the
    * caller's prior dir is restored on exit (the
    * [[ConnectedComponents.components]] contract: `setCheckpointDir`
    * nests a fresh UUID per call, so "restored" means the same tree,
    * not the same leaf — files already written are never relocated).
    * Checkpoint files under `dir` outlive the call; the caller owns
    * reaping them.
    */
  def withTruncation[T](session: org.apache.spark.sql.SparkSession,
      dir: Option[String])(body: (DataFrame => DataFrame) => T): T = {
    val sc = session.sparkContext
    val prior = sc.getCheckpointDir
    dir.foreach(sc.setCheckpointDir)
    val ckpt: DataFrame => DataFrame =
      if (dir.isDefined) _.checkpoint() else _.localCheckpoint()
    try body(ckpt)
    finally if (dir.isDefined) prior.foreach(sc.setCheckpointDir)
  }
}
