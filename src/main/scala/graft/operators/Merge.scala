package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutation application for append-only storage — the MERGE half of a
  * warehouse engine, expressed as dataflow. A 100 TB corpus on object
  * storage is never updated in place; changes arrive as a changelog
  * (op ∈ insert/update/delete + a monotone sequence number) and the
  * engine either
  *
  *  - [[applyChangelog]]: folds the log into the snapshot — classic
  *    CDC apply / MERGE INTO semantics with latest-wins per key, or
  *  - [[scd2]]: keeps EVERY version and derives its validity interval
  *    — the slowly-changing-dimension type-2 history that answers
  *    "what did this row say as of sequence t".
  *
  * Scale shape, both: ONE hash shuffle of the (small) changelog for
  * the per-key window; the snapshot side of apply joins the changed
  * KEYS only (an anti join AQE turns into a broadcast when the log is
  * small — the common case: daily deltas are ≪ the snapshot). The
  * snapshot is never window-sorted and never moves except through the
  * anti join.
  */
object Merge {

  /** Fold `changes` into `snapshot`, latest change per key wins.
    *
    * `changes` carries the snapshot's columns plus `opCol` (one of
    * `"I"`, `"U"`, `"D"`) and `seqCol` (a monotone version — `(key,
    * seq)` pairs must be unique or the winner is undefined). Per key,
    * only the highest-`seq` change matters: `D` removes the key,
    * `I`/`U` replace the row (upsert — an `I` on an existing key and a
    * `U` on an absent key both just land the row, which is what makes
    * replaying an at-least-once log idempotent). Snapshot rows with no
    * change pass through untouched. Output columns = snapshot columns.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val upserts = latest.filter(col(opCol) =!= "D")
      .drop("__rn", seqCol, opCol)
      .select(snapshot.columns.map(col): _*)
    // every changed key leaves the snapshot (replaced or deleted);
    // joining bare keys keeps the broadcast side minimal
    val changedKeys = latest.select(keys: _*)
    snapshot.join(changedKeys, keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Type-2 history from a changelog: every version row gets
    * `valid_from` (its own `seqCol`), `valid_to` (the NEXT version's
    * seq, NULL while current) and `is_current`. `(key, seq)` must be
    * unique. One per-key window over the changelog — the snapshot
    * never appears; history IS the log with intervals attached. */
  def scd2(changes: DataFrame, keyCols: Seq[String],
      seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
