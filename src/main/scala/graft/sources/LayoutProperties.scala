package graft.sources

import java.util

import graft.operators.TxBatch
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The operational property map every graft layout table exposes
  * through `Table.properties()` — what makes
  * `DESCRIBE EXTENDED graft.ns.layout` answer the questions an
  * operator actually asks of a maintained index: which layout type
  * and geometry (the `_graft_meta.json` stamp fields), which base
  * generation is current (how many folds have run), how many LIVE
  * committed batches a reader's union currently fans into (the
  * maintenance-pressure signal — [[graft.operators.TxBatch
  * .maintainCompact]]'s input), and — for cell layouts — the centroid
  * version probes must match ([[graft.operators.IvfIndex]] relearn
  * stamp).
  *
  * Computed at call time from ONE root listing (the same
  * `layoutUnitsFs` listing every scan pays), so the answer reflects
  * the layout NOW, not at table-resolution time. */
private[sources] object LayoutProperties {

  def of(path: String, layoutType: String,
      geometry: Seq[(String, String)]): util.Map[String, String] = {
    val m = new util.LinkedHashMap[String, String]()
    m.put("graft.layout_type", layoutType)
    geometry.foreach { case (k, v) => m.put(s"graft.$k", v) }
    // Spark invokes Table.properties() in metadata paths where no
    // active session is guaranteed — degrade to the geometry-only map
    // there instead of throwing (ADVICE r16); the listing-derived
    // fields need a session only for the hadoopConfiguration.
    SparkSession.getActiveSession.foreach { s =>
      val root = new Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      // fold-tolerant like the scans: a fold mid-listing retries once
      CellsSource.foldTolerant(root, s"layout properties at $path") {
        val (base, live) = TxBatch.layoutUnitsFs(fs, root)
        val gen =
          if (base == root) 0L
          else base.getName.stripPrefix("_base-").toLong
        m.put("graft.base_generation", gen.toString)
        m.put("graft.live_batches", live.size.toString)
      }
    }
    m
  }
}
