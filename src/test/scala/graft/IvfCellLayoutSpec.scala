package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The IVF "layout key" contract, tested — not narrated: a corpus
  * written cell-partitioned must answer a probe by LISTING (and so
  * reading) only the probed cells' directories. This is the 100×-scale
  * claim behind `ivf_ann`/`ivf_ann_learned` ("a probe touches
  * nprobe/k of the data, pruned at the scan"), proven the same way
  * PartitionPruningSpec proves date DPP: by counting the partitions
  * the physical scan actually selected. */
class IvfCellLayoutSpec extends SparkSuite {
  import spark.implicits._

  private val root = "/tmp/graft_ivf_layout/emb_by_cell"

  private lazy val emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding".cast("array<double>").as("v"))

  // one-iteration deterministic Lloyd — this spec is about the layout,
  // not centroid quality, but using the real index-build path keeps it
  // end-to-end: learn → assign → write partitioned → probe pruned.
  private lazy val cents = IvfIndex.learnCentroids(emb, 16, 1)

  private lazy val layoutWritten: Unit =
    IvfIndex.writeCellLayout(IvfIndex.assignCells(emb, cents), root,
      16, cents.head.length)

  /** The one FileSourceScanExec of a (non-AQE) plan. */
  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail(s"no file scan in:\n${df.queryExecution.executedPlan}"))

  test("probing a cell-partitioned layout lists only the probed cells") {
    layoutWritten
    // AQE off so the executed plan exposes the FileSourceScanExec
    // directly (AdaptiveSparkPlanExec hides children from collect)
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val allCells = spark.read.parquet(root)
        .select($"cell".cast("long")).distinct().as[Long].collect().sorted
      assert(allCells.length >= 8,
        s"fixture corpus should spread over many cells: ${allCells.toSeq}")
      val probed = allCells.take(4).toSeq

      val pruned = IvfIndex.readCells(spark, root, probed)
      val prunedListing = scanOf(pruned).selectedPartitions
      val fullListing = scanOf(spark.read.parquet(root)).selectedPartitions

      // THE claim: the scan selected exactly the probed directories.
      assert(prunedListing.partitionCount == probed.length,
        s"expected ${probed.length} partitions, got ${prunedListing.partitionCount}")
      assert(fullListing.partitionCount == allCells.length)
      assert(prunedListing.totalNumberOfFiles < fullListing.totalNumberOfFiles)

      // and the pruned rows are exactly the probed cells' members
      val want = IvfIndex.assignCells(emb, cents)
        .filter($"cell".isin(probed: _*))
        .select($"vec_id").as[Long].collect().sorted.toSeq
      val got = pruned.select($"vec_id").as[Long].collect().sorted.toSeq
      assert(got == want)
    }
  }

  test("probe-derived cell list prunes dynamically (DPP) at the scan") {
    layoutWritten
    // the nprobe best cells of a probe vector, materialized as a scan
    // with a selective predicate (a literal list would constant-fold
    // and never exercise runtime pruning)
    val dimRoot = "/tmp/graft_ivf_layout/probe_cells"
    val probes = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"),
        posexplode(IvfIndex.scoresCol($"v", cents)).as(Seq("cid0", "score")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"probe_id").orderBy($"score".desc, $"cid0")))
      .filter($"rk" <= 4)
      .select($"probe_id", ($"cid0" + 1).cast("long").as("cell"))
    probes.write.mode("overwrite").parquet(dimRoot)

    val dim = spark.read.parquet(dimRoot).filter($"probe_id" === 5L)
    val fact = spark.read.parquet(root)
    val joined = fact
      .join(dim, fact("cell").cast("long") === dim("cell"))
      .groupBy(dim("cell")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery on the cell layout:\n${plan.take(3000)}")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }

  test("pruned ANN search equals the in-memory assignment on probed cells") {
    layoutWritten
    val probe = emb.filter($"vec_id" === 5L).select($"v").head.getSeq[Double](0)
    val pv = array(probe.map(lit): _*)
    val scores = cents.map(c =>
      c.zip(probe).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2)
    val best = scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }
      .take(4).map(_._2 + 1L).toSeq

    def top5(corpus: org.apache.spark.sql.DataFrame) = corpus
      .filter($"vec_id" =!= 5L)
      .select($"vec_id",
        (graft.functions.GraftFunctions.dotd($"v", pv)).as("dot"))
      .orderBy($"dot".desc, $"vec_id").limit(5)
      .select($"vec_id").as[Long].collect().toSeq

    val viaLayout = top5(IvfIndex.readCells(spark, root, best)
      .select($"vec_id", $"v"))
    val viaMemory = top5(IvfIndex.assignCells(emb, cents)
      .filter($"cell".isin(best: _*)).select($"vec_id", $"v"))
    assert(viaLayout == viaMemory && viaLayout.length == 5)
  }
}
