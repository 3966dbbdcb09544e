package graft

import graft.operators.{IvfIndex, SqlTableFunctions}
import org.apache.spark.sql.functions._

/** The IVF relearn action — the decision `ivf_append` measures but
  * could not take: re-run the deterministic Lloyd recipe over the
  * layout's CURRENT content (base ∪ committed batches), re-assign,
  * publish as a new base generation under one atomic rename, and
  * stamp the centroid fingerprint so probes carrying pre-relearn
  * centroids refuse instead of silently searching old cells. */
class IvfRelearnSpec extends SparkSuite {
  import spark.implicits._

  private val K = 8
  private val root = "/tmp/graft_relearn/layout"

  private lazy val emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding".cast("array<double>").as("v"))

  test("post-relearn content equals the fresh-learn assignment " +
      "bitwise; folded batch ids stay no-ops; the version stamp " +
      "rides the same swap") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val cents0 = IvfIndex.learnCentroids(corpus, K, 1)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents0),
      root, K, cents0.head.length)
    assert(IvfIndex.appendCellsIdempotent(
      IvfIndex.assignCells(batch, cents0), root, 1L))
    val newCents = IvfIndex.relearn(spark, root)
    // the recipe is the deterministic Lloyd pass over the FULL
    // content — fresh-learn over the same relation must agree bitwise
    val fresh = IvfIndex.learnCentroids(emb, K, 1)
    assert(newCents.map(_.toSeq).toSeq == fresh.map(_.toSeq).toSeq)
    val expected = IvfIndex.assignCells(emb, fresh)
      .select($"vec_id", $"cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IvfIndex.readLayout(spark, root)
      .select($"vec_id", $"cell".cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // the assignment CHANGED for someone (relearn did something):
    // appended vectors shifted the centroids
    val old = IvfIndex.assignCells(emb, cents0)
      .select($"vec_id", $"cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got != old, "fixture must make relearn move assignments")
    // geometry and version stamped inside the swapped generation
    assert(IvfIndex.readCellMeta(spark, root) ==
      ((K, cents0.head.length)))
    assert(IvfIndex.readCentroidVersion(spark, root) ==
      Some(IvfIndex.centroidVersion(newCents)))
    // the folded batch id replays as a no-op (the applied set rode
    // the same rename)
    assert(!IvfIndex.appendCellsIdempotent(
      IvfIndex.assignCells(batch, newCents), root, 1L))
    assert(IvfIndex.readLayout(spark, root).count() == expected.size)
  }

  test("probes stay correct across the swap: graft_ann with the NEW " +
      "centroids answers from the relearned layout; the stale " +
      "centroid view is refused by the version stamp") {
    SqlTableFunctions.registerAll(spark)
    // (depends on the layout the previous test relearned)
    val newCents = IvfIndex.relearn(spark, root)
    newCents.zipWithIndex
      .map { case (c, i) => (i.toLong + 1L, c.toSeq) }.toSeq
      .toDF("cell_id", "c").createOrReplaceTempView("rl_cents_new")
    emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v")
      .createOrReplaceTempView("rl_probes")
    // nprobe = k probes every cell → the answer must equal the brute
    // exact q6 cosine top-k over the whole corpus, no approximation
    def q6c(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("double") /
        lit(1000000.0)
    val dot = graft.functions.GraftFunctions.dotd _
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    val brute = emb.crossJoin(
      emb.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("pv")))
      .select($"query_id", $"vec_id",
        q6c(dot($"v", $"pv") /
          (sqrt(dot($"v", $"v")) * sqrt(dot($"pv", $"pv"))))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .collect().map(_.toSeq).toSet
    val viaAnn = spark.sql(s"SELECT * FROM graft_ann('$root', " +
      s"'rl_cents_new', 'rl_probes', '$K', '5')")
      .select($"query_id", $"neighbor_id".as("vec_id"), $"cos_sim",
        $"rn")
      .select($"query_id", $"vec_id", $"cos_sim", $"rn")
      .collect().map(_.toSeq).toSet
    assert(viaAnn == brute)
    // a STALE view (pre-relearn centroids): right (k, dim), right id
    // sequence — only the version check can catch it
    val stale = IvfIndex.learnCentroids(
      emb.filter($"vec_id" % 10 =!= 0), K, 1)
    assert(IvfIndex.centroidVersion(stale) !=
      IvfIndex.centroidVersion(newCents))
    stale.zipWithIndex
      .map { case (c, i) => (i.toLong + 1L, c.toSeq) }.toSeq
      .toDF("cell_id", "c").createOrReplaceTempView("rl_cents_stale")
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_ann('$root', " +
        s"'rl_cents_stale', 'rl_probes', '$K', '5')").collect())
    assert(e.getMessage.contains("centroid_version"), e.getMessage)
  }

  test("maintain closes the drift->relearn loop: same-distribution " +
      "appends stay below the threshold (layout untouched), hostile " +
      "appends trip it (relearn fires, generation bumps, version " +
      "stamps); a stale centroid view is refused") {
    val mroot = "/tmp/graft_relearn/maintain"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(mroot))
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val cents0 = IvfIndex.learnCentroids(corpus, K, 1)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents0),
      mroot, K, cents0.head.length)
    // no appended batches: nothing to audit, no action
    val d0 = IvfIndex.maintain(spark, mroot, cents0)
    assert(!d0.relearned && d0.nAppended == 0L && d0.generation == 0L)
    // same-distribution appends: a held-out sample scores somewhat
    // below the corpus (the centroids were learned FROM the corpus),
    // but stays well above a 0.5 policy threshold — no fire
    val sameDist = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 0), cents0)
    assert(IvfIndex.appendCellsIdempotent(sameDist, mroot, 1L))
    val d1 = IvfIndex.maintain(spark, mroot, cents0, driftRatio = 0.50)
    assert(!d1.relearned,
      s"same-distribution appends must not trip: $d1")
    assert(d1.nAppended > 0L && d1.driftRatioMicro > 500000L, d1.toString)
    assert(d1.generation == 0L, "below threshold = layout untouched")
    // hostile appends: a direction orthogonalized against EVERY
    // centroid (a few driver-side Gram-Schmidt sweeps) has ~zero
    // affinity whichever cell argmax assigns it to - the mean
    // collapses and the SAME 0.5 policy trips. (Negation would not
    // do: argmax just finds a centroid the flipped vector still
    // likes - the distribution is roughly symmetric.)
    val dim = cents0.head.length
    var u = Array.tabulate(dim)(i => math.sin(i + 1.0))
    for (_ <- 0 until 3; c <- cents0) {
      val cn2 = c.map(x => x * x).sum
      if (cn2 > 0) {
        val proj = u.zip(c).map { case (a, b) => a * b }.sum / cn2
        u = u.zip(c).map { case (a, b) => a - proj * b }
      }
    }
    val hostile = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 5)
        .select(($"vec_id" + 20000000L).as("vec_id"),
          typedlit(u.toSeq).as("v")),
      cents0)
    assert(IvfIndex.appendCellsIdempotent(hostile, mroot, 2L))
    val d2 = IvfIndex.maintain(spark, mroot, cents0, driftRatio = 0.50)
    assert(d2.relearned, s"hostile appends must trip at 0.50: $d2")
    assert(d2.driftRatioMicro < 500000L, d2.toString)
    assert(d2.generation == 1L && d2.centroidVersion.isDefined, d2.toString)
    // after the swap: the decision reports the layout's NEW stamped
    // version (relearn ≡ fresh-learn is test 1's pin) and the OLD
    // centroid view is now stale — refused, the graft_ann rule
    assert(d2.centroidVersion ==
      IvfIndex.readCentroidVersion(spark, mroot) &&
      d2.centroidVersion.isDefined)
    intercept[IllegalArgumentException](
      IvfIndex.maintain(spark, mroot, cents0))
  }

  test("appendCellsMaintained closes the loop at the APPEND lane: " +
      "below both policies the layout only gains the batch; the " +
      "fan-in policy folds at the threshold; a hostile batch trips " +
      "relearn instead; a replayed append is a no-op with no audit") {
    val mroot = "/tmp/graft_relearn/append_maintained"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(mroot))
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val cents0 = IvfIndex.learnCentroids(corpus, K, 1)
    IvfIndex.writeCellLayout(IvfIndex.assignCells(corpus, cents0),
      mroot, K, cents0.head.length)
    // multiples of 10 are all even — split the held-out tenth by
    // %20 (10 vs 0), never by parity (an empty batch dir would fail
    // parquet schema inference downstream)
    def sameDist(i: Int) = IvfIndex.assignCells(
      emb.filter($"vec_id" % 20 === (i % 2) * 10)
        .select(($"vec_id" + 1000000L * i).as("vec_id"), $"v"),
      cents0)
    // append 1: below drift (0.5) and below fan-in (2) — batch lands,
    // nothing folds, nothing relearns
    val (a1, d1) = IvfIndex.appendCellsMaintained(sameDist(1), mroot,
      1L, cents0, driftRatio = 0.50, maxLiveBatches = 2)
    assert(a1 && d1.exists(!_.relearned), s"$a1 $d1")
    assert(graft.operators.TxBatch.liveBatchDirs(spark, mroot).size == 1)
    // replayed append: no-op, no audit run at all
    assert(IvfIndex.appendCellsMaintained(sameDist(1), mroot, 1L,
      cents0, driftRatio = 0.50, maxLiveBatches = 2) == ((false, None)))
    // append 2: drift still quiet, fan-in reaches 2 — the hook FOLDS
    val (a2, d2) = IvfIndex.appendCellsMaintained(sameDist(2), mroot,
      2L, cents0, driftRatio = 0.50, maxLiveBatches = 2)
    assert(a2 && d2.exists(!_.relearned))
    assert(graft.operators.TxBatch
      .compactedBaseDir(spark, mroot).isDefined, "fan-in never folded")
    assert(graft.operators.TxBatch.liveBatchDirs(spark, mroot).isEmpty)
    // content = base ∪ both batches, exactly once
    val n = spark.read.format("graft.sources.CellsSource")
      .option("path", mroot).load().count()
    assert(n == corpus.count() + sameDist(1).count() + sameDist(2).count())
    // hostile append: the drift policy trips and relearn runs INSTEAD
    // of the fan-in fold (a relearn already folds everything)
    val dim = cents0.head.length
    var u = Array.tabulate(dim)(i => math.sin(i + 1.0))
    for (_ <- 0 until 3; c <- cents0) {
      val cn2 = c.map(x => x * x).sum
      if (cn2 > 0) {
        val proj = u.zip(c).map { case (a, b) => a * b }.sum / cn2
        u = u.zip(c).map { case (a, b) => a - proj * b }
      }
    }
    val hostile = IvfIndex.assignCells(
      emb.filter($"vec_id" % 10 === 5)
        .select(($"vec_id" + 20000000L).as("vec_id"),
          typedlit(u.toSeq).as("v")),
      cents0)
    val (a3, d3) = IvfIndex.appendCellsMaintained(hostile, mroot, 3L,
      cents0, driftRatio = 0.50, maxLiveBatches = 100)
    assert(a3 && d3.exists(_.relearned), s"$a3 $d3")
    assert(d3.flatMap(_.centroidVersion) ==
      IvfIndex.readCentroidVersion(spark, mroot))
    assert(graft.operators.TxBatch.liveBatchDirs(spark, mroot).isEmpty,
      "relearn folds everything")
  }
}
