package graft.operators

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF index construction: DETERMINISTIC k-means (Lloyd's algorithm)
  * over an `(vec_id: long, v: array<double>)` relation — the learned
  * counterpart of the fixed ±1-hyperplane cells in `ivf_ann`.
  *
  * Determinism contract (everything here must replay identically for
  * specs and across runs):
  *  - init: the k vectors with the smallest reference-hash
  *    `fnv1a(vec_id)` — pseudo-random scatter with no RNG state;
  *  - assignment: nearest centroid by maximum `dot(v, c) − |c|²/2`
  *    (argmin L2 for fixed |v|), first-max tiebreak = lowest cell id;
  *  - update: per-dimension mean of the members (empty cells keep
  *    their previous centroid).
  *
  * Scale shape: each iteration is one distributed assignment pass
  * (centroids ride into the plan as literals — k·dim doubles, far
  * under broadcast scale) and one per-dimension mean aggregation
  * (posexplode → (cell, dim) partial avg — 64·n intermediate rows
  * whose aggregate state is k·dim cells). Centroids (k·dim doubles)
  * are collected per iteration — the standard k-means driver loop;
  * the corpus itself never moves to the driver.
  */
object IvfIndex {

  private def centLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** `dots(v)` against every centroid, as one array column. */
  private def dotsCol(v: Column, cents: Array[Array[Double]]): Column =
    transform(array(cents.map(centLit): _*), p => F.dotd(v, p))

  /** Per-cell affinity scores `dot(v, c_i) − |c_i|²/2` as one array
    * column — argmax over it is argmin L2 distance (the |v|² term is
    * cell-independent). */
  def scoresCol(v: Column, cents: Array[Array[Double]]): Column = {
    val halfNorms = array(cents.map(c => lit(c.map(x => x * x).sum / 2.0)): _*)
    zip_with(dotsCol(v, cents), halfNorms, (d, hn) => d - hn)
  }

  /** Adds `cell` (1-based nearest-centroid id: argmax score,
    * first-max tiebreak = lowest id) to `emb`. The scores ride as
    * their own projection so they are computed once per row, not once
    * per downstream reference. */
  def assignCells(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    emb
      .withColumn("__ivf_scores", scoresCol($"v", cents))
      .withColumn("cell",
        array_position($"__ivf_scores", array_max($"__ivf_scores")))
      .drop("__ivf_scores")
  }

  /** Materialize a [[assignCells]]-style corpus PARTITIONED BY `cell` —
    * the physical layout behind the "a probe touches nprobe/k of the
    * corpus" contract. Each cell becomes its own directory, so a
    * probe's cell predicate prunes at FILE-LISTING time: statically for
    * a literal cell set ([[readCells]]), dynamically (DPP) when the
    * cell list arrives as a probe-derived dimension join. At 100 TB
    * this is the difference between scanning 4/16 of the vectors and
    * scanning all of them — IvfCellLayoutSpec pins the pruned partition
    * count, not just the plan shape. */
  def writeCellLayout(corpusWithCell: DataFrame, path: String, k: Int,
      dim: Int): Unit = {
    require(corpusWithCell.columns.contains("cell"),
      "writeCellLayout needs a `cell` column (see assignCells)")
    corpusWithCell.write.mode("overwrite").partitionBy("cell").parquet(path)
    // geometry stamp — the BandIndex._graft_meta.json rule: (k, dim)
    // are PART OF THE LAYOUT, so a probe scoring against mismatched
    // centroids (silently wrong cells, no error) is refused by readers
    // that re-derive geometry from the stamp (graft.sources.CellsSource)
    val p = new org.apache.hadoop.fs.Path(path, "_graft_meta.json")
    val fs = p.getFileSystem(
      corpusWithCell.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"k": $k, "dim": $dim}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** The `(k, dim)` persisted with a cell layout. A stamp inside the
    * effective base generation wins over the root one — [[relearn]]
    * publishes new geometry and new content under ONE atomic rename,
    * so a reader never pairs new cells with old centroids. */
  def readCellMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int) = {
    val fs0 = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val inBase = new org.apache.hadoop.fs.Path(
      TxBatch.baseDir(spark, path), "_graft_meta.json")
    val p = if (fs0.exists(inBase)) inBase
      else new org.apache.hadoop.fs.Path(path, "_graft_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"cell layout at $path has no ${p.getName} — rebuild it with " +
        "writeCellLayout (geometry-less layouts cannot be safely probed)")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val k = """"k":\s*(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
    val dim = """"dim":\s*(\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt)
    require(k.isDefined && dim.isDefined,
      s"unparseable cell-layout meta at $p: $text")
    (k.get, dim.get)
  }

  /** In-plan geometry guard for the append lane: a row whose `cell`
    * lies outside [1, k] was assigned against DIFFERENT centroids
    * (silently wrong neighbors downstream, no error), and — when the
    * payload carries a raw vector column `v` — a vector of the wrong
    * dimension corrupts every cosine it ever enters. Both refuse
    * loudly. The checks ride the `cell` column itself (the partition
    * key — never pruned away before evaluation). */
  private def guardGeometry(rows: DataFrame, k: Int, dim: Int): DataFrame = {
    val dimBad =
      if (rows.columns.contains("v")) size(col("v")) =!= lit(dim)
      else lit(false)
    // negative ids are refused too: the live probe's cross-pair
    // classification sign-flips batch ids (the BandIndex rule)
    val idBad =
      if (rows.columns.contains("vec_id")) col("vec_id") < 0
      else lit(false)
    rows.withColumn("cell",
      when(col("cell") < 1 || col("cell") > k || dimBad || idBad,
        expr(s"raise_error('IvfIndex: appended row violates the cell " +
          s"layout geometry (cell out of [1, $k], vector dim != " +
          s"$dim, or negative vec_id) — assigned against different " +
          "centroids, or unusable by the sign-flip probe')")
          .cast("bigint"))
        .otherwise(col("cell").cast("bigint")))
  }

  /** Append a NEW batch of assigned vectors into an existing
    * [[writeCellLayout]] corpus, idempotently and atomically by batch
    * id — the ANN-index maintenance path, on the same manifest-commit
    * protocol as `BandIndex.appendBandsIdempotent` ([[TxBatch]]): the
    * batch stages under a hidden unique directory and publishes with
    * ONE atomic rename to `_batch-<id>`, simultaneously the data and
    * the idempotence marker. Committed batches are read by
    * [[graft.sources.CellsSource]] (batch AND micro-batch stream) with
    * the same cell pruning as the base; plain
    * `spark.read.parquet(path)` sees only the base. Geometry comes
    * from the layout's own stamp — rows assigned against different
    * centroids are refused in-plan ([[guardGeometry]]). Returns
    * whether THIS call applied the batch. */
  def appendCellsIdempotent(assigned: DataFrame, path: String,
      batchId: Long): Boolean =
    appendCellsIdempotent(assigned, path, batchId,
      crashBeforePublish = false)

  /** The append lane with the maintenance loop CLOSED — no external
    * cron: [[appendCellsIdempotent]] then, when the append applied,
    * [[maintain]]'s drift audit (relearn iff the appended
    * population's mean centroid affinity fell below `driftRatio` of
    * the base's) and, when drift did NOT trip, the
    * [[TxBatch.maintainCompact]] fan-in fold at `maxLiveBatches`
    * (a relearn already folds everything, so the two never both
    * run). Returns `(applied, decision)` — `decision` is None when
    * the append was a replayed no-op (nothing changed, nothing to
    * audit). A live tailing consumer survives the fan-in fold iff
    * caught up (offset translation) and always refuses across a
    * relearn — the documented contentRewrite rule; writers that feed
    * a live consumer should prefer the consumer's own post-trigger
    * hook ([[graft.streaming.StreamMaintenance]]) for folds and keep
    * relearn for quiesced windows. */
  def appendCellsMaintained(assigned: DataFrame, path: String,
      batchId: Long, cents: Array[Array[Double]],
      driftRatio: Double = 0.95, maxLiveBatches: Int = 16,
      iters: Int = 1): (Boolean, Option[MaintainDecision]) = {
    val applied = appendCellsIdempotent(assigned, path, batchId)
    if (!applied) return (false, None)
    val s = assigned.sparkSession
    val d = maintain(s, path, cents, driftRatio, iters)
    if (!d.relearned)
      TxBatch.maintainCompact(s, path, partitionCol = "cell",
        maxLiveBatches = maxLiveBatches)
    (true, Some(d))
  }

  /** [[appendCellsIdempotent]] with the spec crash failpoint. */
  private[graft] def appendCellsIdempotent(assigned: DataFrame,
      path: String, batchId: Long, crashBeforePublish: Boolean): Boolean = {
    require(assigned.columns.contains("cell"),
      "appendCellsIdempotent needs a `cell` column (see assignCells)")
    val s = assigned.sparkSession
    val (k, dim) = readCellMeta(s, path) // refuses geometry-less layouts
    TxBatch.publish(s, path, batchId, guardGeometry(assigned, k, dim),
      None, crashBeforePublish, partitionCol = "cell")
  }

  /** The full committed layout: base cell directories plus every
    * committed transactional batch ([[TxBatch.committedDirs]]) — the
    * plain-parquet face of what [[graft.sources.CellsSource]] lists
    * inside its scan. */
  def readLayout(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    // one read per batch root, unioned: partition inference refuses
    // several partitioned roots in one read (conflicting-structures);
    // base resolves through TxBatch (root pre-compaction, newest
    // _base-<gen> after), folded batches excluded
    TxBatch.liveBatchDirs(spark, path)
      .foldLeft(spark.read.parquet(TxBatch.baseDir(spark, path)))(
        (acc, b) => acc.unionByName(spark.read.parquet(b)))

  /** Fold the base and every committed batch into one new base
    * generation ([[TxBatch.compact]]) — content-preserving, one
    * atomic rename, replayed batch ids stay no-ops. A tailing stream
    * consumer that has processed every committed batch survives via
    * offset translation; otherwise its next trigger refuses loudly
    * (TxBatch object doc). */
  def compact(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    TxBatch.compact(spark, path, "cell")

  /** Read back only `cells` of a [[writeCellLayout]] corpus. The
    * literal IN-filter on the partition column becomes a static
    * partition filter: unprobed cell directories are never listed,
    * never opened. (Partition-column values come back with the
    * inferred partition type — compare through a cast.) */
  def readCells(spark: org.apache.spark.sql.SparkSession, path: String,
      cells: Seq[Long]): DataFrame =
    spark.read.parquet(TxBatch.baseDir(spark, path))
      .filter(col("cell").cast("long").isin(cells: _*))

  /** Deterministic Lloyd iterations; returns the learned centroids. */
  /** Deterministic fingerprint of a centroid set — the version stamp
    * [[relearn]] publishes with the re-assigned layout, so probes
    * carrying STALE centroids across the swap refuse instead of
    * silently searching wrong cells (`Double.toString` round-trips
    * bits exactly, so equal centroid sets hash equal). */
  def centroidVersion(cents: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(cents.map(_.map(_.toString).mkString(","))
      .mkString(";").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The `centroid_version` stamped with a layout, if any (layouts
    * written before a relearn carry none — version checks are then
    * vacuous). */
  def readCentroidVersion(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[String] = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val inBase = new org.apache.hadoop.fs.Path(
      TxBatch.baseDir(spark, path), "_graft_meta.json")
    val p = if (fs.exists(inBase)) inBase
      else new org.apache.hadoop.fs.Path(path, "_graft_meta.json")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"centroid_version":\s*"([0-9a-f]+)"""".r
      .findFirstMatchIn(text).map(_.group(1))
  }

  /** Re-learn the layout's centroids from its CURRENT content and
    * re-assign every vector — the maintenance action the
    * `ivf_append` drift row measures but cannot take: appended
    * batches shift the data distribution away from the centroids the
    * base was built with, degrading nprobe recall until someone
    * re-clusters. Runs the SAME deterministic Lloyd recipe as
    * [[learnCentroids]] over base ∪ committed batches, then publishes
    * the re-assigned corpus as a new base generation under ONE atomic
    * rename ([[TxBatch.compact]] with a content transform): readers
    * see the old assignment or the new, never a mix — and the new
    * `_graft_meta.json` (same k/dim, fresh `centroid_version`) rides
    * the same rename, so geometry and content swap together. Probes
    * that captured centroids BEFORE the swap fail the version check
    * (`graft_ann`) instead of scoring against the wrong cells.
    * Raw-vector layouts only (the recipe needs `v`). Returns the new
    * centroids (the caller publishes them to its probe views). */
  def relearn(spark: org.apache.spark.sql.SparkSession, path: String,
      iters: Int = 1): Array[Array[Double]] = {
    val (k, dim) = readCellMeta(spark, path)
    val content = readLayout(spark, path)
    require(content.columns.contains("v"),
      s"relearn at $path: the layout payload has no raw vector " +
        "column `v` (PQ-coded layouts re-learn from their source " +
        "embeddings, not from codes)")
    val emb = content.select(col("vec_id"),
      col("v").cast("array<double>").as("v"))
    val cents = learnCentroids(emb, k, iters)
    val meta = s"""{"k": $k, "dim": $dim, """ +
      s""""centroid_version": "${centroidVersion(cents)}"}"""
    val ok = TxBatch.compact(spark, path, partitionCol = "cell",
      transform = df => assignCells(
        df.select(col("vec_id"), col("v").cast("array<double>").as("v")),
        cents),
      metaJson = Some(meta), force = true,
      // re-assignment REWRITES content: a tailing consumer's offset
      // must refuse translation across this generation, never treat
      // the re-assigned base as already-delivered
      contentRewrite = true)
    require(ok, s"relearn at $path lost the publish race")
    cents
  }

  /** One maintenance decision — what [[maintain]] publishes: the
    * drift audit's exact inputs (per-population counts and q6-micro
    * cosine-affinity masses, the L72 `ivf_append` spelling), the
    * derived ratio, and whether relearn fired. `generation` and
    * `centroidVersion` describe the layout AFTER the action. */
  final case class MaintainDecision(
      nExisting: Long, nAppended: Long,
      cosMassExisting6: Long, cosMassAppended6: Long,
      driftRatioMicro: Long, thresholdMicro: Long,
      relearned: Boolean, generation: Long,
      centroidVersion: Option[String])

  /** Close the maintenance loop the L72 drift row measures and S28's
    * [[relearn]] acts on, AUTOMATICALLY: run the drift audit (mean
    * q6-micro cosine affinity of the APPENDED population — live
    * committed batches — against the layout's own centroids, vs the
    * BASE population's), and relearn iff the appended population's
    * mean affinity fell below `driftRatio` of the base's. Below the
    * threshold the layout is untouched (same generation, same
    * files); above it, [[relearn]] re-clusters and swaps
    * atomically. The comparison cross-multiplies exact longs in
    * BigInt (micro-cos masses × counts), so the trip decision never
    * depends on a floating division. `cents` must be the layout's
    * CURRENT centroid view — a stale view (version stamp mismatch)
    * is refused, the graft_ann rule. With no appended batches there
    * is nothing to audit: no action. */
  def maintain(spark: org.apache.spark.sql.SparkSession, path: String,
      cents: Array[Array[Double]], driftRatio: Double = 0.95,
      iters: Int = 1): MaintainDecision = {
    require(driftRatio > 0.0 && driftRatio <= 1.0,
      s"driftRatio must be in (0, 1], got $driftRatio")
    val (k, dim) = readCellMeta(spark, path)
    require(cents.length == k && cents.forall(_.length == dim),
      s"maintain at $path: centroid view is ${cents.length}×" +
        s"${cents.headOption.map(_.length).getOrElse(0)}, the layout " +
        s"is k=$k, dim=$dim")
    readCentroidVersion(spark, path).foreach(v =>
      require(v == centroidVersion(cents),
        s"maintain at $path: the supplied centroid view does not " +
          s"match the layout's centroid_version stamp ($v) — a stale " +
          "view would mis-measure drift and relearn from the wrong " +
          "baseline"))
    val thresholdMicro = math.floor(driftRatio * 1000000.0 + 0.5).toLong
    def gen() = TxBatch.baseGenFs(
      new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(path))
    val batches = TxBatch.liveBatchDirs(spark, path)
    if (batches.isEmpty)
      return MaintainDecision(0L, 0L, 0L, 0L, -1L, thresholdMicro,
        relearned = false, gen(), readCentroidVersion(spark, path))
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    // the L72 ivf_append spelling: q6 cosine against the ASSIGNED
    // cell's centroid, floored to micro units — exact-long masses
    def scored(df: DataFrame, isNew: Int): DataFrame = df
      .select(col("cell").cast("int").as("cell"),
        col("v").cast("array<double>").as("v"))
      .withColumn("c", element_at(centsLit, col("cell")))
      .select(lit(isNew.toLong).as("is_new"),
        floor(F.dotd(col("v"), col("c")) /
          (sqrt(F.dotd(col("v"), col("v"))) *
            sqrt(F.dotd(col("c"), col("c")))) * lit(1000000.0) +
          lit(0.5)).cast("long").as("cos6"))
    val baseDf = scored(
      spark.read.parquet(TxBatch.baseDir(spark, path)), 0)
    val appDf = batches.map(b => scored(spark.read.parquet(b), 1))
      .reduce(_ unionByName _)
    val r = baseDf.unionByName(appDf)
      .agg(sum(lit(1L) - col("is_new")).as("n_existing"),
        sum(col("is_new")).as("n_appended"),
        sum((lit(1L) - col("is_new")) * col("cos6"))
          .as("mass_existing"),
        sum(col("is_new") * col("cos6")).as("mass_appended"))
      .head()
    val (nE, nA) = (r.getLong(0), r.getLong(1))
    val (mE, mA) = (r.getLong(2), r.getLong(3))
    // meanApp/meanExist < ratio  ⟺  mA·nE·1e6 < R·mE·nA (exact)
    val ratioMicro: Long =
      if (nA == 0L || mE <= 0L) -1L
      else (BigInt(mA) * nE * 1000000L / (BigInt(mE) * nA)).toLong
    val trip = nA > 0L && mE > 0L &&
      BigInt(mA) * nE * 1000000L < BigInt(thresholdMicro) * mE * nA
    if (!trip)
      return MaintainDecision(nE, nA, mE, mA, ratioMicro,
        thresholdMicro, relearned = false, gen(),
        readCentroidVersion(spark, path))
    relearn(spark, path, iters)
    MaintainDecision(nE, nA, mE, mA, ratioMicro, thresholdMicro,
      relearned = true, gen(), readCentroidVersion(spark, path))
  }

  def learnCentroids(emb: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    val s = emb.sparkSession
    import s.implicits._
    var cents: Array[Array[Double]] = emb
      .select($"vec_id", $"v", F.fnv1a($"vec_id").as("h"))
      .orderBy($"h", $"vec_id").limit(k)
      .select($"v").as[Seq[Double]].collect().map(_.toArray)
    require(cents.length == k, s"need at least $k vectors, got ${cents.length}")
    val dim = cents.head.length
    var it = 0
    while (it < iters) {
      val means = assignCells(emb, cents)
        .select($"cell", posexplode($"v").as(Seq("dim", "x")))
        .groupBy($"cell", $"dim").agg(avg($"x").as("m"))
        .collect()
        .groupBy(_.getLong(0).toInt)
        .map { case (cell, rows) =>
          val c = new Array[Double](dim)
          rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
          cell -> c
        }
      cents = Array.tabulate(k)(i => means.getOrElse(i + 1, cents(i)))
      it += 1
    }
    cents
  }
}
