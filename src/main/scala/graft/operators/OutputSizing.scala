package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Output-file hygiene — the unglamorous half of running at 100 TB.
  * A 1000-executor job that writes one file per reduce task leaves
  * 32k × stages small files behind; every downstream scan then pays
  * per-file open/footer costs and the namenode pays the metadata. The
  * two layout levers:
  *
  *  - [[compact]]: rewrite a parquet directory into ~`targetBytes`
  *    files. The file count comes from the existing files' TOTAL SIZE
  *    (a driver-side listing — no data pass, no count job); the data
  *    moves through one round-robin repartition, the only shuffle a
  *    rewrite fundamentally needs.
  *  - [[writeClustered]]: range-partition + sort by a key before
  *    writing, so each output file covers a DISJOINT key range and
  *    parquet footer min/max statistics prune file reads for key
  *    predicates — the poor man's clustering index, no table format
  *    required. (Within a partition dir, the same applies per file.)
  *
  * Both write with `maxRecordsPerFile` unset — partition sizing IS the
  * file sizing here; callers with pathological row widths can set
  * `spark.sql.files.maxRecordsPerFile` themselves as a safety cap.
  */
object OutputSizing extends Logging {

  /** Total bytes of the data files under `path` (driver-side listing,
    * recursive, skips hidden/_SUCCESS files). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(d).map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else st.getLen
      }.sum
    walk(p)
  }

  /** Rewrite the parquet directory `inPath` to `outPath` as
    * ~`targetBytes`-sized files (compressed size, estimated from the
    * input's own compressed size — same data, same codec, so the
    * estimate is tight). Returns the file count written. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    require(inPath != outPath,
      "compact cannot overwrite its own input (read is lazy)")
    val total = dataBytes(spark, inPath)
    val nFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    logInfo(s"compacting $total bytes under $inPath into $nFiles files")
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Write `df` range-clustered by `keys` into `nFiles` files: file i
    * holds a contiguous, disjoint key range, sorted within — so a
    * reader's key predicate skips whole files on parquet footer
    * min/max stats alone. */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
      keys: Column*): Unit = {
    require(nFiles > 0, s"nFiles must be > 0, got $nFiles")
    require(keys.nonEmpty, "writeClustered needs at least one key")
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** The ARITHMETIC file map behind [[writeGridClustered]]: cell
    * `key div width` (64-bit integer division — exact at any key
    * magnitude). Unlike `repartitionByRange`'s sampled boundaries this
    * map is a pure expression, so the same cell → (row count, key
    * range) relation is DuckDB-replayable and the clustering claim is
    * driver-checkable, not just spec-narrated (the `zorder_cells`
    * pattern). Caller contract: `key` is non-negative. */
  def gridCell(key: Column, width: Long): Column = {
    require(width > 0, s"grid width must be > 0, got $width")
    ExpressionUtilsBridge.intDiv(key.cast("long"),
      org.apache.spark.sql.functions.lit(width))
  }

  /** DuckDB twin of [[gridCell]] over a BIGINT SQL expression. */
  def gridCellSql(key: String, width: Long): String = s"(($key) // $width)"

  /** Write `df` clustered into one file per occupied grid cell of
    * `key` (cell = `key div width`): each output file holds exactly
    * one contiguous, DISJOINT key range `[c*width, (c+1)*width)`,
    * sorted within — footer min/max stats prune key predicates to the
    * files whose cell they touch, and the file count equals the
    * occupied-cell count of the driver-checked `clustered_file_map`
    * relation. The repartition co-locates whole cells, so dynamic
    * `partitionBy` emits exactly one file per cell directory. */
  def writeGridClustered(df: DataFrame, path: String, key: Column,
      width: Long): Unit = {
    df.withColumn("__cell", gridCell(key, width))
      .repartition(org.apache.spark.sql.functions.col("__cell"))
      .sortWithinPartitions(key)
      .write.mode("overwrite").partitionBy("__cell").parquet(path)
  }
}

/** 64-bit `div` as a Column (Column `/` is double division, exactness
  * ends at 2^53) — shared spelling with [[ZOrder.scaleTo]]. */
private[operators] object ExpressionUtilsBridge {
  import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide}
  import org.apache.spark.sql.graftbridge.{Bridge => B}
  def intDiv(a: Column, b: Column): Column =
    B.column(IntegralDivide(B.expression(a), B.expression(b),
      evalMode = EvalMode.LEGACY))
}
