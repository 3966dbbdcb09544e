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
}
