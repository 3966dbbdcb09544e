package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout — the co-located join: when two tables are
  * written bucketed (and sorted) by the same key into the same bucket
  * count, a join between them needs NO shuffle and NO sort — each
  * task zips bucket i with bucket i. At 100 TB this converts the
  * recurring fact⋈fact join from the cluster's largest exchange into
  * a local merge per bucket; the price is paid once, at write time.
  *
  * Spark's bucketing lives behind the session catalog (`bucketBy`
  * requires `saveAsTable`), so these helpers speak table names, not
  * paths. Bucket count must match on both sides for the exchange-free
  * plan. Eliding the per-task Sort needs TWO things (pinned in
  * BucketingSpec): each bucket must be exactly one file (writeBucketed
  * guarantees this by pre-partitioning on the bucket hash), and the
  * reader must opt in to sorted bucket scans via [[SortedScanConf]] —
  * since 3.0 Spark hides bucket ordering by default because honoring
  * it forces one-file-per-bucket read parallelism.
  */
object Bucketing {

  /** Session conf that lets a bucketed scan report its `sortBy` order,
    * enabling the sort-free co-located SMJ. Off by default in Spark;
    * set to "true" around recurring bucketed joins. */
  val SortedScanConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"

  /** Write `df` as a bucketed, per-bucket-sorted parquet table.
    *
    * Spark only treats a bucket as pre-sorted (and so elides the
    * per-task Sort in a co-located SMJ) when the bucket is a SINGLE
    * file. `repartition(nBuckets, keys)` uses the same
    * murmur3-`pmod` HashPartitioning as the bucket-id assignment, so
    * each write task holds exactly one bucket's rows and emits
    * exactly one file per bucket — the layout pays its sort once, at
    * write time, as advertised.
    *
    * @param sortCols extra per-bucket sort columns appended AFTER the
    *                 bucket keys — the as-of layout (bucket by key,
    *                 sort by (key, time)) so a clustered-merge as-of
    *                 over two such tables needs neither Exchange nor
    *                 Sort (NativeAsOfJoinSpec pins this)
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    require(keys.nonEmpty, "bucketing needs at least one key")
    // Overwrite semantics across JVMs: the session catalog is
    // in-memory, so a managed table written by a PREVIOUS process is
    // unknown to this one while its warehouse location still exists on
    // disk — saveAsTable would then fail with LOCATION_ALREADY_EXISTS.
    // Drop the catalog entry (removes files when known) and reap any
    // orphaned location before writing.
    val spark = df.sparkSession
    drop(spark, table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val sort = keys ++ sortCols
    df.repartition(nBuckets, keys.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** The bucket a row lands in: `pmod(murmur3(key, seed=42), n)` —
    * exactly Spark's HashPartitioning.partitionIdExpression, which is
    * also the bucket-file suffix writeBucketed produces. Exposing it
    * as a Column makes the physical layout queryable (bucket row
    * counts, per-bucket key ranges) and oracle-checkable. */
  def bucketId(key: Column, nBuckets: Int): Column =
    pmod(hash(key), lit(nBuckets)).cast("long")

  private val C1 = 3432918353L // 0xcc9e2d51
  private val C2 = 461845907L  // 0x1b873593

  // 32-bit (a*b) mod 2^32 without overflowing signed 64-bit: split a
  // into 16-bit halves. a < 2^32, b < 2^32 constant.
  private def mulm(a: String, b: Long): String =
    s"(((($a) & 65535) * $b + (((($a) >> 16) & 65535) * $b) % 65536 * 65536) % 4294967296)"

  // 32-bit rotate-left of x (x < 2^32): disjoint bit ranges, so + is |.
  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) % 4294967296) + (($x) >> ${32 - r}))"

  /** DuckDB twin of [[bucketId]] for a single BIGINT key: an unrolled
    * murmur3_x86_32 over the key's 8 little-endian bytes (two 4-byte
    * blocks, seed 42, len 8), emitted as a chain of named-column
    * subqueries in pure 64-bit-safe integer arithmetic. Returns a
    * parenthesized relation `(SELECT <keyCol>, bucket FROM ...)`.
    * Engine and oracle share no code — this is an independent
    * reimplementation of the public murmur3 spec, so a drift in either
    * side's hash shows up as a correctness mismatch. */
  def bucketMapSql(keyCol: String, nBuckets: Int, from: String): String = {
    val steps = Seq(
      "lo" -> s"(($keyCol) & 4294967295)",
      "hi" -> s"((($keyCol) >> 32) & 4294967295)",
      // mixK1(lo) then mixH1(seed=42, k1)
      "a1" -> mulm("lo", C1),
      "b1" -> rotl("a1", 15),
      "k1" -> mulm("b1", C2),
      "x1" -> "xor(42, k1)",
      "r1" -> rotl("x1", 13),
      "h1" -> "((r1 * 5 + 3864292196) % 4294967296)",
      // mixK1(hi) then mixH1(h1, k2)
      "a2" -> mulm("hi", C1),
      "b2" -> rotl("a2", 15),
      "k2" -> mulm("b2", C2),
      "x2" -> "xor(h1, k2)",
      "r2" -> rotl("x2", 13),
      "h2" -> "((r2 * 5 + 3864292196) % 4294967296)",
      // fmix32 with len=8
      "f0" -> "xor(h2, 8)",
      "f1" -> "xor(f0, f0 >> 16)",
      "f2" -> mulm("f1", 2246822507L), // 0x85ebca6b
      "f3" -> "xor(f2, f2 >> 13)",
      "f4" -> mulm("f3", 3266489909L), // 0xc2b2ae35
      "f5" -> "xor(f4, f4 >> 16)",
      // reinterpret as signed int32, then Spark's pmod
      "hs" -> "(CASE WHEN f5 >= 2147483648 THEN f5 - 4294967296 ELSE f5 END)",
      "bucket" -> s"(((hs % $nBuckets) + $nBuckets) % $nBuckets)")
    val chain = steps.foldLeft(s"SELECT $keyCol FROM $from") {
      case (acc, (name, expr)) => s"SELECT *, $expr AS $name FROM ($acc)"
    }
    s"(SELECT $keyCol, bucket FROM ($chain))"
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
