package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — multi-dimensional data clustering
  * for file skipping. Range-clustering by ONE key ([[OutputSizing
  * .writeClustered]]) gives parquet min/max pruning on that key only;
  * a predicate on any other column still touches every file. Z-order
  * interleaves the bits of TWO keys, so sorting by the z-value gives
  * every file a bounded rectangle in (a, b) space — min/max footer
  * stats then prune file reads for predicates on EITHER dimension
  * (the layout trick behind Delta/Iceberg `ZORDER BY`, expressed here
  * as pure Spark: an integer expression + repartitionByRange).
  *
  * [[zvalue]] is ~4·bits codegen'd bit ops per row; [[zvalueSql]]
  * emits the same expression in portable SQL so an external engine
  * (or the DuckDB oracle) reproduces the exact z — keeping layout
  * queries hash-checkable.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of `a` and `b` (bit i of `a`
    * → z bit 2i, bit i of `b` → z bit 2i+1). Caller contract: both
    * inputs are in [0, 2^bits) — higher bits are silently masked off
    * (two values differing only above the mask share a z). `bits` ≤ 31
    * keeps the z positive in a signed 64-bit lane. */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as portable SQL over expressions `a` and `b`
    * (both already BIGINT-valued SQL). */
  def zvalueSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) | (((($b) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Scale `c` from its value range [lo, hi] onto the z grid
    * [0, 2^bits) with exact integer arithmetic. Interleaving RAW
    * values only clusters well when both dimensions occupy comparable
    * bit-widths with varying high bits; real keys rarely do (a date
    * column's epoch-day has constant high bits, a key column may span
    * a different magnitude), and then the z splits degenerate to the
    * wider dimension. Scaling both inputs first makes every z bit
    * carry real entropy from its dimension — always z-order on scaled
    * values unless the domains are already aligned. */
  def scaleTo(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi >= lo, s"empty range [$lo, $hi]")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val d = hi - lo + 1L
    require(d <= (Long.MaxValue >> bits),
      s"range width $d * 2^$bits overflows the 64-bit scale arithmetic")
    // exact 64-bit integer division (SQL `div`): the double-division
    // spelling would be exact only while the dividend fits a double's
    // 53-bit mantissa — above that the long→double rounding can land
    // one grid cell low
    val x = (c.cast("long") - lit(lo)) * lit(1L << bits)
    ExpressionUtilsBridge.intDiv(x, lit(d))
  }

  /** Scala-side reference (for specs): interleave two ints. */
  private[graft] def zvalueRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  /** Write `df` into `nFiles` parquet files clustered by the z-value
    * of `(a, b)`: each file covers one contiguous z range = a bounded
    * rectangle stack in (a, b), so footer min/max stats on a AND b
    * both prune. The z column itself is not written — it is a layout
    * key, not data. */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
      a: Column, b: Column, bits: Int): Unit = {
    require(nFiles > 0, s"nFiles must be > 0, got $nFiles")
    df.withColumn("__z", zvalue(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
