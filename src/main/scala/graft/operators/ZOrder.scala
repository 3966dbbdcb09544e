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

  /** The slot layout of a d-dimensional interleave with per-dimension
    * bit budgets: round r hands one z slot to every dimension whose
    * budget exceeds r, in declaration order — so low-order bits of
    * every dimension pack into the low z bits (coarse cells split all
    * dimensions first), and a dimension with a bigger budget keeps
    * splitting alone after the others exhaust. Equal budgets reproduce
    * [[zvalue]]'s layout exactly. Returns (dim index, source bit,
    * z position). */
  private def zSlots(bits: Seq[Int]): Seq[(Int, Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int, Int)]
    var z = 0
    for (r <- 0 until bits.max; i <- bits.indices if bits(i) > r) {
      out += ((i, r, z)); z += 1
    }
    out.result()
  }

  /** Morton code of d ≥ 2 dimensions with PER-DIMENSION bit budgets —
    * the general form of [[zvalue]] (which it reproduces bit-for-bit
    * at d = 2 with equal budgets). Unequal budgets are the practical
    * default: give a high-cardinality key 16 bits and a day column 10,
    * and the z splits keep carrying real entropy instead of burning
    * slots on a dimension that stopped distinguishing files. Same
    * caller contract per dimension as [[zvalue]]: values in
    * [0, 2^bits_i), higher bits masked off; budgets must sum to ≤ 63
    * to keep z positive in a signed 64-bit lane. */
  def zvalueN(dims: Seq[(Column, Int)]): Column = {
    require(dims.size >= 2, s"zvalueN needs >= 2 dimensions, got ${dims.size}")
    dims.foreach { case (_, b) =>
      require(b >= 1 && b <= 31, s"bits must be in [1,31], got $b") }
    val total = dims.map(_._2).sum
    require(total <= 63, s"bit budgets sum to $total > 63")
    val longs = dims.map(_._1.cast("long"))
    zSlots(dims.map(_._2)).map { case (i, b, z) =>
      shiftleft(shiftright(longs(i), b).bitwiseAND(lit(1L)), z)
    }.reduce(_ bitwiseOR _)
  }

  /** [[zvalueN]] as portable SQL over BIGINT-valued expressions. */
  def zvalueNSql(dims: Seq[(String, Int)]): String = {
    require(dims.size >= 2, s"zvalueN needs >= 2 dimensions, got ${dims.size}")
    require(dims.map(_._2).sum <= 63, "bit budgets sum past 63")
    zSlots(dims.map(_._2)).map { case (i, b, z) =>
      s"((((${dims(i)._1}) >> $b) & 1) << $z)"
    }.mkString("(", " | ", ")")
  }

  /** Scala-side reference (for specs): d-dim interleave. */
  private[graft] def zvalueNRef(vals: Seq[Long], bits: Seq[Int]): Long =
    zSlots(bits).foldLeft(0L) { case (acc, (i, b, z)) =>
      acc | (((vals(i) >> b) & 1L) << z)
    }

  /** Write `df` clustered by the d-dimensional z-value: every file
    * covers a bounded box in ALL d dimensions, so footer min/max
    * stats prune reads for predicates on any of them. */
  def writeZOrderedN(df: DataFrame, path: String, nFiles: Int,
      dims: Seq[(Column, Int)]): Unit = {
    require(nFiles > 0, s"nFiles must be > 0, got $nFiles")
    df.withColumn("__z", zvalueN(dims))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
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
