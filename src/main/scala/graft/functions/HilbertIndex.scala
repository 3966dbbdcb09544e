package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** d=2 Hilbert curve index — the locality-optimal alternative to the
  * Z-order interleave (Y1): consecutive Hilbert indices are ALWAYS
  * grid neighbors (Manhattan distance 1, pinned in HilbertSpec),
  * where consecutive Z values jump across the plane at every power-of-
  * two boundary. For a range-probed two-column layout that means
  * strictly fewer files straddling any query rectangle — the reason
  * lakehouse OPTIMIZE implementations offer Hilbert clustering next
  * to Z-order.
  *
  * Algorithm: the classic bit-descent spelling (Hilbert 1891 via the
  * public-domain xy2d formulation): per bit plane s from the top,
  * accumulate s²·q where q is the quadrant under the current
  * rotation, then rotate/reflect the frame. Intermediates are masked
  * into [0, s) so every value stays nonnegative — identical semantics
  * in Java and SQL integer arithmetic.
  */
object HilbertCore {

  /** Hilbert index of (x, y) on the 2^bits × 2^bits grid. Inputs must
    * be in [0, 2^bits); callers mask/clamp (the ZOrder contract). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) (s - 1 - y) & (s - 1) else y
        val ny = if (rx == 1L) (s - 1 - x) & (s - 1) else x
        x = nx
        y = ny
      }
      s >>= 1
    }
    d
  }

  /** General-d Hilbert index (Skilling, "Programming the Hilbert
    * curve", AIP Conf. Proc. 707, 2004 — the public-domain transform):
    * coordinates → Hilbert transpose (inverse-undo + Gray encode),
    * then a plane-major bit interleave (top plane first, dimension 0
    * most significant within a plane), giving h ∈ [0, 2^(d·bits)).
    * Inputs must be in [0, 2^bits) — the ZOrder masking contract.
    * NOTE: a distinct curve family from [[xy2d]] at d = 2 (different
    * orientation convention); both satisfy the adjacency invariant. */
  def axesToIndex(bits: Int, coords: Array[Long]): Long = {
    val n = coords.length
    val X = coords.clone()
    val M = 1L << (bits - 1)
    // inverse undo
    var q = M
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((X(i) & q) != 0L) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = M
    while (q > 1) { if ((X(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // interleave: plane p from the top, dim 0 first within a plane
    var h = 0L
    var plane = bits - 1
    while (plane >= 0) {
      i = 0
      while (i < n) { h = (h << 1) | ((X(i) >> plane) & 1L); i += 1 }
      plane -= 1
    }
    h
  }

  /** Inverse of [[axesToIndex]] — the spec's adjacency-invariant
    * witness (consecutive h must be grid neighbors). */
  def indexToAxes(bits: Int, n: Int, h: Long): Array[Long] = {
    val X = new Array[Long](n)
    // un-interleave
    var k = n * bits - 1
    var plane = bits - 1
    while (plane >= 0) {
      var i = 0
      while (i < n) {
        X(i) |= ((h >> k) & 1L) << plane
        k -= 1; i += 1
      }
      plane -= 1
    }
    // Gray decode
    val t = X(n - 1) >> 1
    var i = n - 1
    while (i > 0) { X(i) ^= X(i - 1); i -= 1 }
    X(0) ^= t
    // undo excess work
    var q = 2L
    val N = 2L << (bits - 1)
    while (q != N) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((X(i) & q) != 0L) X(0) ^= p
        else { val t2 = (X(0) ^ X(i)) & p; X(0) ^= t2; X(i) ^= t2 }
        i -= 1
      }
      q <<= 1
    }
    X
  }
}

/** Codegen'd Catalyst expression for [[HilbertCore.xy2d]] — the whole
  * bit descent runs inside whole-stage codegen (a per-row loop of
  * `bits` iterations of integer ops; no UDF, no boxing).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert2 requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertCore.xy2d(bits, xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val nx = ctx.freshName("hnx")
      s"""
         |long $x = $xv; long $y = $yv; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $nx = ($rx == 1L) ? (($s - 1 - $y) & ($s - 1)) : $y;
         |    $y = ($rx == 1L) ? (($s - 1 - $x) & ($s - 1)) : $x;
         |    $x = $nx;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Catalyst expression for [[HilbertCore.axesToIndex]] —
  * general-d Hilbert index of `children` coordinates on the 2^bits
  * grid, the whole Skilling transform inside whole-stage codegen (one
  * per-row loop nest of integer ops over a d-element local array; no
  * UDF, no boxing). NULL in any coordinate → NULL index. */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.size >= 2 && children.size <= 8,
    s"hilbertN takes 2 to 8 coordinates, got ${children.size}")
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
  require(children.size * bits <= 63,
    s"${children.size} dims x $bits bits overflow the signed index lane")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbertn"

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType).find(_ != LongType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"hilbertn requires bigint coordinates, got ${t.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertCore.axesToIndex(bits, coords)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("hx")
    val q = ctx.freshName("hq")
    val p = ctx.freshName("hp")
    val t = ctx.freshName("ht")
    val i = ctx.freshName("hi")
    val h = ctx.freshName("hh")
    val pl = ctx.freshName("hpl")
    val M = 1L << (bits - 1)
    val loadCoords = evals.zipWithIndex.map { case (e, idx) =>
      s"$xs[$idx] = ${e.value};"
    }.mkString("\n")
    val nullChecks = evals.map(e => e.isNull).mkString(" || ")
    val code =
      s"""
         |${evals.map(_.code).mkString("\n")}
         |boolean ${ev.isNull} = $nullChecks;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long[] $xs = new long[$n];
         |  $loadCoords
         |  for (long $q = ${M}L; $q > 1; $q >>= 1) {
         |    long $p = $q - 1;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (($xs[$i] & $q) != 0L) $xs[0] ^= $p;
         |      else { long $t = ($xs[0] ^ $xs[$i]) & $p;
         |             $xs[0] ^= $t; $xs[$i] ^= $t; }
         |    }
         |  }
         |  for (int $i = 1; $i < $n; $i++) $xs[$i] ^= $xs[$i - 1];
         |  long $t = 0L;
         |  for (long $q = ${M}L; $q > 1; $q >>= 1)
         |    if (($xs[$n - 1] & $q) != 0L) $t ^= $q - 1;
         |  for (int $i = 0; $i < $n; $i++) $xs[$i] ^= $t;
         |  long $h = 0L;
         |  for (int $pl = ${bits - 1}; $pl >= 0; $pl--)
         |    for (int $i = 0; $i < $n; $i++)
         |      $h = ($h << 1) | (($xs[$i] >> $pl) & 1L);
         |  ${ev.value} = $h;
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(code)).code())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
