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
