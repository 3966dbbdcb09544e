package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd sign-LSH band keys: one pass computes every hyperplane
  * dot product of `child` (an `array<double>` vector) and packs the
  * sign bits into per-band bucket keys — key b folds bits
  * [b·r, (b+1)·r) as `acc·2 + bit` (first plane = MSB).
  *
  * Replaces the interpreted three-layer HOF spelling (transform over a
  * 2-D plane literal → per-plane DotProductD → aggregate-over-slice
  * packing) with a single generated loop over `bands·r · dim`
  * multiplies; the dot accumulation is the same IEEE left-fold as
  * [[DotProductD]], so each bit is bitwise-identical to
  * `when(dotd(v, plane) >= 0, 1).otherwise(0)` (asserted in
  * SignBandKeysSpec).
  *
  * Null semantics mirror that spelling: a null INPUT is null; a vector
  * with a null element or the wrong length nulls every dot, and the
  * HOF's `otherwise(0)` turns every bit into 0 — so here all keys are
  * the all-zero fold.
  *
  * `planes` is the row-major flattening of the first `bands·r`
  * hyperplanes (each of length `dim`) — plain `Seq[Double]` so
  * Catalyst semantic equality and canonicalization work (an `Array`
  * would compare by reference).
  */
case class SignBandKeys(child: Expression, planes: Seq[Double],
    dim: Int, bitsPerBand: Int) extends UnaryExpression {

  require(dim > 0 && bitsPerBand > 0 && planes.nonEmpty &&
    planes.length % (dim.toLong * bitsPerBand) == 0,
    s"planes length ${planes.length} must be bands*bits*dim")

  private def bands: Int = planes.length / (dim * bitsPerBand)

  @transient private lazy val planeArr: Array[Double] = planes.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sign_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sign_band_keys requires array<double>, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val keys = new Array[Long](bands)
    var ok = arr.numElements() == dim
    var j = 0
    while (ok && j < dim) { if (arr.isNullAt(j)) ok = false; j += 1 }
    if (ok) {
      val p = planeArr
      var h = 0
      var band = 0
      var key = 0L
      var inBand = 0
      while (h < bands * bitsPerBand) {
        var s = 0.0
        val base = h * dim
        var i = 0
        while (i < dim) { s += arr.getDouble(i) * p(base + i); i += 1 }
        key = key * 2 + (if (s >= 0) 1L else 0L)
        inBand += 1
        if (inBand == bitsPerBand) { keys(band) = key; band += 1; key = 0L; inBand = 0 }
        h += 1
      }
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val p = ctx.addReferenceObj("signPlanes", planes.toArray, "double[]")
      val keys = ctx.freshName("keys")
      val ok = ctx.freshName("ok")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val key = ctx.freshName("key")
      val band = ctx.freshName("band")
      val inBand = ctx.freshName("inBand")
      s"""
         |final long[] $keys = new long[$bands];
         |boolean $ok = $arr.numElements() == $dim;
         |for (int $j = 0; $ok && $j < $dim; $j++) {
         |  if ($arr.isNullAt($j)) $ok = false;
         |}
         |if ($ok) {
         |  long $key = 0L; int $band = 0; int $inBand = 0;
         |  for (int $h = 0; $h < ${bands * bitsPerBand}; $h++) {
         |    double $s = 0.0;
         |    final int $base = $h * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $s += $arr.getDouble($i) * $p[$base + $i];
         |    }
         |    $key = $key * 2 + (($s >= 0) ? 1L : 0L);
         |    $inBand++;
         |    if ($inBand == $bitsPerBand) {
         |      $keys[$band] = $key; $band++; $key = 0L; $inBand = 0;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
