package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd 64-bit average hash (aHash — the classic perceptual
  * fingerprint) of a `binary` column, for the multimodal near-dup
  * lane (SURVEY.md §2 L105):
  *
  *  - stride-sample the payload to a 64-byte grid:
  *    `g(j) = payload[(j * len) / 64]`, j = 0..63 (the
  *    [[graft.operators.Multimodal.frameColumns]] thumbnail stride —
  *    the documented decoder seam; a real deployment feeds the
  *    codec's grayscale grid instead);
  *  - bit j set iff the sample sits ABOVE the grid mean, tested as
  *    the integer cross-multiply `64 * g(j) > Σ g` (no division);
  *  - hash = Σ bit_j << j (bit 63 lands in the sign bit — the value
  *    is a bit pattern, not a magnitude).
  *
  * Runs entirely inside whole-stage codegen: two bounded 64-step
  * loops per row, no per-sample interpreted lambda (the Column-level
  * `transform`/`conv(hex(substr(...)))` spelling of the same hash
  * cost ~10 ms/row interpreted — this expression replaces it).
  * Returns NULL for an empty payload (no grid to sample).
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ahash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ahash64 requires a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length == 0) null
    else {
      val n = bytes.length.toLong
      var sum = 0L
      val g = new Array[Long](64)
      var j = 0
      while (j < 64) {
        g(j) = bytes(((j * n) / 64L).toInt) & 0xffL
        sum += g(j)
        j += 1
      }
      var h = 0L
      j = 0
      while (j < 64) {
        if (64L * g(j) > sum) h |= (1L << j)
        j += 1
      }
      h
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val j = ctx.freshName("j")
      val g = ctx.freshName("g")
      val sum = ctx.freshName("sum")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |if ($b.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $n = (long) $b.length;
         |  long[] $g = new long[64];
         |  long $sum = 0L;
         |  for (int $j = 0; $j < 64; $j++) {
         |    $g[$j] = $b[(int) (($j * $n) / 64L)] & 0xffL;
         |    $sum += $g[$j];
         |  }
         |  long $h = 0L;
         |  for (int $j = 0; $j < 64; $j++) {
         |    if (64L * $g[$j] > $sum) $h |= (1L << $j);
         |  }
         |  ${ev.value} = $h;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
