package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd sum of the unsigned byte values of a `binary` column.
  *
  * The byte-feature half of the multimodal path (SURVEY.md §2 L6):
  * `byte_sum(payload) / octet_length(payload)` is the byte-mean
  * feature, computed entirely inside whole-stage codegen — no RDD
  * hop, no per-byte interpreted lambda, and pushdown/pruning below
  * the projection stay intact (the round-2 `mapPartitions` spelling
  * severed both).
  */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_sum requires a binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $b.length; $i++) { $s += $b[$i] & 0xff; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
