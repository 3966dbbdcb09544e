package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — the canonicalization step in front of any text dedup
  * key: two visually-identical strings (precomposed `é` vs
  * `e` + COMBINING ACUTE, full-width vs ASCII forms under NFKC)
  * must land in the same fingerprint bucket, or the dedup silently
  * keeps both.
  *
  * Spark ships no normalizer built-in; the alternatives are a Scala
  * UDF (serialization wall between codegen stages, opaque to the
  * optimizer) or this: a nullSafeCodeGen expression that stays inside
  * whole-stage codegen and calls the JDK's `java.text.Normalizer`
  * (the platform's ICU-equivalent implementation of UAX #15; the fast
  * path for already-normalized ASCII is a table-driven
  * `isNormalized` scan, so the common 100 TB case — ASCII text —
  * pays one linear check and zero allocation beyond the UTF-8
  * round-trip). The DuckDB oracle twin is `nfc_normalize()`; both
  * implement the same Unicode standard, asserted on golden vectors in
  * UnicodeNormalizeSpec.
  *
  * The normalization form is a plan-time literal (part of the
  * expression, not a child), so codegen embeds the `Form` enum
  * constant directly.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"unsupported normalization form: $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNormalize.normalize(
      input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($in.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Interpreted twin of the generated code — one place for both
    * paths' semantics. */
  def normalize(s: String, form: String): String =
    Normalizer.normalize(s, Normalizer.Form.valueOf(form))
}
