package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression computing the reference's seedable 64-bit FNV-1a
  * over one or more columns (chained state = composite-key hashing,
  * `/root/reference/src/algo/fnv1a.rs:9-11`).
  *
  * Supported child types mirror the reference's `FNV1aIterator` impls
  * (fnv1a.rs:44-95): Boolean, Byte/Short/Int (4-byte LE i32 after
  * promotion), Long (8-byte LE), String (UTF-8 bytes), Binary (raw).
  * Any null input nulls the result.
  *
  * Generates straight-line JVM Long arithmetic inside whole-stage
  * codegen (O(1) per byte: one XOR, one multiply — the reference's cost
  * bound, fnv1a.rs:38-41), with an interpreted `eval` fallback.
  */
case class Fnv1aHash(children: Seq[Expression], seed: Long)
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "fnv1a"

  /** Dates hash as their i32 day count and timestamps as their i64
    * microsecond count — the canonical LE integer encodings of the
    * reference's `FNV1aIterator` impls (fnv1a.rs:68-79) applied to
    * Spark's internal representations. Engine extensions beyond the
    * reference (which hashed no fractional types): float/double hash
    * their normalized IEEE-754 bit pattern (Fnv1aCore.hashFloat/
    * hashDouble — -0.0 ≡ 0.0, canonical NaN, so hash is consistent
    * with SQL equality); decimals hash their unscaled integer — 8-byte
    * LE for precision ≤ 18, big-endian two's-complement minimal bytes
    * (BigInteger.toByteArray) above — the scale being fixed by the
    * column type. */
  private def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         StringType | BinaryType | DateType | TimestampType |
         TimestampNTZType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("fnv1a requires at least one argument")
    else children.map(_.dataType).find(!supported(_)) match {
      case Some(dt) => TypeCheckResult.TypeCheckFailure(
        s"fnv1a: unsupported input type ${dt.catalogString} " +
          "(supported: boolean, tinyint..bigint, float, double, " +
          "decimal, string, binary, date, timestamp, timestamp_ntz)")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  private def hashValue(dt: DataType, v: Any, state: Long): Long = dt match {
    case BooleanType => Fnv1aCore.hashBoolean(v.asInstanceOf[Boolean], state)
    case ByteType    => Fnv1aCore.hashInt(v.asInstanceOf[Byte].toInt, state)
    case ShortType   => Fnv1aCore.hashInt(v.asInstanceOf[Short].toInt, state)
    case IntegerType | DateType => Fnv1aCore.hashInt(v.asInstanceOf[Int], state)
    case LongType | TimestampType | TimestampNTZType =>
      Fnv1aCore.hashLong(v.asInstanceOf[Long], state)
    case StringType  => Fnv1aCore.hashBytes(v.asInstanceOf[UTF8String].getBytes, state)
    case BinaryType  => Fnv1aCore.hashBytes(v.asInstanceOf[Array[Byte]], state)
    case FloatType   => Fnv1aCore.hashFloat(v.asInstanceOf[Float], state)
    case DoubleType  => Fnv1aCore.hashDouble(v.asInstanceOf[Double], state)
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      Fnv1aCore.hashLong(v.asInstanceOf[Decimal].toUnscaledLong, state)
    case _: DecimalType =>
      Fnv1aCore.hashBytes(
        v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue.toByteArray, state)
    case other => throw new IllegalStateException(s"fnv1a: unsupported type $other")
  }

  override def eval(input: InternalRow): Any = {
    var state = seed
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      state = hashValue(children(i).dataType, v, state)
      i += 1
    }
    state
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val core = Fnv1aCore.getClass.getName.stripSuffix("$")
    val state = ctx.freshName("fnvState")
    val childCode = children.map { child =>
      val g = child.genCode(ctx)
      val update = child.dataType match {
        case BooleanType          => s"$state = $core.hashBoolean(${g.value}, $state);"
        case ByteType | ShortType => s"$state = $core.hashInt((int) ${g.value}, $state);"
        case IntegerType | DateType => s"$state = $core.hashInt(${g.value}, $state);"
        case LongType | TimestampType | TimestampNTZType =>
          s"$state = $core.hashLong(${g.value}, $state);"
        case StringType           => s"$state = $core.hashBytes(${g.value}.getBytes(), $state);"
        case BinaryType           => s"$state = $core.hashBytes(${g.value}, $state);"
        case FloatType            => s"$state = $core.hashFloat(${g.value}, $state);"
        case DoubleType           => s"$state = $core.hashDouble(${g.value}, $state);"
        case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
          s"$state = $core.hashLong(${g.value}.toUnscaledLong(), $state);"
        case _: DecimalType =>
          s"$state = $core.hashBytes(${g.value}.toJavaBigDecimal().unscaledValue().toByteArray(), $state);"
        case other => throw new IllegalStateException(s"fnv1a: unsupported type $other")
      }
      val nullCheck = if (child.nullable) {
        s"""
           |if (${g.isNull}) { ${ev.isNull} = true; }
           |else { $update }
         """.stripMargin
      } else update
      s"""
         |if (!${ev.isNull}) {
         |  ${g.code}
         |  $nullCheck
         |}
       """.stripMargin
    }.mkString("\n")

    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long $state = ${seed}L;
        |$childCode
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $state;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
