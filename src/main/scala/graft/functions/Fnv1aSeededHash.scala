package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a whose initial state (seed) is itself an expression — the
  * reference's `create_init` hash family
  * (`/root/reference/src/algo/fnv1a.rs:26-28`) with a runtime-varying
  * family index. This is what lets a higher-order function compute a
  * MinHash signature: `transform(sequence(0, n-1), i -> min over
  * shingles of fnv1a_seeded_dyn(seed(i), shingle))` keeps the whole
  * signature inside codegen, no UDF.
  *
  * `children.head` is the seed (LongType); the rest are hashed in order
  * with chained state exactly like [[Fnv1aHash]]. Seeding with
  * [[Fnv1aCore.OffsetBasis]] makes it identical to the unseeded hash.
  */
case class Fnv1aSeededHash(children: Seq[Expression]) extends Expression {

  private def seedChild: Expression = children.head
  private def dataChildren: Seq[Expression] = children.tail

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "fnv1a_seeded"

  private def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         StringType | BinaryType | DateType | TimestampType |
         TimestampNTZType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length < 2)
      TypeCheckResult.TypeCheckFailure(
        "fnv1a_seeded requires a seed and at least one argument")
    else if (seedChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"fnv1a_seeded: seed must be bigint, got ${seedChild.dataType.catalogString}")
    else dataChildren.map(_.dataType).find(!supported(_)) match {
      case Some(dt) => TypeCheckResult.TypeCheckFailure(
        s"fnv1a_seeded: unsupported input type ${dt.catalogString} " +
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
    case other => throw new IllegalStateException(s"fnv1a_seeded: unsupported type $other")
  }

  override def eval(input: InternalRow): Any = {
    val seedV = seedChild.eval(input)
    if (seedV == null) return null
    var state = seedV.asInstanceOf[Long]
    var i = 0
    val data = dataChildren
    while (i < data.length) {
      val v = data(i).eval(input)
      if (v == null) return null
      state = hashValue(data(i).dataType, v, state)
      i += 1
    }
    state
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val core = Fnv1aCore.getClass.getName.stripSuffix("$")
    val state = ctx.freshName("fnvState")
    val seedCode = {
      val g = seedChild.genCode(ctx)
      val assign = s"$state = ${g.value};"
      val guarded = if (seedChild.nullable) {
        s"""
           |if (${g.isNull}) { ${ev.isNull} = true; }
           |else { $assign }
         """.stripMargin
      } else assign
      s"""
         |${g.code}
         |$guarded
       """.stripMargin
    }
    val childCode = dataChildren.map { child =>
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
        case other => throw new IllegalStateException(s"fnv1a_seeded: unsupported type $other")
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
        |long $state = 0L;
        |$seedCode
        |$childCode
        |${CodeGenerator.javaType(dataType)} ${ev.value} = ${ev.isNull} ? 0L : $state;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
