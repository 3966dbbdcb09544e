package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd MinHash signature over pre-hashed shingles: lane s of the
  * output is min over the input elements h of
  * `fnv1a_seeded(seeds(s), h)` — the reference's seeded hash family
  * (`create_init`, /root/reference/src/algo/fnv1a.rs:26-28) swept in
  * ONE pass over the input with all lane minima held in registers,
  * instead of `seeds.length` interpreted `array_min(transform(...))`
  * lambda sweeps. Semantics are identical to that HOF spelling:
  * signed Long minima, null elements skipped (array_min ignores
  * nulls), and an input with no non-null elements yields all-null
  * lanes.
  */
case class MinHashSignature(child: Expression, seeds: Seq[Long])
    extends UnaryExpression {

  // Seq (not Array) as the constructor param: Array has reference
  // equality, which would break Catalyst semantic equality /
  // canonicalization (CSE, exchange reuse) between otherwise-equal
  // expressions. The hot loop still runs over a plain array.
  @transient private lazy val seedArr: Array[Long] = seeds.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<bigint>, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sa = seedArr
    val mins = Array.fill(sa.length)(Long.MaxValue)
    var any = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var s = 0
        while (s < sa.length) {
          val v = Fnv1aCore.hashLong(h, sa(s))
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](sa.length))
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val core = Fnv1aCore.getClass.getName.stripSuffix("$")
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds.toArray, "long[]")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[$seedsRef.length];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $any = true;
         |    final long $h = $arr.getLong($i);
         |    for (int $s = 0; $s < $seedsRef.length; $s++) {
         |      final long $v = $core.hashLong($h, $seedsRef[$s]);
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |}
         |${ev.value} = $any
         |  ? new org.apache.spark.sql.catalyst.util.GenericArrayData($mins)
         |  : new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$seedsRef.length]);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
