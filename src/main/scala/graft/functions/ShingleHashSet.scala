package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingle HASHES of a single-spaced text column,
  * in one pass over the UTF-8 bytes — the array-valued sibling of the
  * [[ShingleHashes]] generator and the front end of the MinHash
  * pipeline.
  *
  * Identity contract (must equal the HOF spelling it replaces,
  * asserted in ShingleHashesSpec): a token hashes as `fnv1a(token)`; a
  * 3-gram's identity is the chained hash of its three token hashes
  * (`fnv1a(h1, h2, h3)` — composite-key chaining, fnv1a.rs:9-11);
  * duplicates are dropped keeping first occurrence; texts with fewer
  * than 3 tokens fall back to ONE whole-text shingle — the chain of
  * ALL token hashes from the offset basis. Null input → null.
  *
  * Versus `transform(split(text)) → token-hash transform → 3-gram
  * transform → array_distinct` this materializes no token array, no
  * per-element interpreted lambda invocations, and hashes each byte
  * exactly once (plus 24 bytes of long-chaining per gram). Generates
  * code like its sibling kernels: the emitted Java is one static call
  * into [[ShingleHashSet.compute]] on the value pipeline — no
  * CodegenFallback row materialization, no per-row expression-tree
  * dispatch (the same pattern Spark's own regexp expressions use for
  * loop-heavy kernels).
  */
case class ShingleHashSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hash_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set requires a string column, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { str =>
      // static forwarder call — stays on the value pipeline inside the
      // enclosing WholeStageCodegen span
      s"${ev.value} = graft.functions.ShingleHashSet.compute($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashSet {

  /** The kernel (called from generated code via the static forwarder).
    * One pass: hash each space-delimited token (ASCII space cannot
    * occur inside a multi-byte UTF-8 sequence, so byte splitting is
    * UTF-8-safe; empty tokens hash like fnv1a(""), matching split). */
  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val tokenHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var state = Fnv1aCore.OffsetBasis
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        tokenHashes += state
        state = Fnv1aCore.OffsetBasis
      } else state = Fnv1aCore.iterate(state, bytes(i))
      i += 1
    }
    tokenHashes += state
    val n = tokenHashes.length
    if (n < 3) {
      // whole-text shingle: chain of all token hashes from the basis
      var h = Fnv1aCore.OffsetBasis
      var t = 0
      while (t < n) { h = Fnv1aCore.hashLong(tokenHashes(t), h); t += 1 }
      new GenericArrayData(Array(h))
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var g = 0
      while (g + 2 < n) {
        seen.add(Fnv1aCore.hashLong(tokenHashes(g + 2),
          Fnv1aCore.hashLong(tokenHashes(g + 1),
            Fnv1aCore.hashLong(tokenHashes(g), Fnv1aCore.OffsetBasis))))
        g += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }
}
