package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UDTF / generator (SURVEY §2 U4): emits one row per positional word
  * 3-gram of a single-spaced text column — `(gram_no, gram_hash)`,
  * where `gram_hash` chains the three token hashes through the
  * reference hash (composite-key chaining, fnv1a.rs:9-11), identical
  * to `fnv1a(fnv1a(w1), fnv1a(w2), fnv1a(w3))` over the split tokens.
  *
  * Versus the `explode(transform(...))` spelling, no gram ARRAY is
  * ever materialized per row — tokens are hashed in one pass over the
  * UTF-8 bytes (ASCII space cannot occur inside a multi-byte
  * sequence, so byte-level splitting is UTF-8-safe) and grams stream
  * out one row at a time; per-row state is the token-hash buffer
  * (8 bytes/token). Texts with fewer than 3 tokens emit no rows;
  * null emits no rows.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("gram_no", IntegerType, nullable = false),
    StructField("gram_hash", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string column, got ${dt.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    if (s == null) return Iterator.empty
    val bytes = s.asInstanceOf[UTF8String].getBytes
    // one pass: hash each space-delimited token
    val tokenHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var state = Fnv1aCore.OffsetBasis
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        tokenHashes += state
        state = Fnv1aCore.OffsetBasis
      } else {
        state = Fnv1aCore.iterate(state, bytes(i))
      }
      i += 1
    }
    tokenHashes += state // final token (empty text hashes like fnv1a(""))
    if (tokenHashes.length < 3) Iterator.empty
    else new Iterator[InternalRow] {
      private var g = 0
      override def hasNext: Boolean = g < tokenHashes.length - 2
      override def next(): InternalRow = {
        val h = Fnv1aCore.hashLong(tokenHashes(g + 2),
          Fnv1aCore.hashLong(tokenHashes(g + 1),
            Fnv1aCore.hashLong(tokenHashes(g), Fnv1aCore.OffsetBasis)))
        g += 1
        new GenericInternalRow(Array[Any](g, h))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
