package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch aggregator (SURVEY.md §2 U3): folds rows of
  * pre-hashed shingle sets into one MinHash signature PER GROUP — the
  * mergeable-sketch form of the per-document signature in
  * graft.queries.Pipeline. Lane s applies the reference's seeded hash
  * family (`create_init`, /root/reference/src/algo/fnv1a.rs:26-28) to
  * each 8-byte shingle hash and keeps the minimum.
  *
  * Because min is associative and commutative the buffer is an
  * algebraic aggregate: Spark computes partial signatures map-side and
  * merges them at the final stage — group signatures cost one shuffle
  * of 64 longs per group regardless of group size, the sketch property
  * that makes set-similarity viable at 100 TB.
  *
  * Estimated Jaccard between two groups = fraction of equal lanes
  * (unbiased; stderr ≈ sqrt(J(1-J)/64) for 64 lanes).
  */
class MinHashAgg(seeds: Array[Long])
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(seeds.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHashes: Seq[Long]): Array[Long] = {
    var s = 0
    while (s < seeds.length) {
      val seed = seeds(s)
      val it = shingleHashes.iterator
      while (it.hasNext) {
        val v = Fnv1aCore.hashLong(it.next(), seed)
        if (v < buf(s)) buf(s) = v
      }
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var s = 0
    while (s < a.length) { if (b(s) < a(s)) a(s) = b(s); s += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
