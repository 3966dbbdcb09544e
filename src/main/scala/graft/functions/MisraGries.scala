package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary over string keys: at most `cap`
  * counters, exact total, and the MERGEABLE deterministic guarantee
  * that every key with true frequency > n/(cap+1) is present in the
  * summary (counts may UNDERestimate by at most n/(cap+1); the
  * summary never invents keys). Merging two summaries keeps the
  * guarantee for the combined stream (the mergeable-summaries
  * construction: add counts keyed, then subtract the (cap+1)-largest
  * count from all and drop non-positives).
  *
  * This is the candidate-generation half of exact heavy hitters at
  * 100 TB: the full `groupBy(term)` shuffles the whole vocabulary;
  * one ObjectHashAggregate pass of `cap`-bounded summaries ships a
  * few KB per partition, and an exact recount of the ≤ `cap`
  * candidates (bloom-style one-sided overshoot + confirm) restores
  * exactness — see the `heavy_hitters` query.
  */
final class MisraGriesBuffer(val cap: Int) {
  var total: Long = 0L
  val counters = new java.util.HashMap[String, Long](cap * 2)

  def add(key: String, w: Long = 1L): Unit = {
    require(w > 0L, s"misra_gries weight must be > 0, got $w")
    total += w
    val cur = counters.get(key)
    if (cur != 0L || counters.containsKey(key)) counters.put(key, cur + w)
    else {
      // Weighted MG (Berinde et al.): insert the arriving key at its
      // full weight, then restore the cap by subtracting the
      // (cap+1)-th largest count from everything. Decrementing by w
      // WITHOUT inserting would discard the arrival's entire weight
      // and break the > n/(cap+1) guarantee for heavy weighted keys.
      counters.put(key, w)
      if (counters.size > cap) shrinkToCap()
    }
  }

  /** Subtract the (cap+1)-th largest count from every counter and
    * drop non-positives — counts only ever UNDERestimate, so the
    * guarantee direction is preserved; afterwards at most `cap`
    * counters remain (everything at or below the subtrahend dies). */
  private def shrinkToCap(): Unit = {
    val counts = new Array[Long](counters.size)
    var i = 0
    val vit = counters.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val sub = counts(counts.length - cap - 1)
    val eit = counters.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val nv = e.getValue - sub
      if (nv <= 0L) eit.remove() else e.setValue(nv)
    }
  }

  def mergeFrom(o: MisraGriesBuffer): Unit = {
    total += o.total
    val it = o.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counters.get(e.getKey)
      counters.put(e.getKey, cur + e.getValue)
    }
    if (counters.size > cap) shrinkToCap()
  }

  /** (key, estimate) pairs, count DESC then key ASC — deterministic
    * output order for a deterministic input multiset. */
  def sorted(): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counters.size)
    var i = 0
    val it = counters.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortBy { case (k, c) => (-c, k) }
  }

  def serialized(): Array[Byte] = {
    val items = sorted()
    val keyBytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 12 + keyBytes.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(total).putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(keyBytes(i).length).put(keyBytes(i)).putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }
}

object MisraGriesBuffer {
  def deserialize(cap: Int, bytes: Array[Byte]): MisraGriesBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MisraGriesBuffer(cap)
    buf.total = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      buf.counters.put(new String(kb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }
}

/** `misra_gries(key, cap)` → `struct<n: bigint, items: array<struct<
  * key: string, est: bigint>>>`: exact non-null input count plus the
  * ≤ `cap` candidate frequent keys with underestimating counts.
  * NULL keys are skipped (they are not items). */
case class MisraGriesAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer]
  with UnaryLike[Expression] {

  require(cap >= 1, s"misra_gries cap must be >= 1, got $cap")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override val dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a STRING key column, got ${child.dataType}")

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(cap)

  override def update(buffer: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    // UTF8String backs a reused buffer — copy to an owned String key
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MisraGriesBuffer): Any = {
    val items = buffer.sorted().map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    InternalRow(buffer.total, new GenericArrayData(items))
  }

  override def serialize(buffer: MisraGriesBuffer): Array[Byte] =
    buffer.serialized()

  override def deserialize(storageFormat: Array[Byte]): MisraGriesBuffer =
    MisraGriesBuffer.deserialize(cap, storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
