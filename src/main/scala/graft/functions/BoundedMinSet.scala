package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group membership buffer: an exact element count plus the
  * `cap` SMALLEST values seen, kept in a fixed-size primitive max-heap.
  *
  * This is the memory contract `collect_list` can't give: a group with
  * 10⁸ members costs the same `cap` longs of aggregation-buffer memory
  * as a group with 10 — which is what makes a single aggregation pass
  * over LSH band buckets safe on an adversarial corpus (the
  * CandidatePairs back end; a degenerate bucket must not be able to
  * OOM its reducer). When the group has ≤ cap members the kept set is
  * the complete membership.
  */
final class BoundedMinSetBuffer(val cap: Int) {
  var count: Long = 0L
  // Binary max-heap over the kept (smallest) values: heap(0) is the
  // largest kept value, i.e. the eviction candidate. Primitive array —
  // no boxing on the per-row hot path.
  private val heap = new Array[Long](cap)
  private var n: Int = 0

  def add(v: Long): Unit = { count += 1L; keep(v) }

  private def keep(v: Long): Unit =
    if (n < cap) {
      // sift up
      var i = n
      heap(i) = v
      n += 1
      while (i > 0 && heap((i - 1) / 2) < heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v < heap(0)) {
      // replace the max, sift down
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && heap(l) > heap(m)) m = l
        if (r < n && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
    }

  def mergeFrom(o: BoundedMinSetBuffer): Unit = {
    count += o.count
    var i = 0
    while (i < o.n) { keep(o.heap(i)); i += 1 }
  }

  /** Kept values in ascending order (a fresh array). */
  def sortedKept(): Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, n)
    java.util.Arrays.sort(out)
    out
  }

  def serialized(): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * n)
    bb.putLong(count).putInt(n)
    var i = 0
    while (i < n) { bb.putLong(heap(i)); i += 1 }
    bb.array()
  }
}

object BoundedMinSetBuffer {
  def deserialize(cap: Int, bytes: Array[Byte]): BoundedMinSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BoundedMinSetBuffer(cap)
    buf.count = bb.getLong()
    val n = bb.getInt()
    var i = 0
    // re-inserting keeps the heap invariant; counts were already final
    while (i < n) { buf.add(bb.getLong()); buf.count -= 1L; i += 1 }
    buf
  }
}

/** `bounded_min_set(id, cap)` — typed imperative aggregate returning
  * `struct<cnt: bigint, ids: array<bigint>>`: the exact (non-null) row
  * count of the group and its `cap` smallest ids, ascending.
  *
  * SURVEY.md §2 row U3 (custom aggregation surface), built for the
  * skew-proof candidate-pair operator: one ObjectHashAggregate pass
  * yields complete memberships for every bounded bucket AND the exact
  * size of every hot one, with per-group state capped at `cap` longs
  * regardless of bucket skew.
  */
case class BoundedMinSetAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinSetBuffer]
  with UnaryLike[Expression] {

  require(cap >= 1, s"bounded_min_set cap must be >= 1, got $cap")

  override def prettyName: String = "bounded_min_set"
  override def nullable: Boolean = false
  override val dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_min_set requires a BIGINT id column, got ${child.dataType}")

  override def createAggregationBuffer(): BoundedMinSetBuffer =
    new BoundedMinSetBuffer(cap)

  override def update(buffer: BoundedMinSetBuffer, input: InternalRow): BoundedMinSetBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BoundedMinSetBuffer, other: BoundedMinSetBuffer): BoundedMinSetBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BoundedMinSetBuffer): Any =
    InternalRow(buffer.count, new GenericArrayData(buffer.sortedKept()))

  override def serialize(buffer: BoundedMinSetBuffer): Array[Byte] =
    buffer.serialized()

  override def deserialize(storageFormat: Array[Byte]): BoundedMinSetBuffer =
    BoundedMinSetBuffer.deserialize(cap, storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinSetAgg =
    copy(child = newChild)
}
