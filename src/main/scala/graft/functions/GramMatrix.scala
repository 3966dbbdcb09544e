package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Upper-triangle Gram-matrix buffer: d·(d+1)/2 exact integer
  * micro-sums of pairwise products, plus the vector count.
  *
  * Each incoming vector contributes floor(xᵢ·xⱼ·10⁶ + 0.5) per pair
  * (i ≤ j) — the per-ROW quantization that makes the partial sums
  * exact longs, associative and partition-order-free (the QueryUtil
  * dsum contract lifted to a matrix). Buffer size is O(d²) per TASK,
  * independent of row count — the property that makes X^T X over 10⁹
  * vectors one ordinary aggregation pass: partials combine map-side,
  * and only d·(d+1)/2 longs ever cross the wire per partition.
  *
  * Overflow headroom (the dsum convention, stated here because the
  * micro-sums are plain longs with no runtime guard): each cell sum
  * must stay under 2⁶³ ≈ 9.2e18, i.e. rows · max|xᵢ·xⱼ| · 10⁶ <
  * 9.2e18 — at 10⁹ rows that bounds element magnitudes to
  * |x| ≲ 95 (x² ≤ 9.2e3); at unit-normalized embeddings (|x| ≤ 1,
  * the intended input) the bound allows ~9e12 rows. Inputs with
  * element magnitudes ~1e3 overflow SILENTLY at ~1e7 rows — callers
  * outside the unit-scale envelope must pre-scale the vectors (the
  * corr_matrix query standardizes per column first) or take the
  * decimal lane (aggregate in DECIMAL via dsum-style SQL) instead.
  */
final class GramBuffer(val dim: Int) {
  val cells = new Array[Long](dim * (dim + 1) / 2)
  var count: Long = 0L

  def add(v: Array[Double]): Unit = {
    count += 1L
    var k = 0
    var i = 0
    while (i < dim) {
      val xi = v(i)
      var j = i
      while (j < dim) {
        cells(k) += math.floor(xi * v(j) * 1e6 + 0.5).toLong
        k += 1; j += 1
      }
      i += 1
    }
  }

  def mergeFrom(o: GramBuffer): Unit = {
    count += o.count
    var k = 0
    while (k < cells.length) { cells(k) += o.cells(k); k += 1 }
  }

  def serialized(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * cells.length)
    bb.putLong(count)
    var k = 0
    while (k < cells.length) { bb.putLong(cells(k)); k += 1 }
    bb.array()
  }
}

object GramBuffer {
  def deserialize(dim: Int, bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(dim)
    buf.count = bb.getLong()
    var k = 0
    while (k < buf.cells.length) { buf.cells(k) = bb.getLong(); k += 1 }
    buf
  }
}

/** `gram_matrix(vec, d)` — typed imperative aggregate returning
  * `struct<cnt: bigint, cells: array<bigint>>`: the exact vector
  * count and the upper-triangle X^T X micro-sums in (i outer, j ≥ i)
  * order — cell k of pair (i, j) at k = i·d − i·(i−1)/2 + (j − i).
  *
  * SURVEY.md §2 row L80: the distributed linear-algebra primitive
  * behind covariance/PCA/whitening over an embedding column. Accepts
  * `array<float>` or `array<double>`; float→double widening is exact,
  * so the quantized products are engine-reproducible.
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with UnaryLike[Expression] {

  require(dim >= 1, s"gram_matrix dim must be >= 1, got $dim")

  override def prettyName: String = "gram_matrix"
  override def nullable: Boolean = false
  override val dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("cells", ArrayType(LongType, containsNull = false),
      nullable = false)))

  // lazy: child.dataType is only legal once the expression is resolved
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix requires array<float> or array<double>, got $other")
  }

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram_matrix(dim=$dim) got a length-${arr.numElements()} vector")
      val d = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        // fail fast: ArrayData.getDouble on a null slot silently
        // returns garbage/0.0, which would corrupt the matrix AND
        // diverge from the oracle (whose NULL products drop out of
        // its SUM) — a null element is a contract violation, not data
        require(!arr.isNullAt(i),
          s"gram_matrix: null element at position $i (vectors must be dense)")
        d(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: GramBuffer): Any =
    InternalRow(buffer.count, new GenericArrayData(buffer.cells))

  override def serialize(buffer: GramBuffer): Array[Byte] =
    buffer.serialized()

  override def deserialize(storageFormat: Array[Byte]): GramBuffer =
    GramBuffer.deserialize(dim, storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
}
