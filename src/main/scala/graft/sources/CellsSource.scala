package graft.sources

import java.util
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import graft.operators.IvfIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the [[IvfIndex.writeCellLayout]] IVF
  * cell layout — the ANN-flagship twin of [[PostingsSource]] /
  * [[BandsSource]]: a `cell` predicate against this source is pushed
  * INTO the scan and prunes unprobed cell directories at file-listing
  * time, runtime (DPP-style) filters from a probe-derived join narrow
  * the listing further at execution time
  * ([[SupportsRuntimeFiltering]]), and the scan reports statistics
  * over the PRUNED listing ([[SupportsReportStatistics]]) so a
  * probe-sized read broadcasts without a manual hint. At 100 TB this
  * is the nprobe/k contract made visible on the scan node itself —
  * "the probe touches 4/16 of the vectors" is the description string,
  * not a helper's claim.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.CellsSource")
  *     .option("path", layoutPath).load()
  *     .filter($"cell".isin(probedCells: _*))
  * }}}
  *
  * Unlike the term/band layouts (fixed schemas), a cell layout carries
  * whatever payload its builder assigned alongside the partition key —
  * raw vectors (`vec_id, v`), PQ codes (`vec_id, code_1..code_m`) — so
  * the connector infers the DATA schema from the layout's own parquet
  * footer and appends the `cell` partition column. Geometry (`k`,
  * `dim`) comes from the layout's `_graft_meta.json` stamp
  * ([[IvfIndex.writeCellLayout]]); a geometry-less layout is refused,
  * the [[BandsSource]] rule.
  *
  * Supported pushdown: EqualTo/In on `cell` (conjunctive value sets
  * INTERSECT). Everything else returns to Spark as a post-scan filter.
  * Column pruning is honored. Committed transactional batch
  * directories (`_batch-<id>`, the append-maintenance lane) are listed
  * alongside the base with the same cell pruning.
  */
class CellsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty,
      "graft.sources.CellsSource needs option 'path'")
    CellsSource.layoutSchema(SparkSession.active, path)
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft.sources.CellsSource needs option 'path'")
    // geometry-less layouts are refused at open time
    val (k, _) = IvfIndex.readCellMeta(SparkSession.active, path)
    new CellsTable(path, k, schema)
  }
}

object CellsSource {

  /** Data schema from the first data file's parquet footer, plus the
    * `cell` partition column (LongType — partition-directory values).
    * One footer read at plan time; the layout writer (ONE relation,
    * `partitionBy("cell")`) guarantees schema uniformity. */
  def layoutSchema(s: SparkSession, path: String): StructType = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val first = listCellDirs(fs, root).iterator.flatMap { case (dir, _) =>
      fs.listStatus(dir).iterator
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    }.take(1).toSeq.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"cell layout at $path has no data files"))
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(first, conf))
    val mt =
      try reader.getFooter.getFileMetaData.getSchema
      finally reader.close()
    StructType(mt.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, parquetToCatalyst(f), nullable = true)) :+
      StructField("cell", LongType, nullable = false))
  }

  /** The payload types a cell layout can carry through this reader. */
  private def parquetToCatalyst(
      f: org.apache.parquet.schema.Type): DataType = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    f match {
      case p: org.apache.parquet.schema.PrimitiveType =>
        p.getPrimitiveTypeName match {
          case INT64 => LongType
          case INT32 => IntegerType
          case DOUBLE => DoubleType
          case FLOAT => FloatType
          case BOOLEAN => BooleanType
          case BINARY => StringType
          case other => throw new IllegalArgumentException(
            s"unsupported cell-layout column type $other (${f.getName})")
        }
      case g: org.apache.parquet.schema.GroupType
          if g.getLogicalTypeAnnotation.isInstanceOf[
            org.apache.parquet.schema.LogicalTypeAnnotation
              .ListLogicalTypeAnnotation] =>
        // Spark 3-level list: group(LIST) { repeated group list
        // { element } }
        val elem = g.getType(0).asGroupType().getType(0)
          .asPrimitiveType().getPrimitiveTypeName
        elem match {
          case DOUBLE => ArrayType(DoubleType, containsNull = true)
          case FLOAT => ArrayType(FloatType, containsNull = true)
          case INT64 => ArrayType(LongType, containsNull = true)
          case other => throw new IllegalArgumentException(
            s"unsupported cell-layout array element $other (${f.getName})")
        }
      case other => throw new IllegalArgumentException(
        s"unsupported cell-layout column ${other.getName}")
    }
  }

  /** `(dir, cellId)` of every cell directory under `root` and its
    * committed `_batch-*` append roots. */
  private[sources] def listCellDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[(Path, Long)] = {
    val roots = root +: fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_batch-"))
      .map(_.getPath).sortBy(_.getName)
    roots.flatMap(r => fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(s => (s.getPath, s.getPath.getName.stripPrefix("cell=").toLong)))
  }
}

private[sources] class CellsTable(path: String, k: Int,
    tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_cells($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new CellsScanBuilder(path, k, tableSchema)
}

private[graft] class CellsScanBuilder(path: String, k: Int,
    tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  /** None = no cell predicate pushed → scan every cell. */
  private var cells: Option[Set[Long]] = None
  private var required: StructType = tableSchema

  private def cellValues(f: Filter): Option[Seq[Long]] = f match {
    case EqualTo("cell", v: Long) => Some(Seq(v))
    case EqualTo("cell", v: Int) => Some(Seq(v.toLong))
    case In("cell", vs) if vs.forall(v =>
      v.isInstanceOf[Long] || v.isInstanceOf[Int]) =>
      Some(vs.toSeq.map {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
      })
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) =
      filters.partition(cellValues(_).isDefined)
    pushed = supported
    // conjunction semantics: each filter's value set INTERSECTS
    val sets = supported.flatMap(cellValues(_).map(_.toSet))
    if (sets.nonEmpty) cells = Some(sets.reduce(_ intersect _))
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new CellsScan(path, k, required, cells, pushed,
      new SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private[graft] class CellsScan(path: String, k: Int,
    required: StructType, cells: Option[Set[Long]], pushed: Array[Filter],
    hconf: SerializableHadoopConf)
    extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportStatistics {

  /** Narrowed at execution time by [[filter]] — the DPP-style cell
    * narrowing a probe-derived join injects; runtime sets INTERSECT
    * the compile-time ones. */
  @volatile private var rtCells: Option[Set[Long]] = cells

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Seq("cell").filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("cell", vs) =>
      val cs = vs.collect {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue }.toSet
      rtCells = Some(rtCells.fold(cs)(_ intersect cs))
    case EqualTo("cell", v: java.lang.Long) =>
      rtCells = Some(rtCells.fold(Set(v.longValue))(
        _ intersect Set(v.longValue)))
    case _ => () // runtime filters are best-effort; unknown = no-op
  }

  /** Driver-side pruned listing `(file, cell, bytes)`: only probed
    * cells' directories are listed at all. */
  private[graft] def files: Seq[(String, Long, Long)] = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    val dirs = CellsSource.listCellDirs(fs, root)
    val kept = rtCells match {
      case Some(cs) => dirs.filter { case (_, c) => cs.contains(c) }
      case None => dirs
    }
    kept.flatMap { case (dir, c) =>
      fs.listStatus(dir).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => (f.getPath.toString, c, f.getLen))
    }
  }

  /** Statistics over the PRUNED listing — an nprobe-cell read reports
    * nprobe/k of the bytes, so Catalyst's autoBroadcastJoinThreshold
    * can elect to broadcast a probe-sized read without a hint. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = files.map(_._3).sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftCellsScan path=$path k=$k " +
      s"cells=${rtCells.map(_.toSeq.sorted.mkString("{", ",", "}"))
        .getOrElse("ALL")} files=${files.size} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (f, c, _) =>
      CellsInputPartition(f, c): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CellsReaderFactory(required, hconf)
}

private[sources] case class CellsInputPartition(file: String,
    cell: Long) extends InputPartition

private[sources] class CellsReaderFactory(required: StructType,
    hconf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CellsInputPartition]
    new CellsPartitionReader(p.file, p.cell, required, hconf)
  }
}

/** Row-group reader over one cell data file: parquet-hadoop Group API,
  * schema-driven field extraction (the payload is whatever the layout
  * builder wrote), required columns only. */
private[sources] class CellsPartitionReader(file: String, cell: Long,
    required: StructType, hconf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new Path(file))
    .withConf(hconf.value)
    .build()

  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  private def valueOf(name: String, dt: DataType): Any = {
    val g = current
    val idx = g.getType.getFieldIndex(name)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    dt match {
      case LongType => g.getLong(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case DoubleType => g.getDouble(idx, 0)
      case FloatType => g.getFloat(idx, 0)
      case BooleanType => g.getBoolean(idx, 0)
      case StringType => UTF8String.fromString(g.getString(idx, 0))
      case ArrayType(et, _) =>
        val lg = g.getGroup(idx, 0)
        val n = lg.getFieldRepetitionCount(0)
        val vals: Array[Any] = Array.tabulate[Any](n) { i =>
          val eg = lg.getGroup(0, i)
          if (eg.getFieldRepetitionCount(0) == 0) null
          else et match {
            case DoubleType => eg.getDouble(0, 0)
            case FloatType => eg.getFloat(0, 0)
            case LongType => eg.getLong(0, 0)
            case other => throw new IllegalArgumentException(
              s"unsupported cell-layout array element type $other")
          }
        }
        new GenericArrayData(vals)
      case other => throw new IllegalArgumentException(
        s"unsupported cell-layout column type $other ($name)")
    }
  }

  override def get(): InternalRow = {
    val vals = required.fields.map { f =>
      if (f.name == "cell") cell else valueOf(f.name, f.dataType)
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = reader.close()
}
