package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import Sas7bdat.{Buf, SasColumn, SasMeta}

/** DataSourceV2 face of the [[Sas7bdat]] parser:
  * `spark.read.format("sas7bdat").load(path)` (registered via
  * DataSourceRegister as "sas7bdat"; option `convertDates=false`
  * keeps SAS day/second counts as raw doubles).
  *
  * Spark-native scan planning on top of the same page machinery the
  * RDD path uses:
  *  - one `InputPartition` per page range (>= 64 pages, capped so the
  *    partition count stays near cluster parallelism) — the format's
  *    fixed-size pages make a non-splittable binary format fully
  *    parallel, each task seeks straight to its range;
  *  - REAL column pruning (`SupportsPushDownRequiredColumns`): a
  *    `select(one, column)` decodes only those byte ranges of each
  *    row and `.explain` shows the pruned ReadSchema — on a wide
  *    CRSP/Compustat extract the decode cost drops proportionally,
  *    which the RDD path cannot express.
  *
  * The driver-side metadata parse runs once per table (lazily in
  * [[SasTable]]) and is carried through scan planning; cell decoding
  * shares [[Sas7bdat.numericCell]]/[[Sas7bdat.stringCell]] with the
  * RDD path so the missing-value and trimming rules cannot drift.
  */
class Sas7bdatDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "sas7bdat"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "sas7bdat source needs a path: .load(\"file.sas7bdat\")")
    p
  }

  private def convertDatesOf(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("convertDates", true)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (meta, _) = Sas7bdat.readMeta(pathOf(options))
    Sas7bdat.sparkSchema(meta, convertDatesOf(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new SasTable(pathOf(options), schema, convertDatesOf(options))
  }
}

private[sources] class SasTable(path: String, tableSchema: StructType, convertDates: Boolean)
    extends Table with SupportsRead {

  /** One metadata parse per table, shared by every scan planned from
    * it: (meta, firstDataPage, pageCount).
    */
  private lazy val layout: (SasMeta, Int, Int) = {
    val (meta, firstDataPage) = Sas7bdat.readMeta(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fileLen = fsPath.getFileSystem(conf).getFileStatus(fsPath).getLen
    (meta, firstDataPage, ((fileLen - meta.headerLength) / meta.pageLength).toInt)
  }

  override def name(): String = s"sas7bdat(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val (meta, firstDataPage, pageCount) = layout
    new SasScanBuilder(path, meta, firstDataPage, pageCount, tableSchema, convertDates)
  }
}

private[sources] class SasScanBuilder(
    path: String, meta: SasMeta, firstDataPage: Int, pageCount: Int,
    fullSchema: StructType, convertDates: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new SasScan(path, meta, firstDataPage, pageCount, required, convertDates)
}

private[sources] class SasScan(
    path: String, meta: SasMeta, firstDataPage: Int, pageCount: Int,
    required: StructType, convertDates: Boolean)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"sas7bdat $path ${required.fieldNames.mkString("[", ",", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dataPages = pageCount - firstDataPage
    if (dataPages <= 0 || meta.rowCount == 0) Array.empty
    else {
      // granularity floor of ~64 pages (a few hundred KB to a few MB
      // of rows per task) with a CONSTANT ceiling on partition count.
      // Deliberately not sized from defaultParallelism: under dynamic
      // allocation planInputPartitions can run before executors
      // register (parallelism=2), and a scan planned then would be
      // stuck at 2 tasks forever — a fixed cap keeps plans
      // cluster-state-independent while bounding scheduler overhead
      val pagesPerTask = math.max(64, (dataPages + MaxScanPartitions - 1) / MaxScanPartitions)
      (firstDataPage until pageCount).grouped(pagesPerTask).map { idxs =>
        SasPageRange(path, meta, idxs.head, idxs.last + 1, required.fieldNames, convertDates)
          .asInstanceOf[InputPartition]
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = SasReaderFactory

  /** Upper bound on planned partitions — generous for any realistic
    * cluster, small enough that a million-page file doesn't flood the
    * scheduler with ~16k tiny tasks.
    */
  private val MaxScanPartitions = 4096
}

/** One contiguous page range of one file; carries everything the
  * executor-side reader needs (SasMeta is plain serializable data).
  */
private[sources] case class SasPageRange(
    path: String,
    meta: SasMeta,
    startPage: Int,
    endPage: Int,
    requiredCols: Array[String],
    convertDates: Boolean) extends InputPartition

private[sources] object SasReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SasPageRangeReader(partition.asInstanceOf[SasPageRange])
}

private[sources] class SasPageRangeReader(p: SasPageRange) extends PartitionReader[InternalRow] {

  private val byName = p.meta.columns.map(c => c.name -> c).toMap
  private val cols: Array[SasColumn] = p.requiredCols.map(byName(_))
  private val in = Sas7bdat.openAt(p.path)
  private var pageIdx = p.startPage
  private var rows: Iterator[InternalRow] = Iterator.empty

  override def next(): Boolean = {
    while (!rows.hasNext && pageIdx < p.endPage) {
      val buf = new Buf(
        Sas7bdat.readFully(in, p.meta.headerLength.toLong + pageIdx.toLong * p.meta.pageLength, p.meta.pageLength),
        p.meta.littleEndian)
      rows = Sas7bdat.rowsInPage(buf, p.meta).iterator.map { case (b, off) => decode(b, off) }
      pageIdx += 1
    }
    rows.hasNext
  }

  override def get(): InternalRow = rows.next()
  override def close(): Unit = in.close()

  /** Decode ONLY the pruned columns, straight to Spark internal
    * representations (UTF8String / epoch days / micros). Cell
    * extraction is the SAME code as the RDD path
    * ([[Sas7bdat.numericCell]]/[[Sas7bdat.stringCell]]); only the
    * internal-format conversion lives here.
    */
  private def decode(page: Buf, rowOff: Int): InternalRow = {
    val vals = new Array[Any](cols.length)
    var i = 0
    while (i < cols.length) {
      val c = cols(i)
      vals(i) =
        if (c.isNumeric) {
          val d = Sas7bdat.numericCell(page, rowOff, c)
          if (d == null) null
          else if (p.convertDates && Sas7bdat.SasDateFormats.contains(c.format))
            Sas7bdat.SasEpochDay.plusDays(d.toLong).toEpochDay.toInt
          else if (p.convertDates && Sas7bdat.SasDatetimeFormats.contains(c.format))
            (Sas7bdat.SasEpochMillis + math.round(d * 1000.0)) * 1000L
          else d.doubleValue
        } else {
          val s = Sas7bdat.stringCell(page, rowOff, c, p.meta.encoding)
          if (s == null) null else UTF8String.fromString(s)
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }
}
