package graft.sources.findb

import java.io.RandomAccessFile
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 reader for the reference's on-disk B-tree files — the
  * migration path for findb users with existing `.db` panels:
  *
  * {{{ spark.read.format("graft.sources.findb.FindbDataSource").load("panel.db") }}}
  *
  * Scan strategy: emit rows from LEAF pages only (the inner nodes exist
  * to serve single-machine point queries; a cluster scan partitions the
  * page range instead — `pagesPerPartition` page-chunks become Spark
  * input partitions, so one file reads in parallel). Key-range pruning
  * then happens in Spark against the (asset_id, date, timestamp)
  * columns, which at realistic selectivities costs one streaming pass —
  * exactly what the reference's own full-panel extraction does.
  */
class FindbDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FindbFormat.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // single load(path) → "path"; load(p1, p2, …) → "paths" JSON array.
    // Real JSON parsing (Jackson ships with Spark) — a path containing a
    // comma or quote must survive intact.
    val paths: Seq[String] = Option(opts.get("paths")) match {
      case Some(json) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(json)
        require(node.isArray, s"findb 'paths' option must be a JSON array, got: $json")
        (0 until node.size()).map(node.get(_).asText())
      case None => Seq(Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("findb source requires a path")))
    }
    val pagesPerPartition = Option(opts.get("pagesperpartition")).map(_.toInt).getOrElse(4096)
    new FindbTable(paths, pagesPerPartition)
  }

  override def supportsExternalMetadata(): Boolean = false
}

class FindbTable(paths: Seq[String], pagesPerPartition: Int) extends Table with SupportsRead {
  override def name(): String = s"findb:${paths.mkString(",")}"
  override def schema(): StructType = FindbFormat.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FindbScanBuilder(paths, pagesPerPartition)
}

/** Pushes `asset_id` bounds down to the page level: leaf pages are
  * key-sorted, so a page whose [first, last] asset range is disjoint
  * from the pushed bounds is skipped without emitting a row — the
  * B-tree's own ordering doing row-group-stats duty. All filters are
  * still re-applied by Spark above the scan (we push an
  * over-approximation, never a replacement).
  */
class FindbScanBuilder(paths: Seq[String], pagesPerPartition: Int)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var assetLo = Long.MinValue
  private var assetHi = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = FindbFormat.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case EqualTo("asset_id", v: Number) =>
        assetLo = math.max(assetLo, v.longValue); assetHi = math.min(assetHi, v.longValue); true
      case GreaterThan("asset_id", v: Number) =>
        assetLo = math.max(assetLo, v.longValue + 1); true
      case GreaterThanOrEqual("asset_id", v: Number) =>
        assetLo = math.max(assetLo, v.longValue); true
      case LessThan("asset_id", v: Number) =>
        assetHi = math.min(assetHi, v.longValue - 1); true
      case LessThanOrEqual("asset_id", v: Number) =>
        assetHi = math.min(assetHi, v.longValue); true
      case _ => false
    }
    filters // everything stays a residual for Spark to re-check
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new FindbScan(paths, pagesPerPartition, assetLo, assetHi, required)
}

class FindbScan(paths: Seq[String], pagesPerPartition: Int,
                assetLo: Long = Long.MinValue, assetHi: Long = Long.MaxValue,
                required: StructType = FindbFormat.schema)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"findb ${paths.mkString(",")} PushedAssetRange: [$assetLo, $assetHi] ReadColumns: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // ordinals into the full (asset_id, date, timestamp, value) row
    val ordinals = required.fieldNames.map(FindbFormat.schema.fieldIndex)
    paths.flatMap { path =>
      val raf = new RandomAccessFile(path, "r")
      val header = try FindbFormat.readHeader(raf) finally raf.close()
      (0 until header.pageCount by pagesPerPartition).map { start =>
        FindbInputPartition(path, header.pageSize, start,
          math.min(start + pagesPerPartition, header.pageCount), assetLo, assetHi,
          ordinals): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FindbReaderFactory
}

case class FindbInputPartition(path: String, pageSize: Int, startPage: Int, endPage: Int,
                               assetLo: Long = Long.MinValue, assetHi: Long = Long.MaxValue,
                               ordinals: Array[Int] = Array(0, 1, 2, 3))
  extends InputPartition

class FindbReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FindbInputPartition]
    new FindbPartitionReader(p)
  }
}

class FindbPartitionReader(p: FindbInputPartition) extends PartitionReader[InternalRow] {
  import FindbFormat._

  private val raf = new RandomAccessFile(p.path, "r")
  private val pageBuf = new Array[Byte](p.pageSize)
  private var pageNum = p.startPage
  private var pageLoaded = false
  private var rowIdx = 0
  private var rowsInPage = 0
  private var pageIsLeaf = false

  /** Pages read (post-skip) — exposed for the pushdown spec. */
  var pagesRead: Int = 0

  private def loadPage(): Unit = {
    raf.seek(pageOffset(pageNum.toLong, p.pageSize))
    raf.readFully(pageBuf)
    pageIsLeaf = u32(pageBuf, 0) == LeafType
    rowsInPage = u32(pageBuf, 4).toInt
    rowIdx = 0
    pageLoaded = true
    // page-level skip: leaf keys are sorted, so the page's asset span is
    // [first, last]; disjoint from the pushed bounds → emit nothing.
    if (pageIsLeaf && rowsInPage > 0) {
      val firstAsset = u32(pageBuf, PageHeaderSize)
      val lastAsset = u32(pageBuf, PageHeaderSize + (rowsInPage - 1) * KeyValueSize)
      if (lastAsset < p.assetLo || firstAsset > p.assetHi) rowsInPage = 0
      else pagesRead += 1
    }
  }

  override def next(): Boolean = {
    while (pageNum < p.endPage) {
      if (!pageLoaded) loadPage()
      if (pageIsLeaf && rowIdx < rowsInPage) return true
      pageNum += 1
      pageLoaded = false
    }
    false
  }

  override def get(): InternalRow = {
    val off = PageHeaderSize + rowIdx * KeyValueSize
    val values = new Array[Any](p.ordinals.length)
    var i = 0
    while (i < p.ordinals.length) {
      values(i) = p.ordinals(i) match {
        case 0 => u32(pageBuf, off)
        case 1 => u32(pageBuf, off + 4).toInt
        case 2 => u32(pageBuf, off + 8)
        case 3 => f32(pageBuf, off + 12)
      }
      i += 1
    }
    rowIdx += 1
    new GenericInternalRow(values)
  }

  override def close(): Unit = raf.close()
}
