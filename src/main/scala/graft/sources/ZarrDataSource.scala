package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.zarr.Zarr

/** DataSource V2 Zarr reader: `spark.read.format("zarr").load(path)` →
  * coordinate cells (i, j, v). The reference reads the same stores via its
  * Python Zarr executor; here the chunk grid IS Spark's partitioning — one
  * `InputPartition` per chunk (present or all-fill), so a 100 TB store
  * fans out across executors with no driver data movement (the driver
  * touches only the `.zarray` metadata and the store listing).
  *
  * Local-filesystem paths only in this environment; an object-store
  * deployment would swap `Files.readAllBytes` for the Hadoop FS API in
  * `ZarrChunkReader` — the planning layer is storage-agnostic.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrDataSource.cellSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ZarrTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ZarrDataSource {
  val cellSchema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))
}

class ZarrTable(path: String) extends Table with SupportsRead {
  require(path != null, "zarr source requires .load(path)")
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = ZarrDataSource.cellSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path)
}

/** Pushes i/j range filters down to CHUNK PRUNING: a chunk whose index
  * range cannot satisfy the predicates is never planned, so
  * `X[a:b, c:d]` on a 100 TB store touches only the overlapping chunks.
  * Filters stay in `postScanFilters` too (we prune chunks, not rows). */
class ZarrScanBuilder(path: String) extends ScanBuilder with SupportsPushDownFilters {
  private var iLo = Long.MinValue; private var iHi = Long.MaxValue
  private var jLo = Long.MinValue; private var jHi = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (understood, rest) = filters.partition {
      case GreaterThanOrEqual("i" | "j", _: Long) => true
      case GreaterThan("i" | "j", _: Long) => true
      case LessThan("i" | "j", _: Long) => true
      case LessThanOrEqual("i" | "j", _: Long) => true
      case _ => false
    }
    understood.foreach {
      case GreaterThanOrEqual("i", v: Long) => iLo = iLo.max(v)
      case GreaterThan("i", v: Long)        => iLo = iLo.max(v + 1)
      case LessThan("i", v: Long)           => iHi = iHi.min(v - 1)
      case LessThanOrEqual("i", v: Long)    => iHi = iHi.min(v)
      case GreaterThanOrEqual("j", v: Long) => jLo = jLo.max(v)
      case GreaterThan("j", v: Long)        => jLo = jLo.max(v + 1)
      case LessThan("j", v: Long)           => jHi = jHi.min(v - 1)
      case LessThanOrEqual("j", v: Long)    => jHi = jHi.min(v)
      case _ => ()
    }
    pushed = understood
    filters // chunk-level pruning only: Spark must still apply row filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ZarrScan(path, iLo, iHi, jLo, jHi)
}

/** One partition per chunk of the grid; `file == null` marks an all-fill
  * chunk the writer skipped. */
case class ZarrChunkPartition(ci: Long, cj: Long, file: String,
                              rows: Long, cols: Long, chunkRows: Int, chunkCols: Int,
                              zlib: Boolean, fill: Double) extends InputPartition

class ZarrScan(path: String, iLo: Long = Long.MinValue, iHi: Long = Long.MaxValue,
               jLo: Long = Long.MinValue, jHi: Long = Long.MaxValue) extends Scan with Batch {
  override def readSchema(): StructType = ZarrDataSource.cellSchema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val meta = Zarr.readMeta(path)
    val present = new java.io.File(path).list().filter(_.matches("\\d+\\.\\d+")).toSet
    val gridR = ((meta.rows + meta.chunkRows - 1) / meta.chunkRows).toInt
    val gridC = ((meta.cols + meta.chunkCols - 1) / meta.chunkCols).toInt
    def overlaps(c: Int, size: Int, lo: Long, hi: Long): Boolean =
      c.toLong * size <= hi && (c.toLong + 1) * size - 1 >= lo
    (for {
      ci <- 0 until gridR if overlaps(ci, meta.chunkRows, iLo, iHi)
      cj <- 0 until gridC if overlaps(cj, meta.chunkCols, jLo, jHi)
    } yield {
      val f = if (present.contains(s"$ci.$cj")) s"$path/$ci.$cj" else null
      ZarrChunkPartition(ci, cj, f, meta.rows, meta.cols,
        meta.chunkRows, meta.chunkCols, meta.zlib, meta.fill): InputPartition
    }).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new ZarrChunkReader(p.asInstanceOf[ZarrChunkPartition])
    }
}

class ZarrChunkReader(p: ZarrChunkPartition) extends PartitionReader[InternalRow] {
  private val values: Array[Double] =
    if (p.file == null) null
    else Zarr.decodeChunk(Files.readAllBytes(Paths.get(p.file)),
      p.chunkRows * p.chunkCols, p.zlib)

  private var li = 0
  private var lj = -1
  private var curI = 0L
  private var curJ = 0L

  override def next(): Boolean = {
    var found = false
    while (!found && li < p.chunkRows) {
      lj += 1
      if (lj >= p.chunkCols) { lj = 0; li += 1 }
      if (li < p.chunkRows) {
        curI = p.ci * p.chunkRows + li
        curJ = p.cj * p.chunkCols + lj
        found = curI < p.rows && curJ < p.cols
      }
    }
    found
  }

  override def get(): InternalRow = {
    val v = if (values == null) p.fill else values(li * p.chunkCols + lj)
    new GenericInternalRow(Array[Any](curI, curJ, v))
  }

  override def close(): Unit = ()
}
