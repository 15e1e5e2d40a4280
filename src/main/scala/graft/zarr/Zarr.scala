package graft.zarr

import java.io.{File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.array.ZMatrix

/** Minimal Zarr v2 store (directory of chunk files + `.zarray` JSON),
  * matching the reference's storage format (lasersonlab/zappy reads/writes
  * Zarr v2 arrays: C-order chunks named "ci.cj", little-endian dtype,
  * `compressor: null` or zlib). No external libraries — the metadata JSON
  * is tiny and fixed-shape, written/parsed directly.
  *
  * Scale design: the chunk grid IS the partitioning.
  *  - write: one shuffle (`repartition` on chunk id) then each task writes
  *    only its own chunk files — no driver involvement, no collect;
  *  - read: Spark's `binaryFile` source lists and splits the chunk files
  *    across executors; each task decodes its chunks straight to cells.
  */
object Zarr {

  final case class Meta(rows: Long, cols: Long, chunkRows: Int, chunkCols: Int,
                        zlib: Boolean, fill: Double, dtype: String = "<f8")

  /** Supported Zarr v2 dtype strings: byte-order prefix ('<' little, '>'
    * big) + f8/f4/i8/i4. In-flight values are always doubles (the ZMatrix
    * substrate); integral dtypes truncate on write, and i8 values beyond
    * 2^53 lose precision on read-back through double. */
  val Dtypes: Set[String] = Set("<f8", "<f4", "<i8", "<i4", ">f8", ">f4", ">i8", ">i4")

  def elemSize(dtype: String): Int = dtype.substring(1) match {
    case "f8" | "i8" => 8
    case "f4" | "i4" => 4
    case other => throw new IllegalArgumentException(s"unsupported dtype $other")
  }

  private def byteOrder(dtype: String): ByteOrder =
    if (dtype.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  private def metaJson(m: Meta): String = {
    val comp = if (m.zlib) """{"id": "zlib", "level": 1}""" else "null"
    s"""{
       |    "chunks": [${m.chunkRows}, ${m.chunkCols}],
       |    "compressor": $comp,
       |    "dtype": "${m.dtype}",
       |    "fill_value": ${m.fill},
       |    "filters": null,
       |    "order": "C",
       |    "shape": [${m.rows}, ${m.cols}],
       |    "zarr_format": 2
       |}""".stripMargin
  }

  private def jsonField(json: String, key: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*(\\[[^\\]]*\\]|\\{[^}]*\\}|[^,}\\s]+)")
      .matcher(json)
    require(m.find(), s"missing $key in .zarray")
    m.group(1)
  }

  private def longs(arr: String): Array[Long] =
    arr.replaceAll("[\\[\\]\\s]", "").split(",").map(_.toLong)

  def readMeta(path: String): Meta = {
    val json = new String(Files.readAllBytes(Paths.get(path, ".zarray")), "UTF-8")
    val shape = longs(jsonField(json, "shape"))
    val chunks = longs(jsonField(json, "chunks"))
    val zlib = jsonField(json, "compressor").contains("zlib")
    val fill = jsonField(json, "fill_value").toDouble
    val dtype = jsonField(json, "dtype").replaceAll("\"", "")
    require(Dtypes.contains(dtype), s"unsupported dtype $dtype")
    Meta(shape(0), shape(1), chunks(0).toInt, chunks(1).toInt, zlib, fill, dtype)
  }

  private[zarr] def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(1); d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Encode a row-major double buffer as raw chunk bytes in `dtype`
    * (integral dtypes truncate toward zero, the NumPy C-cast rule). */
  def encodeChunk(buf: Array[Double], dtype: String, zlib: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * elemSize(dtype)).order(byteOrder(dtype))
    dtype.substring(1) match {
      case "f8" => buf.foreach(bb.putDouble)
      case "f4" => buf.foreach(v => bb.putFloat(v.toFloat))
      case "i8" => buf.foreach(v => bb.putLong(v.toLong))
      case "i4" => buf.foreach(v => bb.putInt(v.toInt))
    }
    val raw = bb.array()
    if (zlib) deflate(raw) else raw
  }

  /** Decode one chunk file's bytes into row-major doubles. */
  def decodeChunk(bytes0: Array[Byte], nElems: Int, zlib: Boolean,
                  dtype: String = "<f8"): Array[Double] = {
    val bytes = if (zlib) inflate(bytes0, nElems * elemSize(dtype)) else bytes0
    val bb = ByteBuffer.wrap(bytes).order(byteOrder(dtype))
    dtype.substring(1) match {
      case "f8" => Array.fill(nElems)(bb.getDouble)
      case "f4" => Array.fill(nElems)(bb.getFloat.toDouble)
      case "i8" => Array.fill(nElems)(bb.getLong.toDouble)
      case "i4" => Array.fill(nElems)(bb.getInt.toDouble)
    }
  }

  private[zarr] def inflate(b: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new Inflater(); inf.setInput(b)
    val out = new Array[Byte](outLen)
    var off = 0
    while (off < outLen && !inf.finished()) off += inf.inflate(out, off, outLen - off)
    inf.end(); out
  }

  private[graft] def writeMetaFile(path: String, m: Meta): Unit =
    Files.write(Paths.get(path, ".zarray"), metaJson(m).getBytes("UTF-8"))

  /** Write a (dense-semantics) matrix: absent cells become `fill`.
    * Thin wrapper over the DSv2 sink (`df.write.format("zarr")`,
    * graft.sources.ZarrDataSource): the chunk-id shuffle + within-partition
    * sort is declared via `RequiresDistributionAndOrdering` on (ci, cj), so
    * Catalyst owns the exchange and AQE can size it. */
  def write(m: ZMatrix, path: String, rows: Long, cols: Long,
            chunkRows: Int, chunkCols: Int, zlib: Boolean = false,
            fill: Double = 0.0, dtype: String = "<f8"): Unit =
    m.cells.select(
        (col("i") / chunkRows).cast("long").as("ci"),
        (col("j") / chunkCols).cast("long").as("cj"),
        col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("v").cast("double").as("v"))
      .write.format("zarr")
      .option("chunkRows", chunkRows.toString).option("chunkCols", chunkCols.toString)
      .option("rows", rows.toString).option("cols", cols.toString)
      .option("dtype", dtype).option("zlib", zlib.toString).option("fill", fill.toString)
      .mode("overwrite").save(path)

  /** Read a Zarr array back as coordinate cells (i, j, v) with dense
    * semantics: chunk files absent from the store (zarr writes none for
    * all-fill chunks) materialize as fill cells. The store listing is a
    * driver-side metadata op (one directory/object LIST); chunk decode is
    * partition-parallel via the binaryFile source. */
  def read(spark: SparkSession, path: String): ZMatrix = {
    val meta = readMeta(path)
    import spark.implicits._
    val (cr, cc) = (meta.chunkRows, meta.chunkCols)
    val (nr, nc) = (meta.rows, meta.cols)
    val (zl, fill) = (meta.zlib, meta.fill)
    val dt = meta.dtype

    val present = new File(path).list().filter(_.matches("\\d+\\.\\d+")).toSet
    val gridR = ((nr + cr - 1) / cr).toInt
    val gridC = ((nc + cc - 1) / cc).toInt
    val missing = for {
      ci <- 0 until gridR; cj <- 0 until gridC
      if !present.contains(s"$ci.$cj")
    } yield (ci.toLong, cj.toLong)

    val decoded = spark.read.format("binaryFile")
      .load(path).filter(!col("path").endsWith(".zarray"))
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes0) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        val Array(ci, cj) = name.split("\\.").map(_.toLong)
        val vals = decodeChunk(bytes0, cr * cc, zl, dt)
        for {
          li <- 0 until cr
          lj <- 0 until cc
          i = ci * cr + li
          j = cj * cc + lj
          if i < nr && j < nc
        } yield (i, j, vals(li * cc + lj))
      }

    val fills = spark.createDataset(missing).repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (ci, cj) =>
        for {
          li <- 0 until cr
          lj <- 0 until cc
          i = ci * cr + li
          j = cj * cc + lj
          if i < nr && j < nc
        } yield (i, j, fill)
      }

    ZMatrix(decoded.union(fills).toDF("i", "j", "v"))
  }
}
