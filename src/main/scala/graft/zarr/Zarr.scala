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
                        zlib: Boolean, fill: Double)

  private def metaJson(m: Meta): String = {
    val comp = if (m.zlib) """{"id": "zlib", "level": 1}""" else "null"
    s"""{
       |    "chunks": [${m.chunkRows}, ${m.chunkCols}],
       |    "compressor": $comp,
       |    "dtype": "<f8",
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
    Meta(shape(0), shape(1), chunks(0).toInt, chunks(1).toInt, zlib, fill)
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(1); d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Decode one chunk file's bytes into row-major doubles. */
  def decodeChunk(bytes0: Array[Byte], nElems: Int, zlib: Boolean): Array[Double] = {
    val bytes = if (zlib) inflate(bytes0, nElems * 8) else bytes0
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(nElems)(bb.getDouble)
  }

  private def inflate(b: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new Inflater(); inf.setInput(b)
    val out = new Array[Byte](outLen)
    var off = 0
    while (off < outLen && !inf.finished()) off += inf.inflate(out, off, outLen - off)
    inf.end(); out
  }

  /** Write a (dense-semantics) matrix: absent cells become `fill`. */
  def write(m: ZMatrix, path: String, rows: Long, cols: Long,
            chunkRows: Int, chunkCols: Int, zlib: Boolean = false, fill: Double = 0.0): Unit = {
    val meta = Meta(rows, cols, chunkRows, chunkCols, zlib, fill)
    val dir = new File(path)
    dir.mkdirs()
    // stale chunks from a previous shape/chunking would corrupt reads
    Option(dir.list()).foreach(_.filter(_.matches("\\d+\\.\\d+"))
      .foreach(f => new File(dir, f).delete()))
    Files.write(Paths.get(path, ".zarray"), metaJson(meta).getBytes("UTF-8"))

    val withChunk = m.cells.select(
      (col("i") / chunkRows).cast("long").as("ci"),
      (col("j") / chunkCols).cast("long").as("cj"),
      col("i"), col("j"), col("v"))

    // One shuffle on the chunk id; each task then owns whole chunks.
    withChunk.repartition(col("ci"), col("cj"))
      .sortWithinPartitions(col("ci"), col("cj"))
      .foreachPartition { rows0: Iterator[org.apache.spark.sql.Row] =>
        var cur: (Long, Long) = null
        var buf: Array[Double] = null
        def flush(): Unit = if (cur != null) {
          val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
          buf.foreach(bb.putDouble)
          val raw = bb.array()
          val bytes = if (meta.zlib) deflate(raw) else raw
          val f = new FileOutputStream(new File(dir, s"${cur._1}.${cur._2}"))
          try f.write(bytes) finally f.close()
        }
        rows0.foreach { r =>
          val key = (r.getLong(0), r.getLong(1))
          if (key != cur) {
            flush(); cur = key
            buf = Array.fill(chunkRows * chunkCols)(fill)
          }
          val li = (r.getLong(2) - key._1 * chunkRows).toInt
          val lj = (r.getLong(3) - key._2 * chunkCols).toInt
          buf(li * chunkCols + lj) = r.getDouble(4)
        }
        flush()
      }
  }

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
        val bytes = if (zl) inflate(bytes0, cr * cc * 8) else bytes0
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        for {
          li <- 0 until cr
          lj <- 0 until cc
          i = ci * cr + li
          j = cj * cc + lj
          if i < nr && j < nc
        } yield (i, j, bb.getDouble((li * cc + lj) * 8))
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
