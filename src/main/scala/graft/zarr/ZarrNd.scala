package graft.zarr

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Rank-N (N ≥ 1, aimed at N ≥ 3) dense Zarr v2 arrays — the tensor face
  * zappy/zarr-python expose for image stacks, (time, lat, lon) cubes and
  * other ndarray-shaped stores that the 2-D [[Zarr]] engine (matrix-shaped,
  * scanpy-workload) deliberately does not model. Closes the rank boundary
  * the r17 verdict asked to decide: rank-1/2 keep their specialized
  * engines (pushdown DSv2, sharding, append/resize, sparse groups); this
  * module supplies spec-complete READ/WRITE for higher ranks in the same
  * coordinate form, so `from_zarr` on a foreign rank-3 store works and a
  * rank-3 store written here opens in stock zarr-python.
  *
  * Data model: a coordinate DataFrame (i0 … i{N−1}, v) — the N-D
  * generalization of ZMatrix's (i, j, v). Chunks are the unit of
  * parallelism both ways (partition-per-chunk read; chunk-grouped shuffle
  * write), so the layout scales exactly like the 2-D paths: nothing ever
  * materializes more than one chunk per task.
  *
  * Spec notes (v2, zarr.dev/zarr-specs — same contract the 2-D engine
  * pins by interop test): every stored chunk is the FULL chunk shape —
  * edge chunks are fill-padded, so all chunk objects have identical
  * decoded length; C-order within the chunk; missing chunk reads as
  * fill; keys are dot-joined chunk coordinates ("2.0.1"), slash-joined
  * when `dimension_separator` is "/". Compressors: the shared codec set
  * (null/zlib/blosc-lz4/zstd via [[Zarr.encodeChunk]]/[[Zarr.decodeChunk]]).
  */
object ZarrNd {

  /** Rank-N array metadata (the [[Zarr.Meta]] face for N dims).
    * `format` 2 or 3; `nested` = v2 "/"-separated keys, or for v3 the
    * default "/"-separated `c/…` encoding (false = "."-joined). */
  final case class MetaN(shape: Array[Long], chunks: Array[Int], dtype: String,
                         zlib: Boolean, comp: String, fill: Double,
                         nested: Boolean, format: Int = 2) {
    def rank: Int = shape.length
    def chunkElems: Int = chunks.product
    /** chunk-grid extent per dim. */
    def grid: Array[Long] =
      shape.indices.map(d => (shape(d) + chunks(d) - 1) / chunks(d)).toArray
    def nChunks: Long = grid.product
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fillLiteralN(m: MetaN): String = {
    val it = Set("i8", "i4", "i2", "i1", "u2", "u1")
    if (m.dtype.endsWith("b1")) (if (m.fill != 0.0) "true" else "false")
    else if (it.contains(m.dtype.substring(1))) m.fill.toLong.toString
    else if (m.fill.isNaN) "\"NaN\""
    else if (m.fill.isPosInfinity) "\"Infinity\""
    else if (m.fill.isNegInfinity) "\"-Infinity\""
    else m.fill.toString
  }

  private def metaJsonN(m: MetaN): String = {
    val comp =
      if (m.comp == "blosc")
        """{"id": "blosc", "cname": "lz4", "clevel": 1, "shuffle": 1, "blocksize": 0}"""
      else if (m.comp == "zstd") """{"id": "zstd", "level": 1}"""
      else if (m.zlib) """{"id": "zlib", "level": 1}"""
      else "null"
    val sep = if (m.nested) "\n    \"dimension_separator\": \"/\"," else ""
    s"""{
       |    "chunks": [${m.chunks.mkString(", ")}],$sep
       |    "compressor": $comp,
       |    "dtype": "${m.dtype}",
       |    "fill_value": ${fillLiteralN(m)},
       |    "filters": null,
       |    "order": "C",
       |    "shape": [${m.shape.mkString(", ")}],
       |    "zarr_format": 2
       |}""".stripMargin
  }

  /** v3 `zarr.json` for a rank-N array — the stock zarr-python v3 layout
    * (named dtype, regular chunk grid, bytes codec + optional
    * gzip/zstd/blosc frame, default chunk-key encoding). */
  private def metaJsonNv3(m: MetaN): String = {
    val bytesCodec = """{"name": "bytes", "configuration": {"endian": "little"}}"""
    val codecs =
      if (m.comp == "blosc")
        s"""[$bytesCodec, {"name": "blosc", "configuration": {"cname": "lz4", "clevel": 1, "shuffle": "shuffle", "typesize": ${Zarr.elemSize(m.dtype)}, "blocksize": 0}}]"""
      else if (m.comp == "zstd")
        s"""[$bytesCodec, {"name": "zstd", "configuration": {"level": 1, "checksum": false}}]"""
      else if (m.zlib)
        s"""[$bytesCodec, {"name": "gzip", "configuration": {"level": 1}}]"""
      else s"""[$bytesCodec]"""
    val sep = if (m.nested) "/" else "."
    s"""{
       |    "zarr_format": 3,
       |    "node_type": "array",
       |    "shape": [${m.shape.mkString(", ")}],
       |    "data_type": "${Zarr.v3Names(m.dtype.substring(1))}",
       |    "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${m.chunks.mkString(", ")}]}},
       |    "chunk_key_encoding": {"name": "default", "configuration": {"separator": "$sep"}},
       |    "fill_value": ${fillLiteralN(m)},
       |    "codecs": $codecs,
       |    "attributes": {}
       |}""".stripMargin
  }

  /** Parse rank-N metadata — v2 `.zarray` or v3 `zarr.json` (any rank;
    * the 1-D/2-D engines keep their own rank-restricted parsers). */
  def readMetaN(path: String): MetaN = {
    val m = if (Zarr.exists(s"$path/zarr.json")) readMetaNv3(path)
            else readMetaNv2(path)
    // a FOREIGN store's chunk-element product must fit one JVM buffer —
    // a silent Int overflow would decode garbage, not error (the 2-D
    // chunkDim rule at rank N)
    require(m.chunkElems.toLong == m.chunks.map(_.toLong).product,
      s"$path: chunk of ${m.chunks.mkString("x")} elements exceeds one " +
        "Int-addressable buffer")
    m
  }

  private def readMetaNv2(path: String): MetaN = {
    val root = mapper.readTree(
      new String(Zarr.readBytes(s"$path/.zarray"), "UTF-8"))
    require(root.path("zarr_format").asInt() == 2,
      s"$path: .zarray must declare zarr_format 2")
    require(root.path("order").asText("C") == "C",
      s"$path: F-order N-D stores not supported")
    require(root.path("filters").isNull || root.path("filters").isMissingNode,
      s"$path: filter chains not supported")
    def longs(n: com.fasterxml.jackson.databind.JsonNode): Array[Long] = {
      require(n.isArray && n.size() > 0, s"$path: bad shape/chunks")
      (0 until n.size()).map(n.get(_).asLong()).toArray
    }
    val shape = longs(root.path("shape"))
    val chunks = longs(root.path("chunks")).map { c =>
      require(c > 0 && c <= Int.MaxValue, s"$path: chunk extent $c"); c.toInt
    }
    require(shape.length == chunks.length, s"$path: rank mismatch")
    val compNode = root.path("compressor")
    val (zlib, comp) =
      if (compNode.isNull || compNode.isMissingNode) (false, "")
      else compNode.path("id").asText() match {
        case "zlib"  => (true, "")
        case "blosc" => (false, "blosc")
        case "zstd"  => (false, "zstd")
        case other => throw new IllegalArgumentException(
          s"$path: unsupported compressor '$other'")
      }
    val fillNode = root.path("fill_value")
    val fill =
      if (fillNode.isNull || fillNode.isMissingNode) 0.0
      else if (fillNode.isTextual) fillNode.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other => throw new IllegalArgumentException(
          s"$path: fill_value '$other'")
      }
      else if (fillNode.isBoolean) { if (fillNode.asBoolean()) 1.0 else 0.0 }
      else fillNode.asDouble()
    MetaN(shape, chunks, root.path("dtype").asText(), zlib, comp, fill,
      nested = root.path("dimension_separator").asText(".") == "/")
  }

  private def readMetaNv3(path: String): MetaN = {
    val root = mapper.readTree(
      new String(Zarr.readBytes(s"$path/zarr.json"), "UTF-8"))
    require(root.path("zarr_format").asInt() == 3 &&
      root.path("node_type").asText() == "array", s"$path: not a v3 array")
    def longs(n: com.fasterxml.jackson.databind.JsonNode): Array[Long] = {
      require(n.isArray && n.size() > 0, s"$path: bad shape/chunk_shape")
      (0 until n.size()).map(n.get(_).asLong()).toArray
    }
    val shape = longs(root.path("shape"))
    val grid = root.path("chunk_grid")
    require(grid.path("name").asText() == "regular", s"$path: chunk grid")
    val chunks = longs(grid.path("configuration").path("chunk_shape")).map { c =>
      require(c > 0 && c <= Int.MaxValue, s"$path: chunk extent $c"); c.toInt
    }
    require(shape.length == chunks.length, s"$path: rank mismatch")
    val dtName = root.path("data_type").asText()
    val dt = "<" + Zarr.v3NamesInv.getOrElse(dtName,
      throw new IllegalArgumentException(s"$path: data_type '$dtName'"))
    // codec chain: [bytes(endian)] + at most one frame codec
    val codecs = root.path("codecs")
    var zlib = false; var comp = ""; var big = false
    (0 until codecs.size()).foreach { k =>
      val c = codecs.get(k)
      c.path("name").asText() match {
        case "bytes" =>
          big = c.path("configuration").path("endian").asText("little") == "big"
        case "gzip"  => zlib = true
        case "zstd"  => comp = "zstd"
        case "blosc" => comp = "blosc"
        case other => throw new IllegalArgumentException(
          s"$path: unsupported v3 codec '$other' for N-D reads")
      }
    }
    require(!big, s"$path: big-endian N-D stores not supported")
    val kenc = root.path("chunk_key_encoding")
    require(kenc.isMissingNode || kenc.path("name").asText("default") == "default",
      s"$path: N-D reads support the default chunk-key encoding")
    val sep = kenc.path("configuration").path("separator").asText("/")
    val fillNode = root.path("fill_value")
    val fill =
      if (fillNode.isNull || fillNode.isMissingNode) 0.0
      else if (fillNode.isTextual) fillNode.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other => throw new IllegalArgumentException(
          s"$path: fill_value '$other'")
      }
      else if (fillNode.isBoolean) { if (fillNode.asBoolean()) 1.0 else 0.0 }
      else fillNode.asDouble()
    MetaN(shape, chunks, dt, zlib, comp, fill, nested = sep == "/", format = 3)
  }

  private def chunkKey(path: String, coord: Array[Long], nested: Boolean,
                       format: Int = 2): String =
    if (format == 3) {
      // v3 default encoding: "c" + sep + coords joined by sep
      val sep = if (nested) "/" else "."
      s"$path/${(("c" +: coord.map(_.toString)).mkString(sep))}"
    } else s"$path/${coord.mkString(if (nested) "/" else ".")}"

  private def coordCols(rank: Int): Seq[String] = (0 until rank).map(d => s"i$d")

  private def outSchema(rank: Int): StructType = StructType(
    coordCols(rank).map(StructField(_, LongType, nullable = false)) :+
      StructField("v", DoubleType, nullable = false))

  /** Write (i0 … i{N−1}, v) as a fresh rank-N store (v2 default; `format
    * = 3` emits the stock zarr-python v3 layout). One shuffle, keyed by
    * linearized chunk id; each task assembles and encodes only its own
    * chunks (one fill-initialized buffer at a time — the writeVector slab
    * idiom), so executor memory is bounded by ONE chunk regardless of
    * array or task size. Cells the frame omits inside the shape stay
    * fill; out-of-shape coordinates error (fail-fast — a silently
    * dropped cell is data loss). DUPLICATE coordinates are the caller's
    * contract to prevent (aggregate first, as every gate query does):
    * with duplicates present, which value lands is partition-order
    * dependent — the same rule the 2-D writer and numpy fancy-assignment
    * share. */
  def write(df: DataFrame, path: String, shape: Seq[Long], chunks: Seq[Int],
            dtype: String = "<f8", zlib: Boolean = true, comp: String = "",
            fill: Double = 0.0, nested: Boolean = false,
            format: Int = 2): Unit = {
    val rank = shape.length
    require(rank >= 1 && chunks.length == rank, "shape/chunks rank mismatch")
    require(shape.forall(_ > 0) && chunks.forall(_ > 0), "empty dimension")
    require(format == 2 || format == 3, s"zarr format $format")
    // `nested` picks the key separator in both formats (true = "/");
    // zarr-python's v3 default is "/" — pass nested = true for v3 stores
    // meant to open there with zero configuration
    val m = MetaN(shape.toArray, chunks.toArray, dtype, zlib, comp, fill,
      nested = nested, format = format)
    require(m.chunkElems.toLong == chunks.map(_.toLong).product,
      "chunk too large: elements must fit one Int-addressable buffer")
    Zarr.delete(path, recursive = true)
    writeChunks(df, path, m, 0L, shape.head)
    writeMetaN(path, m)
  }

  private def writeMetaN(path: String, m: MetaN): Unit =
    if (m.format == 3)
      Zarr.writeBytes(s"$path/zarr.json", metaJsonNv3(m).getBytes("UTF-8"))
    else
      Zarr.writeBytes(s"$path/.zarray", metaJsonN(m).getBytes("UTF-8"))

  /** The shared chunk-assembly core: shuffle by linearized chunk id, one
    * fill-initialized buffer per chunk per task, encode + publish. Cells
    * must sit inside `m.shape` AND inside [axis0Lo, axis0Hi) on axis 0 —
    * the band contract appendBand enforces. */
  private def writeChunks(df: DataFrame, path: String, m: MetaN,
                          axis0Lo: Long, axis0Hi: Long): Unit = {
    val rank = m.rank
    val chunks = m.chunks
    val spark = df.sparkSession
    // grid strides for the linearized chunk id (row-major over the grid)
    val grid = m.grid
    val strides = new Array[Long](rank)
    strides(rank - 1) = 1L
    for (d <- rank - 2 to 0 by -1) strides(d) = strides(d + 1) * grid(d + 1)
    // `div` (integer division), NOT `/` + cast: double division rounds
    // past 2^53, so a high coordinate could land its row in one task while
    // the task-side exact Long arithmetic assigns it another chunk — two
    // tasks writing the same chunk object, one silently overwriting the
    // other (r18 ADVICE fix: partitioner and task must be bit-identical)
    val cid = (0 until rank)
      .map(d => expr(s"i$d div ${chunks(d)}") * strides(d))
      .reduce(_ + _)
    val shapeB = m.shape; val chunksB = m.chunks; val gridB = grid
    val dtypeB = m.dtype; val zlibB = m.zlib; val compB = m.comp
    val fillB = m.fill; val nestedB = m.nested; val elemsB = m.chunkElems
    val formatB = m.format; val loB = axis0Lo; val hiB = axis0Hi
    val parts = math.max(spark.sessionState.conf.numShufflePartitions,
      math.min((m.nChunks + 7) / 8, 65536L).toInt)
    df.select((coordCols(rank).map(col) :+ col("v").cast("double").as("v")): _*)
      .repartition(parts, cid)
      .sortWithinPartitions(cid)
      .rdd.foreachPartition { it =>
      val r = shapeB.length
      var curCid = -1L
      var buf: Array[Double] = null
      val coord = new Array[Long](r)
      def flush(): Unit = if (buf != null) {
        Zarr.writeBytes(chunkKey(path, coord, nestedB, formatB),
          Zarr.encodeChunk(buf, dtypeB, zlibB, formatB, compB))
        buf = null
      }
      it.foreach { row =>
        var cidHere = 0L
        var inChunkOff = 0
        var d = 0
        while (d < r) {
          val i = row.getLong(d)
          require(i >= 0 && i < shapeB(d),
            s"coordinate i$d=$i outside shape ${shapeB.mkString("x")}")
          require(d != 0 || (i >= loB && i < hiB),
            s"coordinate i0=$i outside the written band [$loB, $hiB)")
          val c = i / chunksB(d)
          var cs = c; var dd = d + 1
          while (dd < r) { cs *= gridB(dd); dd += 1 }
          cidHere += cs
          inChunkOff = inChunkOff * chunksB(d) + (i - c * chunksB(d)).toInt
          d += 1
        }
        if (cidHere != curCid) {
          flush()
          curCid = cidHere
          // decode cid -> chunk coordinates for the key
          var rem = cidHere
          var k = 0
          while (k < r) {
            val g = { var p = 1L; var dd = k + 1; while (dd < r) { p *= gridB(dd); dd += 1 }; p }
            coord(k) = rem / g; rem = rem % g
            k += 1
          }
          buf = Array.fill(elemsB)(fillB)
        }
        buf(inChunkOff) = row.getDouble(r)
      }
      flush()
    }
  }

  /** Publish an axis-0 BAND into an existing (or fresh) rank-N store —
    * the streaming/incremental ingest face (the S7 pattern at tensor
    * rank): the band's rows [bandStart, bandEnd) must start on an axis-0
    * chunk boundary, so the band writes only ITS OWN chunk rows and can
    * never clobber another band's chunks; every stored chunk is full
    * chunk shape (v2/v3 padding rule), so even a ragged band needs no
    * read-modify-write if a later band extends the array. Shape grows to
    * max(existing, bandEnd) and the metadata document commits LAST, so a
    * concurrent reader never addresses chunks that aren't fully
    * published. Bands may arrive in ANY order (disjointness at chunk
    * granularity is the invariant, not monotonicity). Geometry/codec of
    * an existing store are validated, not trusted. */
  def appendBand(df: DataFrame, path: String, bandStart: Long, bandEnd: Long,
                 shapeTail: Seq[Long], chunks: Seq[Int],
                 dtype: String = "<f8", zlib: Boolean = true,
                 comp: String = "", fill: Double = 0.0,
                 nested: Boolean = false, format: Int = 2): Unit = {
    require(bandStart >= 0 && bandEnd > bandStart, s"band [$bandStart, $bandEnd)")
    require(chunks.nonEmpty && bandStart % chunks.head == 0,
      s"band start $bandStart must align to the axis-0 chunk ${chunks.head}")
    require(shapeTail.length + 1 == chunks.length, "shapeTail/chunks rank mismatch")
    val exists = Zarr.exists(s"$path/zarr.json") || Zarr.exists(s"$path/.zarray")
    val shape0 =
      if (!exists) bandEnd
      else {
        val m0 = readMetaN(path)
        require(m0.chunks.toSeq == chunks.toSeq &&
          m0.shape.drop(1).toSeq == shapeTail.toSeq &&
          m0.dtype == dtype && m0.zlib == zlib && m0.comp == comp &&
          m0.nested == nested && m0.format == format &&
          // fill is load-bearing: the rewrite below re-emits metadata, so a
          // divergent fill would silently change how every MISSING chunk
          // reads (NaN-safe comparison — NaN fill is legal for floats)
          (m0.fill == fill || (m0.fill.isNaN && fill.isNaN)),
          s"$path: band geometry/codec/fill differs from the existing store")
        math.max(m0.shape(0), bandEnd)
      }
    val m = MetaN((shape0 +: shapeTail).toArray, chunks.toArray, dtype, zlib,
      comp, fill, nested = nested, format = format)
    writeChunks(df, path, m, bandStart, bandEnd)
    writeMetaN(path, m)
  }

  /** Read a rank-N store back as (i0 … i{N−1}, v) — partition-per-chunk
    * (the DSv2 contract rank-1/2 reads honor), each task decoding only
    * its own chunk object; a missing chunk emits fill for its in-bounds
    * cells (the spec's missing-chunk rule). Ragged edges clip to shape. */
  def read(spark: SparkSession, path: String): DataFrame =
    readRange(spark, path, Seq.empty)

  /** Range-PRUNED tensor read — numpy `X[l0:h0, l1:h1, …]` as a chunk-grid
    * intersection AT PLANNING: only chunks overlapping every per-dim
    * [lo, hi) window become tasks, the rest are never listed, opened, or
    * decoded — the Z4/q26 pushdown contract at tensor rank, which at
    * 100 TB is the difference between "read the probe band" and "read the
    * store". `ranges` pads with full extents past its length (empty =
    * full read); cells outside a window are dropped at the source (the
    * window is exact, not just chunk-granular). Coordinates stay GLOBAL
    * (zarr slicing re-bases; a relational engine keys joins on the global
    * coordinate — callers re-base with a select when numpy semantics are
    * wanted). */
  def readRange(spark: SparkSession, path: String,
                ranges: Seq[(Long, Long)]): DataFrame = {
    val m = readMetaN(path)
    val rank = m.rank
    require(ranges.length <= rank, s"$path: ${ranges.length} ranges for rank $rank")
    val win: Array[(Long, Long)] = (0 until rank).map { d =>
      val (lo, hi) = if (d < ranges.length) ranges(d) else (0L, m.shape(d))
      require(lo >= 0 && lo < hi && hi <= m.shape(d),
        s"$path: range [$lo, $hi) outside dim $d extent ${m.shape(d)}")
      (lo, hi)
    }.toArray
    // The selection is described by its chunk-grid WINDOW, never by a
    // materialized coordinate list (r18 ADVICE fix: the driver used to
    // build one Seq entry and one scheduler task PER chunk — millions of
    // driver-side coord objects and tasks at large selections, and a hard
    // cap that made very large full reads fail outright). Tasks receive a
    // range of linearized selection ordinals and decode each ordinal to
    // its chunk coordinate with mixed-radix arithmetic — lazy, exact, and
    // O(1) driver memory at ANY selection size; task count is capped so a
    // million-chunk read is a few thousand tasks iterating chunks, not a
    // million tasks.
    val cLo = (0 until rank).map(d => win(d)._1 / m.chunks(d)).toArray
    val cHi = (0 until rank).map(d => (win(d)._2 - 1) / m.chunks(d)).toArray
    val ext = (0 until rank).map(d => cHi(d) - cLo(d) + 1).toArray
    val nSel = ext.foldLeft(1L)((a, b) => Math.multiplyExact(a, b))
    // spark.graft.zarrnd.maxSlices: task-count ceiling for huge chunk
    // grids (a million-chunk read becomes a few thousand tasks iterating
    // chunks, not a million tasks); also the test seam for the
    // multi-chunk-per-task path
    val maxSlices = spark.conf.getOption("spark.graft.zarrnd.maxSlices")
      .flatMap(_.toLongOption)
      .getOrElse(math.max(spark.sparkContext.defaultParallelism.toLong * 4, 4096L))
    val numSlices = math.max(1L, math.min(nSel, maxSlices)).toInt
    val mB = m
    val winB = win
    val rdd = spark.sparkContext
      .range(0L, nSel, 1L, math.max(1, numSlices))
      .flatMap { ord =>
        // mixed-radix decode: selection ordinal -> chunk coordinate
        val r = mB.rank
        val c = new Array[Long](r)
        var rem = ord
        var dd = r - 1
        while (dd >= 0) { c(dd) = cLo(dd) + rem % ext(dd); rem /= ext(dd); dd -= 1 }
        val elems = mB.chunkElems
        val key = chunkKey(path, c, mB.nested, mB.format)
        val buf =
          if (Zarr.exists(key))
            Zarr.decodeChunk(Zarr.readBytes(key), elems, mB.zlib, mB.dtype,
              mB.format, mB.comp)
          else Array.fill(elems)(mB.fill)
        // emit in-bounds cells only (edge chunks are fill-padded on disk)
        val base = new Array[Long](r)
        var d = 0
        while (d < r) { base(d) = c(d) * mB.chunks(d); d += 1 }
        (0 until elems).iterator.flatMap { off =>
          val idx = new Array[Long](r)
          var rem = off
          var inBounds = true
          var k = r - 1
          while (k >= 0) {
            val local = rem % mB.chunks(k)
            rem /= mB.chunks(k)
            val g = base(k) + local
            if (g >= mB.shape(k) || g < winB(k)._1 || g >= winB(k)._2)
              inBounds = false
            idx(k) = g
            k -= 1
          }
          if (!inBounds) Iterator.empty
          else Iterator.single(Row.fromSeq(idx.toSeq :+ buf(off)))
        }
      }
    spark.createDataFrame(rdd, outSchema(rank))
  }
}
