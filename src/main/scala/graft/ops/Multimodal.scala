package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads ride along as opaque `binary` columns
  * with typed metadata; decode / feature-extract runs as a *batched*
  * per-partition pipeline (the Scala analogue of `mapInPandas` — fixed
  * batch shape, columnar-friendly, no per-row closure dispatch).
  *
  * The actual codec is STUBBED (this container has no image/audio libs):
  * `stubDecode` derives deterministic fake dimensions from the payload
  * bytes. The Spark-side plumbing — schema, batching, partitioning — is
  * real and is what the operator contributes at 100 TB: payload bytes never
  * shuffle (features are extracted before any wide op), and batch size
  * bounds per-task peak memory.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                                 height: Int, channels: Int)

  /** STUB decode — stands in for a real image decoder. Deterministic from
    * the payload alone so tests and the oracle can reproduce it. */
  def stubDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    MediaFeatures(r.doc_id, n, (n % 640).toInt, ((n * 7) % 480).toInt, 3)
  }

  val BatchSize = 64

  /** Batched decode: grouped iterator mirrors mapInPandas' batch shape. */
  def decodeBatches(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.grouped(BatchSize).flatMap { batch => batch.map(stubDecode) }

  /** Wrap a text table as a media table (binary payload + mime metadata) —
    * the testdata stand-in for real image bytes. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRow]
  }

  /** Full pipeline: binary column in, typed features out. */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs, idCol, textCol).mapPartitions(decodeBatches).toDF()
  }

  // ---- Arrow batch kernel interface ----

  import org.apache.arrow.memory.RootAllocator
  import org.apache.arrow.vector.{BigIntVector, IntVector, VarBinaryVector, VectorSchemaRoot}
  import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
  import scala.jdk.CollectionConverters._

  private def arrowField(name: String, t: ArrowType): Field =
    new Field(name, FieldType.notNullable(t), null)

  /** Columnar contract of the decode kernel: what a real out-of-JVM codec
    * (Python / native over Arrow IPC) would receive and return. */
  val mediaArrowSchema: Schema = new Schema(Seq(
    arrowField("doc_id", new ArrowType.Int(64, true)),
    arrowField("payload", ArrowType.Binary.INSTANCE)).asJava)

  val featureArrowSchema: Schema = new Schema(Seq(
    arrowField("doc_id", new ArrowType.Int(64, true)),
    arrowField("n_bytes", new ArrowType.Int(64, true)),
    arrowField("width", new ArrowType.Int(32, true)),
    arrowField("height", new ArrowType.Int(32, true)),
    arrowField("channels", new ArrowType.Int(32, true))).asJava)

  /** The STUB kernel against the Arrow contract: reads the payload column
    * vector, writes the feature vectors — same deterministic math as
    * [[stubDecode]]. A real deployment swaps this one function for an IPC
    * round-trip to a codec process; everything around it stays. */
  def stubArrowKernel(in: VectorSchemaRoot, out: VectorSchemaRoot): Unit = {
    val docId = in.getVector("doc_id").asInstanceOf[BigIntVector]
    val payload = in.getVector("payload").asInstanceOf[VarBinaryVector]
    val oId = out.getVector("doc_id").asInstanceOf[BigIntVector]
    val oBytes = out.getVector("n_bytes").asInstanceOf[BigIntVector]
    val oW = out.getVector("width").asInstanceOf[IntVector]
    val oH = out.getVector("height").asInstanceOf[IntVector]
    val oC = out.getVector("channels").asInstanceOf[IntVector]
    val n = in.getRowCount
    var i = 0
    while (i < n) {
      val nb = payload.get(i).length.toLong
      oId.setSafe(i, docId.get(i))
      oBytes.setSafe(i, nb)
      oW.setSafe(i, (nb % 640).toInt)
      oH.setSafe(i, ((nb * 7) % 480).toInt)
      oC.setSafe(i, 3)
      i += 1
    }
    out.setRowCount(n)
  }

  /** The Arrow-batch decode pipeline: each partition's rows are packed into
    * `BatchSize`-row Arrow `VectorSchemaRoot` batches (payload bytes laid
    * out columnar, one contiguous buffer per batch), handed to the kernel,
    * and the feature batch is read back as typed rows. Allocations are
    * per-batch and closed eagerly, so peak native memory is one batch of
    * payloads per task — the same bound a real codec handoff needs. */
  def featuresArrow(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs, idCol, textCol).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        val alloc = new RootAllocator()
        val in = VectorSchemaRoot.create(mediaArrowSchema, alloc)
        val out = VectorSchemaRoot.create(featureArrowSchema, alloc)
        try {
          in.allocateNew()
          val docId = in.getVector("doc_id").asInstanceOf[BigIntVector]
          val payload = in.getVector("payload").asInstanceOf[VarBinaryVector]
          batch.zipWithIndex.foreach { case (r, i) =>
            docId.setSafe(i, r.doc_id)
            payload.setSafe(i, r.payload)
          }
          in.setRowCount(batch.size)
          out.allocateNew()
          stubArrowKernel(in, out)
          val oId = out.getVector("doc_id").asInstanceOf[BigIntVector]
          val oBytes = out.getVector("n_bytes").asInstanceOf[BigIntVector]
          val oW = out.getVector("width").asInstanceOf[IntVector]
          val oH = out.getVector("height").asInstanceOf[IntVector]
          val oC = out.getVector("channels").asInstanceOf[IntVector]
          // materialize before close: the vectors' buffers die with alloc
          (0 until out.getRowCount).map(i =>
            MediaFeatures(oId.get(i), oBytes.get(i), oW.get(i), oH.get(i), oC.get(i)))
        } finally { in.close(); out.close(); alloc.close() }
      }
    }.toDF()
  }

  /** The Arrow IPC wire contract, end-to-end: each input batch is
    * serialized through the IPC STREAM format — the exact bytes a codec
    * subprocess would read from its pipe — deserialized again, and only
    * the deserialized batch is handed to the kernel. No codec process
    * exists in this sandbox, so the trip is loopback, but schema and
    * buffers provably survive serialization bit-exactly (asserted against
    * [[featuresArrow]] in MultimodalSpec); a real deployment replaces the
    * loopback streams with the subprocess pipe and changes nothing else. */
  def featuresArrowIpc(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs, idCol, textCol).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        val alloc = new RootAllocator()
        val in = VectorSchemaRoot.create(mediaArrowSchema, alloc)
        val out = VectorSchemaRoot.create(featureArrowSchema, alloc)
        try {
          in.allocateNew()
          val docId = in.getVector("doc_id").asInstanceOf[BigIntVector]
          val payload = in.getVector("payload").asInstanceOf[VarBinaryVector]
          batch.zipWithIndex.foreach { case (r, i) =>
            docId.setSafe(i, r.doc_id)
            payload.setSafe(i, r.payload)
          }
          in.setRowCount(batch.size)
          // write the batch to IPC stream bytes (the subprocess' stdin)…
          val wire = new java.io.ByteArrayOutputStream()
          val writer = new ArrowStreamWriter(in, null,
            java.nio.channels.Channels.newChannel(wire))
          writer.start(); writer.writeBatch(); writer.end(); writer.close()
          // …and run the kernel on what comes back off the wire
          val reader = new ArrowStreamReader(
            new java.io.ByteArrayInputStream(wire.toByteArray), alloc)
          try {
            require(reader.loadNextBatch(), "empty IPC stream")
            out.allocateNew()
            stubArrowKernel(reader.getVectorSchemaRoot, out)
          } finally reader.close()
          val oId = out.getVector("doc_id").asInstanceOf[BigIntVector]
          val oBytes = out.getVector("n_bytes").asInstanceOf[BigIntVector]
          val oW = out.getVector("width").asInstanceOf[IntVector]
          val oH = out.getVector("height").asInstanceOf[IntVector]
          val oC = out.getVector("channels").asInstanceOf[IntVector]
          (0 until out.getRowCount).map(i =>
            MediaFeatures(oId.get(i), oBytes.get(i), oW.get(i), oH.get(i), oC.get(i)))
        } finally { in.close(); out.close(); alloc.close() }
      }
    }.toDF()
  }

  /** Decode via a REAL codec subprocess, one per partition, speaking the
    * Arrow IPC stream contract over its stdin/stdout pipes. This is the
    * process-management half a production out-of-JVM codec needs — spawn,
    * feed, drain, reap, error propagation — proven here with a passthrough
    * command: `/bin/cat` echoes the media batches bit-exactly, so the
    * feature kernel runs on exactly the bytes that survived the pipe
    * (asserted equal to the in-memory path in MultimodalSpec). A real
    * codec binary would return feature-schema batches instead and the
    * JVM-side kernel call disappears; everything else stays.
    *
    * Deadlock-safe by construction (the Spark PythonRunner shape): a
    * feeder thread consumes the partition iterator and writes stdin while
    * the task thread reads stdout, so neither pipe can fill up and stall
    * the child; stderr is drained concurrently too. A nonzero exit, a
    * feed failure, or a torn output stream fails the task with the
    * child's exit code and captured stderr attached. Peak memory per task
    * stays one `BatchSize` batch on each side of the pipe. */
  def featuresSubprocess(docs: DataFrame, idCol: String, textCol: String,
                         cmd: Seq[String] = Seq("/bin/cat")): DataFrame =
    subprocessFeatures(asMedia(docs, idCol, textCol), cmd, childEmitsFeatures = false)

  /** Decode REAL images through a REAL (non-passthrough) codec process:
    * payloads are actual PNGs ([[asPngMedia]]) and the child —
    * [[graft.tools.ArrowPngCodec]], a separate JVM doing genuine ImageIO
    * bit parsing — returns FEATURE batches, so no JVM-side kernel runs at
    * all. The image sizes derive from the text length, which is what lets
    * a SQL oracle independently predict the decoder's output end-to-end. */
  def realCodecFeatures(docs: DataFrame, idCol: String, textCol: String,
                        cmd: Seq[String] = pngCodecCmd): DataFrame =
    subprocessFeatures(asPngMedia(docs, idCol, textCol), cmd, childEmitsFeatures = true)

  /** The JPEG twin of [[realCodecFeatures]]: payloads are actual JPEGs
    * (ImageIO's real JFIF encoder — SOI/DQT/SOF0/entropy-coded scan), so
    * the child exercises ImageIO's JPEG bit parser, not the PNG one.
    * Lossy coding changes pixels, never geometry: width/height/channels
    * stay an exact SQL-predictable function of the text length. Distinct
    * moduli from the PNG path so a format mixup cannot pass both oracles. */
  def jpegCodecFeatures(docs: DataFrame, idCol: String, textCol: String,
                        cmd: Seq[String] = pngCodecCmd): DataFrame =
    subprocessFeatures(asImageMedia(docs, idCol, textCol, "jpg", "image/jpeg",
      wMod = 13, hMod = 9), cmd, childEmitsFeatures = true)

  /** The codec command for THIS environment: a fresh JVM running
    * [[graft.tools.ArrowPngCodec]] off the same classpath (the sandbox
    * ships no native codec binary; a deployment substitutes its own
    * command — the stream contract is unchanged). Computed driver-side:
    * in local mode the executor classpath IS this JVM's classpath. */
  def pngCodecCmd: Seq[String] = Seq(
    s"${System.getProperty("java.home")}/bin/java",
    "--add-opens", "java.base/java.nio=ALL-UNNAMED",
    "--add-opens", "java.base/java.lang=ALL-UNNAMED",
    "--add-opens", "java.base/java.util=ALL-UNNAMED",
    "-Djava.awt.headless=true",
    "-Dio.netty.tryReflectionSetAccessible=true",
    "-Xmx512m",
    "-cp", System.getProperty("java.class.path"),
    "graft.tools.ArrowPngCodec")

  /** Deterministic REAL PNG payloads: each doc becomes a (1+len%16) ×
    * (1+len%12) TYPE_3BYTE_BGR image encoded with ImageIO — genuine PNG
    * bytes (signature, IHDR, zlib'd IDAT), sized from the text length so
    * a SQL oracle can predict what a real decoder must report. Pixels are
    * a deterministic function of (doc_id, x, y). */
  def asPngMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] =
    asImageMedia(docs, idCol, textCol, "png", "image/png", wMod = 16, hMod = 12)

  /** Deterministic real image payloads in any ImageIO-writable format:
    * each doc becomes a (1+len%wMod) × (1+len%hMod) TYPE_3BYTE_BGR image
    * encoded with ImageIO — genuine container bytes, sized from the text
    * length so a SQL oracle can predict what a real decoder must report.
    * Pixels are a deterministic function of (doc_id, x, y). */
  def asImageMedia(docs: DataFrame, idCol: String, textCol: String,
                   fmt: String, mime: String, wMod: Int, hMod: Int): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        (lit(1) + length(col(textCol)) % wMod).as("w"),
        (lit(1) + length(col(textCol)) % hMod).as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (((id + x * 31 + y * 7) % 255).toInt << 16) | 0x8040)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        MediaRow(id, bos.toByteArray, mime)
      }
  }

  /** `childEmitsFeatures`: a passthrough child echoes MEDIA batches and the
    * stub kernel runs JVM-side on what survived the pipe; a real codec
    * child returns FEATURE batches directly and no JVM kernel runs. */
  private def subprocessFeatures(media: Dataset[MediaRow], cmd: Seq[String],
                                 childEmitsFeatures: Boolean): DataFrame = {
    import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val proc = new ProcessBuilder(cmd.asJava).start()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => { proc.destroyForcibly(); () }))
        val alloc = new RootAllocator()
        val stderrBuf = new java.io.ByteArrayOutputStream()
        val errDrain = new Thread(() => {
          try { proc.getErrorStream.transferTo(stderrBuf); () }
          catch { case _: java.io.IOException => () }
        }, "graft-codec-stderr")
        errDrain.setDaemon(true); errDrain.start()
        val feedErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
        val taskCtx = org.apache.spark.TaskContext.get()
        val feeder = new Thread(() => {
          // the partition iterator is consumed on THIS thread: carry the
          // task's context so upstream operator code under it still sees it
          if (taskCtx != null) org.apache.spark.GraftSparkBridge.setTaskContext(taskCtx)
          val in = VectorSchemaRoot.create(mediaArrowSchema, alloc)
          try {
            val writer = new ArrowStreamWriter(in, null,
              java.nio.channels.Channels.newChannel(proc.getOutputStream))
            writer.start()
            rows.grouped(BatchSize).foreach { batch =>
              in.allocateNew()
              val docId = in.getVector("doc_id").asInstanceOf[BigIntVector]
              val payload = in.getVector("payload").asInstanceOf[VarBinaryVector]
              batch.zipWithIndex.foreach { case (r, i) =>
                docId.setSafe(i, r.doc_id)
                payload.setSafe(i, r.payload)
              }
              in.setRowCount(batch.size)
              writer.writeBatch()
            }
            writer.end(); writer.close()
          } catch {
            // feed failure (dead child broke the pipe, OR the upstream
            // iterator itself threw): record it and kill the child so the
            // reader side can never block forever on its stdout
            case t: Throwable => feedErr.set(t); proc.destroyForcibly(); ()
          } finally {
            in.close()
            // always end the child's stdin — a child still waiting on
            // input would otherwise never finish its output stream
            try proc.getOutputStream.close()
            catch { case _: java.io.IOException => () }
          }
        }, "graft-codec-feeder")
        feeder.setDaemon(true); feeder.start()

        val reader = new ArrowStreamReader(proc.getInputStream, alloc)
        val out = VectorSchemaRoot.create(featureArrowSchema, alloc)

        // on the error path, kill the child FIRST: that snaps both pipes,
        // so a feeder blocked mid-write unblocks and the join returns. On
        // the clean path, still bound the wait — a codec that ended its
        // output but stopped draining stdin would strand the feeder on a
        // full pipe; killing the child snaps it loose
        def reap(destroyFirst: Boolean): Int = {
          if (destroyFirst) proc.destroyForcibly()
          feeder.join(10000)
          if (feeder.isAlive) { proc.destroyForcibly(); feeder.join() }
          errDrain.join(2000); proc.waitFor()
        }
        def closeQuietly(): Unit = {
          try reader.close() catch { case _: Throwable => () }
          try out.close() catch { case _: Throwable => () }
          try alloc.close() catch { case _: Throwable => () }
        }
        def childError(code: Int, cause: Throwable): Exception = {
          val err = stderrBuf.toString("UTF-8").take(4096)
          new RuntimeException(
            s"codec subprocess ${cmd.mkString(" ")} exited $code" +
              (if (err.nonEmpty) s"; stderr: $err" else ""), cause)
        }
        def feedFailure(): Exception =
          new RuntimeException("codec subprocess feed failed", feedErr.get)

        new Iterator[MediaFeatures] {
          private var cur: Iterator[MediaFeatures] = Iterator.empty
          private var done = false
          override def hasNext: Boolean = {
            while (!cur.hasNext && !done) {
              val more =
                try reader.loadNextBatch()
                catch { // torn/empty stream — attribute it to the child
                  case t: Throwable =>
                    done = true
                    val code = reap(destroyFirst = true)
                    closeQuietly()
                    throw (if (feedErr.get != null) feedFailure()
                           else if (code != 0) childError(code, t) else t)
                }
              if (more) {
                val feat =
                  if (childEmitsFeatures) reader.getVectorSchemaRoot
                  else {
                    out.allocateNew()
                    stubArrowKernel(reader.getVectorSchemaRoot, out)
                    out
                  }
                val oId = feat.getVector("doc_id").asInstanceOf[BigIntVector]
                val oBytes = feat.getVector("n_bytes").asInstanceOf[BigIntVector]
                val oW = feat.getVector("width").asInstanceOf[IntVector]
                val oH = feat.getVector("height").asInstanceOf[IntVector]
                val oC = feat.getVector("channels").asInstanceOf[IntVector]
                // materialize before the next batch reuses the buffers
                cur = (0 until feat.getRowCount).map(i => MediaFeatures(
                  oId.get(i), oBytes.get(i), oW.get(i), oH.get(i), oC.get(i))).iterator
              } else {
                done = true
                reader.close(); out.close()
                val code = reap(destroyFirst = false)
                alloc.close()
                if (feedErr.get != null) throw feedFailure()
                if (code != 0) throw childError(code, null)
              }
            }
            cur.hasNext
          }
          override def next(): MediaFeatures = { hasNext; cur.next() }
        }
      }
    }.toDF()
  }

  // ---- further stubbed media kernels (same batched plumbing) ----

  final case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])
  final case class FrameSample(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB resize: deterministic payload downsample standing in for an image
    * scaler; real part is the schema + bounded batch memory. */
  def resizeStub(r: MediaRow, w: Int, h: Int): ResizedMedia = {
    val target = math.max(1, math.min(r.payload.length, w * h))
    val step = math.max(1, r.payload.length / target)
    ResizedMedia(r.doc_id, w, h, r.payload.grouped(step).map(_.head).toArray)
  }

  /** STUB frame sampling: every `stride`-th payload window as a "frame" —
    * stands in for video frame extraction; one input row fans out to many
    * frame rows (the shape that matters for partition sizing at scale). */
  def frameSampleStub(r: MediaRow, frameBytes: Int, stride: Int): Iterator[FrameSample] =
    r.payload.grouped(frameBytes).zipWithIndex
      .filter { case (_, idx) => idx % stride == 0 }
      .map { case (bytes, idx) => FrameSample(r.doc_id, idx, bytes) }

  def resized(docs: DataFrame, idCol: String, textCol: String, w: Int, h: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs, idCol, textCol)
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(resizeStub(_, w, h)))).toDF()
  }

  def frames(docs: DataFrame, idCol: String, textCol: String,
             frameBytes: Int = 64, stride: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs, idCol, textCol)
      .mapPartitions(_.flatMap(frameSampleStub(_, frameBytes, stride))).toDF()
  }
}
