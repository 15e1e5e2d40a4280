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
