package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata star schema (TESTDATA.md).
  * One parquet file per table; filters/projections applied by callers are
  * pushed into the scan by Catalyst (verified via explain in tests).
  */
object Tables {
  /** Schema per table path, read once per JVM (r20): the bare
    * `read.parquet(path)` infers schema from a parquet footer on the
    * DRIVER on every call — a per-query metadata tax across the 300+
    * bench queries (the role a catalog/metastore plays in a real
    * deployment, and the same memo Stream.schemas already keeps for the
    * streaming source). The testdata contract (TESTDATA.md) pins the
    * files immutable, so a cached schema can never go stale; data reads
    * are untouched — every query still scans the parquet bytes. */
  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemas.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  /** events.parquet carries nanosecond timestamps, which Spark only reads
    * via `spark.sql.legacy.parquet.nanosAsLong` (set in Verify/Bench/test
    * sessions). Normalize to a microsecond TIMESTAMP here so downstream
    * operators see a standard column either way. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))

  /** The ONE nanosecond-ts normalization rule, shared by the batch reader
    * above and the streaming source (Stream.eventsStream) so the two
    * engines can never truncate event time differently. Works on batch
    * and streaming frames alike (schema-driven). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // naive timestamp[us] parquet reads as TIMESTAMP_NTZ, which streaming
      // watermarks reject; the session tz is pinned UTC everywhere, so the
      // cast to instant TIMESTAMP is value-preserving (and matches the
      // DuckDB oracle, which reads the same bytes as naive-UTC)
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
