package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion into scale-ready storage layouts.
  *
  * At 100 TB a fact table is never one parquet file — it is a directory
  * tree partitioned on a low-cardinality predicate column (date, source,
  * region), so that a filtered query PLANS only the matching directories
  * and the other years/sources are never listed, opened, or read. The
  * testdata ships single files; [[writePartitioned]] is the ingestion step
  * that produces the production layout, and the q26 gate query proves the
  * scan prunes on it.
  */
object Ingest {

  /** Stage a table into a Hive-partitioned parquet directory
    * (`path/col=value/part-*.parquet`).
    *
    * The repartition on the partition column is load-bearing: without it
    * every write task holds a sliver of every partition value, emitting
    * numPartitions × numValues tiny files — the classic small-files
    * failure at scale. With it, each partition directory is written by
    * the one task that owns the value (AQE coalesces skewed values). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.partitionBy(partitionCol).mode("overwrite").parquet(path)
}
