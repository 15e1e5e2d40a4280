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
    * The REBALANCE-on-the-partition-column shuffle is load-bearing twice
    * over: without any clustering, every write task holds a sliver of
    * every partition value, emitting numTasks × numValues tiny files —
    * the classic small-files failure at scale. A plain
    * `repartition(col)` fixes that but funnels each value into exactly
    * ONE task (AQE can merge small partitions, never split a hot one),
    * serializing the hottest date/source. The rebalance hint keeps
    * values clustered AND lets AQE's skew splitter fan a hot value out
    * across tasks — a few files for the hot directory, one for the
    * rest. */
  /** `format`: "parquet" (default), "csv", or "json" — the same
    * Hive-partitioned directory layout and rebalance clustering for every
    * target, so a pipeline exporting curated text to line-JSON or CSV for
    * a downstream consumer gets the identical small-files/skew story as
    * the parquet fact tables. CSV writes a header and quotes/escapes so
    * hostile text (embedded commas, quotes, newlines) survives — pair
    * with the multiLine read option SourceParitySpec pins. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       format: String = "parquet"): Unit = {
    require(Set("parquet", "csv", "json").contains(format),
      s"unsupported export format '$format' (parquet, csv, json)")
    val w = df.hint("rebalance", partitionCol)
      .write.partitionBy(partitionCol).mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true").option("escape", "\"")
     else w).save(path)
  }

  /** Stage a table SORT-CLUSTERED on a predicate column, with bounded
    * parquet row groups — the zone-map layout. Sorting makes each row
    * group's min/max stats on `sortCol` a tight range, so a selective
    * filter prunes whole row groups at scan time (Spark pushes the
    * predicate to parquet; with record-level filtering off — the default
    * — the scan emits ONLY surviving groups' rows, which is the metric
    * IngestSpec asserts). `blockBytes` bounds the row-group size: the
    * skipping granularity at 100 TB, where the default 128 MB groups are
    * right but a test needs several groups per small file.
    *
    * `repartitionByRange` + in-partition sort gives globally
    * NON-OVERLAPPING file ranges, so file-level stats prune whole FILES
    * the same way — the two-level zone map production layouts rely on. */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  blockBytes: Long = 128L << 20, files: Int = 4): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
      .parquet(path)
}
