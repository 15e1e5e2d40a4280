package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational results must not depend on the wire format: the same q1-shape
  * aggregate over parquet, CSV, and JSON copies of lineitem must agree
  * row-for-row (readers differ in parsers/pushdown, not semantics). */
class SourceParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q1ish(li: DataFrame): Seq[(String, String, Double, Long)] =
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted

  test("q1 aggregate agrees across parquet, CSV, and JSON lineitem") {
    val pq = Tables.lineitem(spark, TestSpark.sf)
    val base = s"target/tmp/source_parity"
    pq.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    pq.write.mode("overwrite").json(s"$base/json")
    val fromCsv = spark.read.schema(pq.schema).option("header", "true").csv(s"$base/csv")
    val fromJson = spark.read.schema(pq.schema).json(s"$base/json")
    val expected = q1ish(pq)
    assert(q1ish(fromCsv) == expected)
    assert(q1ish(fromJson) == expected)
  }

  test("hostile document text (quotes/commas/newlines/unicode) survives CSV and JSON") {
    import spark.implicits._
    // the shapes that corrupt naive delimited exports: embedded delimiter,
    // quote char, record separator, backslash, non-ASCII
    val docs = Seq(
      (0L, "plain text"),
      (1L, "comma, inside"),
      (2L, "a \"quoted\" phrase"),
      (3L, "line one\nline two\nline three"),
      (4L, "backslash \\ and tab\there"),
      (5L, "unicode: 你好 — emØji ✓"),
      (6L, "")).toDF("doc_id", "text")
    val base = "target/tmp/source_parity_hostile"
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    val expected = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // multiLine: embedded newlines make one logical row span physical lines
    val fromCsv = spark.read.schema(docs.schema)
      .option("header", "true").option("multiLine", "true")
      .csv(s"$base/csv").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val fromJson = spark.read.schema(docs.schema).json(s"$base/json").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    assert(fromJson == expected)
    assert(fromCsv == expected)
    // and the text operators compute identical results over the reread copy
    val viaJson = graft.ops.TextOps.stats(
      spark.read.schema(docs.schema).json(s"$base/json"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = graft.ops.TextOps.stats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJson == direct)
  }

  test("writePartitioned exports the Hive layout for csv and json targets") {
    import spark.implicits._
    // hostile text + a skewed partition column: the export twin of the
    // parquet ingestion path (same rebalance clustering, same dir layout)
    val docs = Seq(
      (0L, "web", "comma, inside"),
      (1L, "web", "a \"quoted\" phrase"),
      (2L, "web", "unicode: 你好 ✓"),
      (3L, "books", "line one\nline two"),
      (4L, "books", "")).toDF("doc_id", "source", "text")
    for (fmt <- Seq("csv", "json")) {
      val path = s"target/tmp/export_part_$fmt"
      graft.ops.Ingest.writePartitioned(docs, path, "source", fmt)
      // Hive directory layout per partition value
      val dirs = new java.io.File(path).list().filter(_.startsWith("source=")).sorted
      assert(dirs.toSeq == Seq("source=books", "source=web"), dirs.toSeq)
      val schema = "doc_id LONG, text STRING" // source comes from the dirs
      val back = (if (fmt == "csv")
        spark.read.schema(schema + ", source STRING")
          .option("header", "true").option("multiLine", "true").option("escape", "\"")
          .csv(path)
      else spark.read.schema(schema + ", source STRING").json(path))
        .collect()
        .map(r => (r.getLong(0), r.getString(2), Option(r.getString(1)).getOrElse("")))
        .toSet
      val expected = docs.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(back == expected, s"$fmt roundtrip: $back")
    }
    // unsupported targets fail loudly, not with a half-written directory
    val e = intercept[IllegalArgumentException](
      graft.ops.Ingest.writePartitioned(docs, "target/tmp/export_bad", "source", "orc"))
    assert(e.getMessage.contains("orc"))
  }
}
