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
}
