package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_minhash callable from SQL as an aggregate") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "a b c d"), (2L, "a b c d")).toDF("id", "t").createOrReplaceTempView("mh_docs")
    val rows = spark.sql(
      """SELECT id, graft_minhash(arrays_zip(slice(split(t, ' '), 1, 2), slice(split(t, ' '), 2, 2)), 8, 2) AS sig
        |FROM mh_docs GROUP BY id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == 8)
    assert(rows(1L) == rows(2L)) // identical docs, identical signatures
  }
}
