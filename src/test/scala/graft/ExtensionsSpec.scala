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

  test("graft_fingerprint callable from SQL, equals the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "other words"))
      .toDF("id", "t").createOrReplaceTempView("fp_docs")
    val viaSql = spark.sql("SELECT id, graft_fingerprint(t) AS fp FROM fp_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Seq((1L, "alpha beta gamma")).toDF("id", "t")
      .select(graft.functions.Md5Fingerprint.fingerprint(org.apache.spark.sql.functions.col("t")))
      .head().getLong(0)
    assert(viaSql(1L) == viaCol && viaSql(1L) == viaSql(2L) && viaSql(1L) != viaSql(3L))
  }
}
