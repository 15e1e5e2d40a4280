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

  test("graft_bloom_agg + graft_might_contain: no false negatives from SQL") {
    import spark.implicits._
    GraftExtensions.register(spark)
    (0L until 1000L).toDF("v").createOrReplaceTempView("bloom_in")
    // build the filter as one aggregated binary, re-enter it as a literal
    // (might_contain requires a foldable bloom argument)
    val bf = spark.sql(
      "SELECT graft_bloom_agg(xxhash64(v), 1000) AS bf FROM bloom_in")
      .head().getAs[Array[Byte]]("bf")
    spark.range(0, 2000).toDF("v").createOrReplaceTempView("bloom_probe")
    import org.apache.spark.sql.functions._
    val probe = spark.table("bloom_probe").withColumn("hit",
      org.apache.spark.sql.GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(bf),
          org.apache.spark.sql.GraftSqlBridge.expression(xxhash64(col("v"))))))
    val inserted = probe.filter(col("v") < 1000 && !col("hit")).count()
    assert(inserted == 0, "bloom filters must never produce false negatives")
    // absent half: false-positive rate stays near the sizing target (~2%)
    val fp = probe.filter(col("v") >= 1000 && col("hit")).count()
    assert(fp < 100, s"false-positive count $fp out of 1000 is implausible")
  }

  test("graft_cms_estimate: never undercounts, exact on a skewed fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // skewed multiset: token t_i appears i times, i in 1..50
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"t_$i"))
    rows.toDF("token").createOrReplaceTempView("cms_in")
    val sk = spark.sql(
      "SELECT count_min_sketch(token, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 1) AS s FROM cms_in")
      .head().getAs[Array[Byte]]("s")
    val est = spark.table("cms_in").distinct()
      .withColumn("est", graft.functions.CmsEstimate.estimate(sk, col("token")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { i =>
      val e = est(s"t_$i")
      assert(e >= i, s"CMS undercounted t_$i: $e < $i")
      // eps=1e-4 over N=1275 insertions: overcount beyond +1 is implausible
      assert(e <= i + 1, s"CMS wildly overcounted t_$i: $e vs $i")
    }
    // SQL-surface registration path: re-enter the sketch as a foldable
    // unhex() literal and probe from plain SQL text
    val hexStr = sk.map(b => f"${b & 0xff}%02x").mkString
    val viaSql = spark.sql(
      s"SELECT graft_cms_estimate(unhex('$hexStr'), 't_50') AS e")
      .head().getLong(0)
    assert(viaSql == est("t_50"), "SQL surface must match the Column API")
  }

  test("heavyHitters: CMS two-pass equals the exact HAVING computation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf)
    val got = graft.ops.TextOps.heavyHitters(docs, "text", minCount = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = docs.select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n")).filter(col("n") >= 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("graft_cms_estimate: a NULL sketch yields null, not an NPE") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // count_min_sketch over zero rows is null; both the codegen'd and the
    // interpreted path must null-propagate like any BinaryExpression
    val probe = Seq("x", "y").toDF("token")
      .withColumn("est", graft.functions.CmsEstimate.estimate(null, col("token")))
    assert(probe.collect().forall(_.isNullAt(1)))
    assert(probe.filter(col("est").isNull).count() == 2)
  }
}
