package graft

import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline must stay a single-scan plan: all four
  * per-row signals (quality, repetition, langid, mix hash) evaluate inside
  * one Project/Filter over one documents scan, and the only shuffles belong
  * to the exact-dedup keeper semi-join — NOT one join per signal. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline_curate: one documents scan per side, no per-signal joins") {
    val df = SparkEntry.queries("pipeline_curate")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"expected 2 scans (pipeline side + keeper side), got $scans:\n$plan")
    val joins = "Join".r.findAllIn(plan).size
    assert(joins == 1, s"expected exactly the keeper semi-join, got $joins joins")
    assert(df.count() > 0)
  }

  test("JSONL roundtrip survives escaping-hostile text (quotes, newlines, unicode)") {
    import spark.implicits._
    val hostile = Seq(
      (0L, "s0", "en", "plain text"),
      (1L, "s0", "en", "embedded \"quotes\" and \\backslashes\\"),
      (2L, "s1", "de", "line\nbreak and\ttab"),
      (3L, "s1", "ja", "日本語テキスト ユニコード"),
      (4L, "s2", "en", ""),
      (5L, "s2", "en", "{\"looks\":\"like json\"}"))
      .toDF("doc_id", "source", "lang", "text")
    val path = s"${graft.GraftPaths.tmpRoot}/jsonl_spec"
    hostile.write.mode("overwrite").json(path)
    val back = spark.read.schema(hostile.schema).json(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    // Spark's JSON writer drops empty-string fields? No - but NULL vs ""
    // must round-trip faithfully; assert exact set equality
    val exp = hostile.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet
    assert(back == exp, s"roundtrip drift: ${back.diff(exp)} vs ${exp.diff(back)}")
  }

  test("pipeline_curate_obs: observed counters reconcile with the curation itself") {
    val m = SparkEntry.queries("pipeline_curate_obs")(spark, TestSpark.sf).head()
    val total = m.getLong(0)
    val kept = m.getLong(6)
    assert(total == Tables.documents(spark, TestSpark.sf).count())
    assert(kept == SparkEntry.queries("pipeline_curate")(spark, TestSpark.sf).count(),
      "n_kept must equal the curation query's own row count")
    // every rejection counter bounded by total; kept + any counter <= total
    val counters = (1 to 5).map(m.getLong)
    assert(counters.forall(c => c >= 0 && c <= total))
    assert(counters.forall(c => kept + c <= total))
  }
}
