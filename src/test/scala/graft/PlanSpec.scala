package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-plan regression gate for the heaviest queries: the bench's noise
  * envelope (±2 s per query) is wider than most real plan regressions, so
  * plan SHAPE is the stable signal. Each assert pins the property that
  * makes the query scale — an added Exchange, an extra corpus scan, a lost
  * pushdown, or a lost broadcast fails here long before it would show in
  * the bench. Counts are on the final (post-AQE) executed plan; if a
  * deliberate plan change moves one, update the pin in the same commit. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.collect() // finalize AQE so reuse and runtime joins are visible
    df.queryExecution.executedPlan.toString
  }

  private def exchanges(plan: String): Int =
    "Exchange (hash|range|single)partitioning".r.findAllIn(plan).length
  private def parquetScans(plan: String): Int =
    "Scan parquet".r.findAllIn(plan).length

  test("q2_filter_pushdown: comparison filters reach the parquet scan") {
    val plan = executedPlan("q2_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), s"no pushdown in:\n$plan")
    assert("PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|EqualTo)".r
      .findFirstIn(plan).isDefined, s"no comparison filter pushed in:\n$plan")
  }

  test("q5_region_revenue: dimension joins stay broadcast") {
    val plan = executedPlan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4,
      s"lost dimension broadcasts in:\n$plan")
  }

  test("dedup_minhash_pairs: one corpus-scan pipeline + candidate-bounded verify") {
    val plan = executedPlan("dedup_minhash_pairs")
    // 3 scans: signature pipeline, verify's semi-join probe, candidate docs.
    // Before the candidate localCheckpoint this was 9 scans / 27 exchanges
    // (the LSH pipeline re-ran once per use of the pairs).
    assert(parquetScans(plan) <= 3, s"extra corpus scan in:\n$plan")
    assert(exchanges(plan) <= 7, s"added exchange in:\n$plan")
  }

  test("dedup_simhash (components' edge stage): two exchanges, two scans") {
    val plan = executedPlan("dedup_simhash")
    assert(exchanges(plan) <= 2, s"added exchange in:\n$plan")
    assert(parquetScans(plan) <= 2, s"extra corpus scan in:\n$plan")
  }

  test("report_sources: fused projection, no per-signal joins") {
    // quality/langid compose as columns over ONE logical scan (the 4
    // exchanges are count_distinct's expand phases, not joins; the second
    // scan is AQE stage-reuse accounting). Pre-fusion this was 3 scans
    // plus two doc_id shuffle joins.
    val plan = executedPlan("report_sources")
    assert(parquetScans(plan) <= 2, s"extra corpus scan in:\n$plan")
    assert(exchanges(plan) <= 4, s"added exchange in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"per-signal join reappeared in:\n$plan")
  }

  test("pipeline_curate: fused single-scan curation, two exchanges") {
    val plan = executedPlan("pipeline_curate")
    assert(exchanges(plan) <= 2, s"added exchange in:\n$plan")
    assert(parquetScans(plan) <= 4, s"extra corpus scan in:\n$plan")
  }
}
