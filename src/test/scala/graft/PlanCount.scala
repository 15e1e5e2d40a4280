package graft

/** Scratch calibration main (not a test): prints exchange/scan counts per
  * pinned query for the final-plan section only. */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = Seq("q2_filter_pushdown", "q5_region_revenue", "dedup_minhash_pairs",
      "dedup_simhash", "report_sources", "pipeline_curate", "arr_recipe_scanpy",
      "arr_matmul_bucketed")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, TestSpark.sf)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val fin = full.split("== Initial Plan ==").head
      def cnt(s: String, re: String) = re.r.findAllIn(s).length
      println(f"$n%-22s finalEx=${cnt(fin, "Exchange (hash|range|single)partitioning")} fullEx=${cnt(full, "Exchange (hash|range|single)partitioning")} finalScan=${cnt(fin, "Scan parquet")} fullScan=${cnt(full, "Scan parquet")} reused=${fin.contains("ReusedExchange")}")
    }
  }
}
