package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/audit tool: `runMain graft.tools.Explain <sfDir> [query...]`
  * prints the formatted physical plan for each named query (all if none
  * given) — used to audit pushdown / broadcast / codegen spans.
  * `runMain graft.tools.Explain <sfDir> --time q1 q2` times each query
  * twice (cold + warm). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1)
    val (timeMode, names0) = rest.partition(_ == "--time")
    val names = if (names0.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted else names0.toSeq

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (timeMode.nonEmpty) {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          println(f"TIME $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } else {
        println(s"\n========== $n ==========")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
