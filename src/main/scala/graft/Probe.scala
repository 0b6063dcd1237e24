package graft

/** Scratch driver for manual end-to-end runs (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8").getOrCreate()
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q01_pricing_summary", "q02_filter_pushdown", "q03_topk_revenue",
        "q05_region_volume", "q06_revenue_forecast")) {
      println(s"===== $name =====")
      val plan = Registry.byName(name).run(spark, dir).queryExecution.executedPlan.toString
      // condense: scans with pushed filters, joins, codegen boundaries
      plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("Join") || l.contains("Exchange") || l.contains("ReadSchema") ||
          l.contains("TakeOrderedAndProject"))
        .take(25).foreach(l => println(l.take(260)))
    }
    spark.stop()
  }
}
