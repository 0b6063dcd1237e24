package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val df = Registry.byName(name).run(spark, dir)
      println(df.queryExecution.optimizedPlan.toString.linesIterator
        .map(_.take(200)).take(60).mkString("\n"))
    }
    spark.stop()
  }
}
