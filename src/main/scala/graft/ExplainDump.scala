package graft

/** Dump `.explain("formatted")` for named registry queries to files —
  * `runMain graft.ExplainDump <outDir> <tag> <name> [name ...]` writes
  * `<outDir>/<name>_<tag>.txt` per query (tag = "before"/"after").
  * `all` expands to every registered query. Plans are built at
  * SPARK_GRAFT_SF_DIR (default sf0.01) with the bench's session shape
  * (same shuffle-partition and AQE settings) so plan claims in
  * OPTIMIZATION_r13.md are reproducible from these files.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.drop(2).sameElements(Array("all"))) Registry.all.map(_.name)
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      try {
        val df = Registry.byName(name).run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[explain] wrote $name")
      } catch {
        case e: Throwable =>
          println(s"[explain] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
