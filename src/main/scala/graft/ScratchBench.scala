package graft

/** Scratch driver for one-off plan/timing probes (not part of the API).
  * Current probe: report every registered query whose LOGICAL plan
  * contains a Window with an EMPTY partition spec — the
  * single-partition-window scale smell. Flagged hits need a human
  * read: a global window over provably tiny input (q49's month spine,
  * a rank over an already-LIMITed top-k, dq07's band table) is fine
  * and stays. Note constructing some queries executes real work
  * (ingestion queries land tables, quantizer collects run jobs) — this
  * is a dev probe, not a pure static check; run it against a scratch
  * warehouse only (the temp dir below).
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val spark = GraftSession.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-scratch-wh").toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val skip = (n: String) => n.startsWith("str") || n.startsWith("cp01")
    for (d <- Registry.all if !skip(d.name)) {
      try {
        // logical plan: AQE-proof (AdaptiveSparkPlanExec hides its
        // children from TreeNode.collect until execution)
        val plan = d.run(spark, dir).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) println(s"GLOBALWIN ${d.name}: ${bad.size}")
      } catch {
        case e: Throwable => println(s"ERR ${d.name}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
