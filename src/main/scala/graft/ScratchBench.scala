package graft

/** Scratch driver for one-off plan/timing probes (not part of the API).
  * Current probe: report every registered query whose physical plan
  * contains a WindowExec with an EMPTY partition spec over
  * non-broadcast input — the single-partition-window scale smell.
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val spark = GraftSession.builder("8").getOrCreate()
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
