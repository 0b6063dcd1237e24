package graft

import org.apache.spark.sql.SparkSession

/** Tiny ad-hoc timer: `runMain graft.TimeQueries <name> [name ...]` —
  * warms each named registry query once, then times 3 passes at
  * SPARK_GRAFT_SF_DIR (the Bench loop's noop-write shape without the
  * full sweep), for single-query plan work.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-time-wh").toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        Registry.byName(name).run(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ts = (1 to 3).map(_ => once())
      println(f"[time] $name: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
