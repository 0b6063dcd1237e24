package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler: `runMain graft.ProfileQueries <name> [name ...]` runs
  * each named registry query once warm, once measured, with a listener
  * recording per-query job count, summed job wall time and the gap
  * (wall − jobs = driver/FS/planning time between jobs). Distinguishes
  * "many small jobs" (fix: fewer actions / overlap) from "slow jobs"
  * (fix: plan work) for the lifecycle-heavy queries.
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-prof-wh").toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(Integer.valueOf(je.jobId))
        if (t0 != null) { jobs += 1; jobNanos += System.nanoTime() - t0.longValue() }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val names =
      if (args.sameElements(Array("all"))) Registry.all.map(_.name).sorted
      else args.toSeq
    names.foreach { name =>
      def once(): (Double, Int, Double) = {
        jobs = 0; jobNanos = 0L
        val t0 = System.nanoTime()
        Registry.byName(name).run(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; a short quiesce keeps counts honest
        Thread.sleep(200L)
        (wall, jobs, jobNanos / 1e9)
      }
      once() // warm
      val (wall, n, injob) = once()
      println(f"[prof] $name%-34s wall=$wall%6.2f jobs=$n%4d injob=$injob%6.2f gap=${wall - injob}%6.2f")
    }
    spark.stop()
  }
}
