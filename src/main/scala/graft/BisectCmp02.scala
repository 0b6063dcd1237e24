package graft

import org.apache.spark.sql.SparkSession

/** Bisection harness for cmp02's bimodal bench spread (round-11
  * verdict watch item: passes [10.95, 3.85, 10.24, 3.31, 5.90]) — the
  * BisectBpe protocol applied to the clustered-compaction measurement:
  * time cmp02 in a clean JVM, after deliberately polluting the session
  * with the heavy localCheckpoint/state queries a bench sweep
  * interleaves, and after a forced GC. cmp02 writes a 64-file landing
  * and compacts it twice per pass, so the I/O-stall hypothesis (shared
  * page cache / dirty-writeback contention, not a plan property)
  * predicts: flat within each phase, no clean→post-pollution step, and
  * slow passes only when the HOST is busy — which the interleaved
  * fast/slow driver passes already hint at.
  */
object BisectCmp02 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-bisect-wh").toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      Registry.byName(name).run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def blocks(): (Int, Long) = {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.size, spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum)
    }
    def phase(label: String, n: Int): Unit = {
      val ts = (1 to n).map(_ => runOnce("cmp02_clustered_compaction_pruning"))
      val (nrdd, mem) = blocks()
      println(f"[bisect] $label: ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"| persistentRDDs=$nrdd storageMem=${mem / 1024 / 1024}%dMB")
    }

    runOnce("cmp02_clustered_compaction_pruning") // warmup (codegen, footers)
    phase("clean", 6)
    val heavy = Seq("cp02_incremental_curation", "sd02_incremental_semdedup",
      "sim16_index_rebuild_erasure", "dd15_ssjoin_prefix",
      "str16_stream_quantile_parity", "cp01_full_curation")
    for (_ <- 1 to 2; h <- heavy)
      try runOnce(h) catch { case e: Throwable => println(s"[bisect] $h failed: $e") }
    phase("post-pollution", 6)
    System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(2000)
    phase("post-gc", 6)
    spark.stop()
  }
}
