package graft

import org.apache.spark.sql.SparkSession

/** Throwaway bisection harness for bpe01's bench-pass instability
  * (round-9 verdict watch item): measure bpe01 in a clean JVM, then
  * after deliberately polluting the session with the heavy
  * localCheckpoint/state queries a full bench sweep runs, then again
  * after a forced GC — to decide between (a) bpe01 accumulating its
  * own state, (b) cross-query JVM accumulation (cached localCheckpoint
  * blocks / cleaner backlog), (c) pure environment noise.
  */
object BisectBpe {
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
      val ts = (1 to n).map(_ => runOnce("bpe01_bpe_merges"))
      val (nrdd, mem) = blocks()
      println(f"[bisect] $label: ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"| persistentRDDs=$nrdd storageMem=${mem / 1024 / 1024}%dMB")
    }

    runOnce("bpe01_bpe_merges") // warmup (codegen, footers)
    phase("clean", 6)
    // pollution: the heavy state/localCheckpoint queries a bench sweep
    // interleaves between bpe01's passes
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
