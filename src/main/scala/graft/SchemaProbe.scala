package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: how much of the per-query fixed cost is parquet relation
  * resolution (schema inference + file listing) at DataFrame-creation
  * time? Times N repeated `spark.read.parquet` calls against N
  * `spark.read.schema(cached).parquet` calls for each benchmark table —
  * creation only, no action — to decide whether a session-scoped schema
  * cache in [[graft.sources.Tables]] is worth having.
  */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings", "events")
    val n = 50
    for (t <- tables) {
      val path = s"$sfDir/$t.parquet"
      val schema = spark.read.parquet(path).schema
      // warm both paths
      spark.read.parquet(path); spark.read.schema(schema).parquet(path)
      val t0 = System.nanoTime()
      var i = 0; while (i < n) { spark.read.parquet(path); i += 1 }
      val infer = (System.nanoTime() - t0) / 1e6 / n
      val t1 = System.nanoTime()
      i = 0; while (i < n) { spark.read.schema(schema).parquet(path); i += 1 }
      val cached = (System.nanoTime() - t1) / 1e6 / n
      println(f"[schema] $t%-12s infer=$infer%7.2f ms  cached=$cached%7.2f ms  saved=${infer - cached}%7.2f ms/call")
    }
    spark.stop()
  }
}
