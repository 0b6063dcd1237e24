package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Continuous ingestion ([[StreamingIngest.ingestStream]]): incremental
  * pickup of landed JSONL files, §1.2 normalization, and effectively-
  * once landing through the idempotent upsert sink.
  */
class StreamingIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("incremental pickup, normalization, and idempotent overlap handling") {
    val landing = tmpDir("sing_land")
    val ckpt = tmpDir("sing_ckpt").toString
    spark.sql("DROP TABLE IF EXISTS sing_target")

    writeFile(landing, "batch1.jsonl",
      """{"id":1,"name":"ana","score":1.5}
        |{"id":2,"name":null,"score":2.0}
        |""".stripMargin)
    val q = StreamingIngest.ingestStream(spark, landing.toString, schema,
      "sing_target", keys = Seq("id"), checkpointDir = ckpt)
    try {
      q.processAllAvailable()
      val after1 = spark.table("sing_target").collect()
      assert(after1.length == 2)
      // explicit null normalizes to '' (§1.2), doubles stringify
      val r2 = after1.find(_.getAs[String]("id") == "2").get
      assert(r2.getAs[String]("name") == "")
      assert(r2.getAs[String]("score") == "2.0")
      assert(r2.getAs[String]("_source_file") == "batch1.jsonl")

      // batch2 overlaps id=2 (must NOT duplicate or overwrite) and
      // adds id=3 (must insert)
      writeFile(landing, "batch2.jsonl",
        """{"id":2,"name":"evil-dup","score":99.0}
          |{"id":3,"name":"cho","score":3.25}
          |""".stripMargin)
      q.processAllAvailable()
      val after2 = spark.table("sing_target").collect()
      assert(after2.length == 3)
      assert(after2.count(_.getAs[String]("id") == "2") == 1)
      assert(after2.find(_.getAs[String]("id") == "2").get.getAs[String]("name") == "")
      assert(after2.find(_.getAs[String]("id") == "3").get.getAs[String]("name") == "cho")
    } finally q.stop()

    // restart from the same checkpoint: nothing new, nothing re-landed
    val q2 = StreamingIngest.ingestStream(spark, landing.toString, schema,
      "sing_target", keys = Seq("id"), checkpointDir = ckpt)
    try {
      q2.processAllAvailable()
      assert(spark.table("sing_target").count() == 3)
    } finally q2.stop()
  }

  test("a first batch with in-batch duplicate keys lands exactly one row per key") {
    val landing = tmpDir("sing_land2")
    spark.sql("DROP TABLE IF EXISTS sing_target2")
    writeFile(landing, "dup.jsonl",
      """{"id":7,"name":"a","score":1.0}
        |{"id":7,"name":"b","score":2.0}
        |""".stripMargin)
    val q = StreamingIngest.ingestStream(spark, landing.toString, schema,
      "sing_target2", keys = Seq("id"), checkpointDir = tmpDir("sing_ckpt2").toString)
    try {
      q.processAllAvailable()
      val rows = spark.table("sing_target2").collect()
      assert(rows.length == 1)
      // deterministic winner: non-key values sorting first
      assert(rows.head.getAs[String]("name") == "a")
    } finally q.stop()
  }
}
