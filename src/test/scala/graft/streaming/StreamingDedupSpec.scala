package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming near-dup detection pinned against the batch LSH path on
  * the same corpus.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"
  private val nearDup = base.replace("lazy", "sleepy")
  private val unrelated =
    "spark executes distributed queries by planning stages and shuffling data between partitions efficiently always"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  private def stageCorpus(): String = {
    val dir = tmpDir("sdedup")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((0L, t0, base), (1L, t0, base), (2L, t0, nearDup), (3L, t0, unrelated),
      (4L, t0, "tiny doc"))
      .toDF("doc_id", "ts", "text")
      .write.parquet(dir.resolve("docs.parquet").toString)
    dir.resolve("docs.parquet").toString // stream source = the dataset dir
  }

  test("streaming LSH finds the exact and near pair, skips unrelated") {
    val stream = spark.readStream.schema(docSchema).parquet(stageCorpus())
    val pairs = StreamingDedup.nearDupPairs(stream)
    EventStreams.runToMemoryAppend(pairs, "sdedup_pairs")
    val found = spark.table("sdedup_pairs")
      .select("doc_a", "doc_b", "est_jaccard").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(found.contains((0L, 1L)))
    assert(found((0L, 1L)) == 1.0) // identical docs: every coordinate equal
    assert(found.keySet.contains((0L, 2L)) || found.keySet.contains((1L, 2L)))
    assert(!found.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // agreement with the batch path's verified pairs on the same corpus
    val batch = graft.operators.Dedup.minhashPairs(
      Seq((0L, base), (1L, base), (2L, nearDup), (3L, unrelated), (4L, "tiny doc"))
        .toDF("doc_id", "text"), threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.subsetOf(found.keySet),
      s"batch pairs $batch not all found by streaming ${found.keySet}")
  }

  test("bucket state is capped at maxBucket members") {
    // 30 identical docs -> every bucket would hold 30; cap at 5 means a
    // new arrival pairs with at most 5 retained members per band
    val dir = tmpDir("sdedup-cap")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0L until 30L).map(i => (i, t0, base)).toDF("doc_id", "ts", "text")
      .write.parquet(dir.resolve("docs.parquet").toString)
    val stream = spark.readStream.schema(docSchema)
      .parquet(dir.resolve("docs.parquet").toString)
    val pairs = StreamingDedup.nearDupPairs(stream, maxBucket = 5)
    EventStreams.runToMemoryAppend(pairs, "sdedup_cap")
    val distinctPairs = spark.table("sdedup_cap")
      .select("doc_a", "doc_b").distinct().count()
    assert(distinctPairs > 0)
    // 30 identical docs collide in every band: WITHOUT the cap every
    // arrival pairs with all prior members -> all C(30,2)=435 pairs.
    // With 5 retained members per band the pair surface must collapse
    // (each arrival sees <= 5 members per band; observed ~130).
    assert(distinctPairs < 300, s"$distinctPairs pairs - cap not effective")
  }
}
