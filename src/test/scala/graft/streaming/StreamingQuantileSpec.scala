package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The streamed bottom-k sketch must equal the batch sketch cell for
  * cell, with per-shard state/snapshots that never exceed k rows —
  * the fixed-state contract that makes the maintenance safe on an
  * unbounded feed.
  */
class StreamingQuantileSpec extends SparkSpec {

  test("multi-trigger streamed bottom-k == batch sketch; snapshots stay <= k per shard") {
    val k = 64 // small k so the cut is exercised hard at sf0.001
    val orders = Tables(spark, sf0001).orders
    val d = tmpDir("qstream")
    orders.select("o_orderkey", "o_totalprice").repartition(5)
      .write.mode("overwrite").parquet(d.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(d.toString).schema)
      .option("maxFilesPerTrigger", 2) // 3 genuine triggers
      .parquet(d.toString)
    val snaps = StreamingQuantile.bottomKUpdates(
      graft.operators.Sketches.quantileRows(stream, "o_orderkey", "o_totalprice"),
      k, nGroups = 4)
    EventStreams.runToMemoryUpdate(snaps, "qsnaps")
    val landed = spark.table("qsnaps")
    // fixed-state contract: NO snapshot (so no state) ever exceeds k rows
    val oversize = landed.groupBy("gid", "seq").count()
      .filter(col("count") > k).count()
    assert(oversize == 0L, "a shard snapshot exceeded k rows")
    // multiple triggers actually happened (seq advanced past 1 somewhere)
    assert(landed.agg(max("seq")).head.getLong(0) >= 2L,
      "expected a multi-trigger drain")
    // latest-union-recut == the batch bottom-k, cell for cell
    val streamed = StreamingQuantile.latestSketch(landed, k, nGroups = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Sketches
      .quantileSketch(orders, "o_orderkey", "o_totalprice", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "streamed sketch diverged from the batch cut")
    // sharding pin: snapshots written under a DIFFERENT nGroups (here:
    // the same table read back expecting 8 shards) contribute NOTHING —
    // a snapshot table outliving its checkpoint cannot mix shardings
    assert(StreamingQuantile.latestSketch(landed, k, nGroups = 8).isEmpty,
      "foreign-sharding snapshots leaked into the sketch")
  }
}
