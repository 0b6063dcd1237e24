package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Streaming semantics pinned against the batch equivalents: the same
  * transform run via readStream over the events parquet must agree with
  * the batch DataFrame path.
  */
class EventStreamsSpec extends SparkSpec {

  // the file-stream source requires a directory: stage the single
  // events parquet file into one
  private lazy val eventsPath: String = {
    val d = tmpDir("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), d.resolve("events.parquet"))
    d.toString
  }
  private lazy val batchEvents = Tables(spark, sf0001).events

  test("streaming hourly counts == batch hourly counts") {
    val stream = EventStreams.readStream(spark, eventsPath)
    EventStreams.runToMemory(EventStreams.hourlyCounts(stream), "hourly")
    val streamed = spark.table("hourly")
    val batch = EventStreams.hourlyCounts(batchEvents)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming session windows: per-user session counts match batch sessionization") {
    val stream = EventStreams.readStream(spark, eventsPath)
    EventStreams.runToMemory(EventStreams.userSessions(stream), "sessions")
    val streamed = spark.table("sessions")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
    // lag/gap-based batch sessionization (q25 logic) as ground truth
    val q25 = graft.Registry.byName("q25_sessionize").run(spark, sf0001)
    val batch = q25.groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
      sum("n_events").as("n_events"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-static enrichment matches the batch join and holds no state") {
    val stream = EventStreams.readStream(spark, eventsPath)
    val dim = EventStreams.userDimension(batchEvents)
    val q = EventStreams.enrichedEvents(stream, dim)
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enriched")
    val batch = batchEvents.drop("ts_ns").join(dim, Seq("user_id"), "left")
    assert(streamed.count() == batchEvents.count(), "left join must not drop events")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // the whole point of the shape: a stream-static join is stateless
    assert(q.lastProgress.stateOperators.isEmpty,
      "stream-static join must not create a state store")
  }

  test("late data beyond the watermark is dropped across micro-batches") {
    import spark.implicits._
    val dir = tmpDir("late")
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("append").parquet(dir.toString)
    val h = 3600L * 1000000000L // one hour in nanos
    // batch 1: events up to t=10h -> watermark advances to 10h - 2h = 8h
    writeBatch("b1", (1L to 10L).map(i => (i, i * h, 1L, "click", 1.0, "{}")))
    val stream = EventStreams.readStream(spark, dir.toString)
      .filter(col("event_type") === "click")
    val agg = EventStreams.hourlyCounts(stream, watermark = "2 hours")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late_agg").start()
    try {
      q.processAllAvailable()
      // batch 2: one on-time event (t=11h) and one late event (t=3h,
      // far behind the 8h watermark -> its hour bucket is closed)
      writeBatch("b2", Seq((100L, 11 * h, 1L, "click", 1.0, "{}"),
        (101L, 3 * h, 1L, "click", 99.0, "{}")))
      q.processAllAvailable()
      // batch 3: push event time forward so all open windows close
      writeBatch("b3", Seq((102L, 20 * h, 1L, "click", 1.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_agg")
    // the late event would have bumped hour t=3h to n=2 / value 100.0;
    // emitted finalized buckets must show it was dropped
    val hour3 = out.filter(col("hour").cast("string").startsWith("1970-01-01 03"))
      .collect()
    assert(hour3.length == 1 && hour3.head.getAs[Long]("n") == 1L,
      s"late event leaked into closed window: ${hour3.toSeq}")
  }

  test("stream-stream interval join matches the batch equivalent") {
    val stream = EventStreams.readStream(spark, eventsPath)
    EventStreams.runToMemory(EventStreams.purchaseAttribution(stream), "attributed",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val streamed = spark.table("attributed")
    val batch = EventStreams.purchaseAttribution(batchEvents)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0, "expected some attributed purchases in testdata")
  }

  test("mapGroupsWithState running profiles: totals match batch aggregation") {
    val stream = EventStreams.readStream(spark, eventsPath)
    EventStreams.runToMemoryUpdate(EventStreams.userProfiles(stream), "profiles")
    // update mode emits one row per user per batch; last row per user wins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(desc("n_events"))
    val finalProfiles = spark.table("profiles")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val joined = finalProfiles.join(batch, "user_id")
      .filter(finalProfiles("n_events") =!= batch("n_events"))
    assert(joined.count() == 0)
    assert(finalProfiles.count() == batch.count())
  }

  test("writeThrough lands micro-batches via a registered connector") {
    val stream = EventStreams.readStream(spark, eventsPath)
    val out = tmpDir("stream-conn").resolve("out").toString
    val ckpt = tmpDir("stream-conn-ckpt").toString
    val conn = graft.sink.Connectors.create("parquet")
    val q = EventStreams.writeThrough(
      EventStreams.dedupedEvents(stream), conn, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val written = conn.read(spark, out)
    assert(written.count() == batchEvents.count()) // sf0.001 events are unique
    assert(written.columns.contains("event_type"))
  }

  test("asofClickEnrich: <= match, same-ts click max, no-click null, state carries across batches") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: click(10)=2.0 then purchase(20) -> 2.0; purchase(5) has no
    //   prior click -> null (the later click must not retro-enrich it)
    // user 2: two clicks at the SAME ts as the purchase -> <= matches, MAX value wins
    // user 3: purchase only -> null
    val batch1 = Seq(
      (1L, ts(20), 1L, "purchase", 9.0), (2L, ts(10), 1L, "click", 2.0),
      (3L, ts(5), 1L, "purchase", 9.0),
      (4L, ts(7), 2L, "click", 1.5), (5L, ts(7), 2L, "purchase", 9.0),
      (6L, ts(7), 2L, "click", 3.5),
      (7L, ts(1), 3L, "purchase", 9.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val landing = tmpDir("asof-src")
    batch1.write.mode("append").parquet(landing.toString)
    val stream = spark.readStream.schema(batch1.schema).parquet(landing.toString)
    val q = EventStreams.asofClickEnrich(stream)
      .writeStream.outputMode("append").format("memory").queryName("asof_hits").start()
    try {
      q.processAllAvailable()
      // batch 2: user 1 purchases again — the click state from batch 1
      // must still be there (two fixed fields, never re-read history)
      Seq((8L, ts(60), 1L, "purchase", 9.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(landing.toString)
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("asof_hits").collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(hits == Map(
      1L -> Some(2.0), 3L -> None, 5L -> Some(3.5), 7L -> None, 8L -> Some(2.0)),
      s"got $hits")
  }

  test("flatMapGroupsWithState funnel: one hit per completing user, stage order enforced") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1 completes; user 2 clicks BEFORE its view (no funnel); user 3
    // never purchases; user 4's purchase ties the click timestamp
    // (strictly-after fails). Shuffled input order: the machine sorts by
    // event time within the batch.
    val rows = Seq(
      (5L, ts(30), 1L, "purchase", 1.0), (1L, ts(10), 1L, "view", 0.0),
      (3L, ts(20), 1L, "click", 0.0), (2L, ts(15), 1L, "view", 0.0),
      (6L, ts(5), 2L, "click", 0.0), (7L, ts(10), 2L, "view", 0.0),
      (8L, ts(30), 2L, "error", 0.0),
      (9L, ts(1), 3L, "view", 0.0), (10L, ts(2), 3L, "click", 0.0),
      (11L, ts(1), 4L, "view", 0.0), (12L, ts(2), 4L, "click", 0.0),
      (13L, ts(2), 4L, "purchase", 1.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val landing = tmpDir("funnel-src")
    rows.write.mode("overwrite").parquet(landing.toString)
    val stream = spark.readStream.schema(rows.schema).parquet(landing.toString)
    EventStreams.runToMemoryAppend(EventStreams.funnelHits(stream), "funnel_hits")
    val hits = spark.table("funnel_hits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(hits.keySet == Set(1L), s"only user 1 completes: $hits")
    assert(hits(1L) == (600000000L, 1200000000L, 1800000000L),
      "first view (t=10m), first click after it (t=20m), first purchase after (t=30m)")
  }
}
