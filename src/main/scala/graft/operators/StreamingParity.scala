package graft.operators

import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables
import graft.streaming.{EventStreams, StreamingDedup, StreamingIngest, StreamingQuantile}

/** Oracle-checked stream-equals-batch parity queries — the CORRECTNESS
  * rows for the streaming operators (SURVEY.md §2C streaming
  * extensions; the reference is batch-only).
  *
  * The streaming engine's correctness CONTRACT is replay equivalence:
  * a bounded input driven through the streaming topology must land the
  * exact rows the batch computation produces. Each query here
  * materializes the sf corpus as a bounded stream source, drains the
  * real streaming operator (micro-batches, state store, watermarks,
  * sinks — nothing mocked), and returns the landed result; the DuckDB
  * oracle recomputes the same answer relationally from the parquet
  * tables. A hash match therefore certifies the WHOLE streaming path:
  * source listing, per-batch processing, stateful operators, and sink
  * idempotence.
  *
  * Determinism notes (why hash-exact comparison is sound):
  *  - str01 lands through the key-idempotent upsert sink, so
  *    micro-batch boundaries (maxFilesPerTrigger=2 forces several) and
  *    within-batch order can't affect the landed set;
  *  - str02 runs everything in ONE micro-batch (no maxFilesPerTrigger)
  *    with an effectively-unbounded bucket cap, so no state eviction
  *    can race arrival order; a pair colliding in several bands is
  *    emitted per band with the SAME estimator value, collapsed by
  *    DISTINCT — the emitted SET is arrival-order-free;
  *  - str03 aggregates in Complete mode, where window state is never
  *    evicted — the final emission equals the batch GROUP BY.
  */
object StreamingParity {

  // unique sink/table names so repeated invocations (bench warmup + 5
  // passes, dev reruns in one session) never collide or cross-read.
  // LRU-of-1 per prefix: registering a run's table DROPS the previous
  // run's (memory-sink tables are pinned in driver memory until the
  // session ends, and str01 lands real warehouse tables — without the
  // drop, bench's 6 passes retain 6 full result copies per query and
  // grow without bound). Same trade as Dedup's candidate-cache slot: a
  // still-held DataFrame over the PREVIOUS table would break if
  // re-executed after the drop, and callers (bench, specs) always
  // materialize before the next run.
  private val seq = new AtomicLong(0L)
  private val lastNames = scala.collection.concurrent.TrieMap.empty[String, String]
  private def fresh(s: SparkSession, prefix: String): String = {
    val name = s"${prefix}_${seq.incrementAndGet()}"
    lastNames.put(prefix, name).foreach { prev =>
      try { s.catalog.dropTempView(prev); () } catch { case _: Throwable => () }
      try { s.sql(s"DROP TABLE IF EXISTS $prev"); () } catch { case _: Throwable => () }
    }
    name
  }

  private def tempDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  /** Run `body` (a stateful-stream construction + drain) with a small
    * shuffle-partition count, restoring the session default after.
    *
    * A stateful query materializes one state store PER shuffle
    * partition, and each store pays fixed snapshot/commit cost every
    * micro-batch — at the default 32 partitions that fixed cost (not
    * the data) dominated these bounded replays 4x (str06 8.1 s -> 2.2 s
    * at sf0.1). State-store count should track key cardinality and
    * throughput, not the host's core count; a production deployment
    * sizes it the same way, just upward.
    */
  private def withStatePartitions[T](s: SparkSession, n: Int = 8)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  private def deleteQuietly(p: java.nio.file.Path): Unit =
    try graft.ingest.FileUtils.delete(p.toString, recursive = true): Unit
    catch { case _: Throwable => () }

  // -------------------------------------------------------------- str01
  // Stream-batch ingestion parity: the documents table is written out
  // as a JSONL landing corpus, continuously ingested by the REAL
  // pipeline (StreamingIngest: incremental file listing, §1.2
  // normalization, lineage, create-if-absent, idempotent upsert) in
  // several micro-batches, and the landed table must hash-match DuckDB
  // normalizing the same rows straight from parquet. `_source_file` is
  // dropped from the compared output only because Spark's part-file
  // names are nondeterministic; the lineage contract itself is pinned
  // in StreamingIngestSpec.
  private val str01 = QueryDef(
    "str01_stream_batch_parity",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select("doc_id", "lang", "n_chars", "source", "text")
      val tmp = tempDir("graft_str01")
      val landing = tmp.resolve("landing").toString
      val ckpt = tmp.resolve("ckpt").toString
      // bounded landing corpus: a handful of JSONL part files so
      // maxFilesPerTrigger=2 yields several genuine micro-batches
      docs.select(to_json(struct(docs.columns.map(col).toSeq: _*)).as("value"))
        .repartition(6)
        .write.mode("overwrite").text(landing)
      val table = fresh(s, "str01_landed")
      val q = StreamingIngest.ingestStream(s, landing, docs.schema, table,
        keys = Seq("doc_id"), checkpointDir = ckpt, maxFilesPerTrigger = 2)
      try q.processAllAvailable() finally q.stop()
      deleteQuietly(tmp)
      s.table(table).drop("_source_file")
        .orderBy(col("doc_id").cast("bigint"))
    },
    // the §1.2 contract relationally: every column to VARCHAR, null →
    // '' (the synthetic corpus is null-free, but the COALESCE keeps the
    // oracle honest about the contract being checked)
    Some("""SELECT COALESCE(CAST(doc_id AS VARCHAR), '') AS doc_id,
        COALESCE(lang, '') AS lang,
        COALESCE(CAST(n_chars AS VARCHAR), '') AS n_chars,
        COALESCE(source, '') AS source,
        COALESCE(text, '') AS text
      FROM documents ORDER BY documents.doc_id"""),
  )

  // -------------------------------------------------------------- str02
  // Streaming MinHash-LSH dedup parity: the documents corpus streamed
  // through the stateful band-bucket operator (flatMapGroupsWithState)
  // must emit exactly the candidate pairs the LSH math defines: pairs
  // sharing at least one band (all minhash rows of the band equal) with
  // estimator Jaccard (equal-coordinate fraction, eq/32 — a dyadic
  // rational, exact in both engines) above threshold. DuckDB replays
  // signatures and bands with dd02's proven arithmetic; band-key
  // equality is checked on the band's ROW VALUES, which is what the
  // operator's xxhash64 bucket key encodes.
  private val str02 = QueryDef(
    "str02_stream_neardup_parity",
    (s, dir) => withStatePartitions(s) {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"),
          lit("2026-01-01 00:00:00").cast("timestamp").as("ts"),
          col("text"))
      val tmp = tempDir("graft_str02")
      val in = tmp.resolve("in").toString
      docs.write.mode("overwrite").parquet(in)
      val stream = s.readStream.schema(docs.schema).parquet(in)
      // one micro-batch (no file cap) + effectively-unbounded buckets:
      // every same-band pair is emitted regardless of arrival order
      val pairs = StreamingDedup.nearDupPairs(stream, threshold = 0.25,
        maxBucket = Int.MaxValue)
      val name = fresh(s, "str02_pairs")
      EventStreams.runToMemoryAppend(pairs, name)
      val out = s.table(name)
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
        .distinct()
        .orderBy("doc_a", "doc_b")
        .localCheckpoint(eager = true) // detach from the memory sink before cleanup
      deleteQuietly(tmp)
      out
    },
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      g AS (SELECT doc_id, ${OracleSql.Shingles3} AS shingles FROM t),
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      hh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM e),
      sig AS (SELECT doc_id, j,
          MIN(((1337 * j + 17) * h + 7919 * j + 31) % 2147483647) AS m
        FROM hh, range(32) r(j) GROUP BY doc_id, j),
      band AS (SELECT doc_id, j // 2 AS band,
          MAX(CASE WHEN j % 2 = 0 THEN m END) AS m0,
          MAX(CASE WHEN j % 2 = 1 THEN m END) AS m1
        FROM sig GROUP BY doc_id, j // 2),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM band a JOIN band b
          ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
            AND a.doc_id < b.doc_id),
      eq AS (SELECT c.doc_a, c.doc_b,
          SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS neq
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, CAST(neq AS DOUBLE) / 32 AS est_jaccard
      FROM eq WHERE CAST(neq AS DOUBLE) / 32 >= 0.25
      ORDER BY doc_a, doc_b"""),
  )

  // -------------------------------------------------------------- str03
  // Streaming windowed-aggregation parity: the events table streamed
  // through watermark + tumbling-window hourly counts (Complete mode —
  // state never evicted, so the final emission is the full history)
  // must equal the batch GROUP BY; the oracle is q24's proven hourly
  // SQL shape.
  private val str03 = QueryDef(
    "str03_stream_hourly_parity",
    (s, dir) => withStatePartitions(s) {
      // the streaming file source lists a DIRECTORY; the sf table is a
      // single parquet file, so stage it into one (untimed-ish copy —
      // a real deployment streams from a landing dir to begin with)
      val tmp = tempDir("graft_str03")
      graft.ingest.FileUtils.copy(s"$dir/events.parquet",
        tmp.resolve("events.parquet").toString)
      val stream = EventStreams.readStream(s, tmp.toString)
      val counts = EventStreams.hourlyCounts(stream)
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("total_value"))
      val name = fresh(s, "str03_hourly")
      EventStreams.runToMemory(counts, name)
      deleteQuietly(tmp)
      s.table(name).orderBy("hour", "event_type")
    },
    Some("""SELECT STRFTIME(DATE_TRUNC('hour', MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000)), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
  )

  // stage the single-file events table into a directory the streaming
  // file source can list (shared by str04/05/06)
  private def stagedEventStream(s: SparkSession, dir: String): (DataFrame, java.nio.file.Path) = {
    val tmp = tempDir("graft_strev")
    graft.ingest.FileUtils.copy(s"$dir/events.parquet",
      tmp.resolve("events.parquet").toString)
    (EventStreams.readStream(s, tmp.toString), tmp)
  }

  // -------------------------------------------------------------- str04
  // Stream-static enrichment parity: the events stream joined against a
  // broadcast batch dimension (per-user lifetime aggregates). The
  // operator is completely STATELESS — no watermark, no state store —
  // so one drained pass must reproduce the batch left join exactly.
  // The oracle recomputes dimension and join relationally.
  private val str04 = QueryDef(
    "str04_stream_enrich_parity",
    (s, dir) => {
      val (stream, tmp) = stagedEventStream(s, dir)
      val dim = EventStreams.userDimension(Tables(s, dir).events)
      val enriched = EventStreams.enrichedEvents(stream, dim)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("lifetime_events"), col("lifetime_value"))
      val name = fresh(s, "str04_enriched")
      EventStreams.runToMemory(enriched, name,
        org.apache.spark.sql.streaming.OutputMode.Append())
      val out = s.table(name).orderBy("event_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""WITH dim AS (SELECT user_id, COUNT(*) AS lifetime_events,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS lifetime_value
        FROM events GROUP BY user_id)
      SELECT e.event_id, e.user_id, e.event_type, e.value,
        d.lifetime_events, d.lifetime_value
      FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
      ORDER BY e.event_id"""),
  )

  // -------------------------------------------------------------- str05
  // Session-window parity: gap-based session windows (30 min
  // inactivity) aggregated in Complete mode — session-merge state is
  // never evicted, so the final emission equals the batch gap
  // sessionization. The oracle replays the merge relationally: a new
  // session opens when the inter-event gap is >= the 30-minute gap
  // (session windows are half-open [start, last_event + gap)), the
  // session end is last event + gap. Timestamps compare as epoch
  // MICROS (the ts div 1000 truncation both engines apply).
  private val str05 = QueryDef(
    "str05_stream_session_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val sessions = EventStreams.userSessions(stream)
        .select(unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("user_id"), col("n_events"), col("session_value"))
      val name = fresh(s, "str05_sessions")
      EventStreams.runToMemory(sessions, name)
      val out = s.table(name).orderBy("user_id", "start_us")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""WITH e AS (SELECT user_id, EPOCH_NS(ts) // 1000 AS us, value FROM events),
      f AS (SELECT user_id, us, value,
          CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
              >= 1800000000 OR LAG(us) OVER (PARTITION BY user_id ORDER BY us)
              IS NULL THEN 1 ELSE 0 END AS new_s
        FROM e),
      g AS (SELECT user_id, us, value,
          SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM f)
      SELECT MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us, user_id,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
      FROM g GROUP BY user_id, sid ORDER BY user_id, start_us"""),
  )

  // -------------------------------------------------------------- str06
  // Stream-stream interval-join parity: purchases attributed to every
  // prior click by the same user within 30 minutes — BOTH sides are
  // streams holding watermark-bounded state. Inner-join matches emit in
  // the micro-batch they pair, so one drained pass over the bounded
  // source yields the complete pair set; the oracle is the plain
  // relational self-join in epoch-micros arithmetic.
  private val str06 = QueryDef(
    "str06_stream_attrib_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val attrib = EventStreams.purchaseAttribution(stream)
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          unix_micros(col("click_ts")).as("click_us"), col("value"))
      val name = fresh(s, "str06_attrib")
      EventStreams.runToMemory(attrib, name,
        org.apache.spark.sql.streaming.OutputMode.Append())
      val out = s.table(name).orderBy("purchase_id", "click_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, value,
          EPOCH_NS(ts) // 1000 AS us FROM events),
      c AS (SELECT user_id, us AS click_us, event_id AS click_id
        FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, us AS purchase_us, event_id AS purchase_id, value
        FROM e WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, c.click_id, p.purchase_us, c.click_us,
        p.value
      FROM p JOIN c ON c.user_id = p.user_id
        AND c.click_us <= p.purchase_us
        AND c.click_us >= p.purchase_us - 1800000000
      ORDER BY p.purchase_id, c.click_id"""),
  )

  // -------------------------------------------------------------- str07
  // Custom-state parity: the mapGroupsWithState running per-user
  // profile, drained over the bounded source (one micro-batch, so each
  // user emits exactly its final profile), must match the batch
  // per-user aggregation. The state fold sums doubles in arrival order
  // — order-dependent at the ULP level — so the compared total is
  // rounded to cents: event values carry two decimals, the true sum is
  // a multiple of 0.01, and a float error of ~1e-9 can never move the
  // 2-dp rounding off that multiple (the oracle sums exactly in
  // DECIMAL and lands on the same multiple). n_events and last_seen
  // are order-independent and compare raw.
  private val str07 = QueryDef(
    "str07_stream_profile_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val profiles = EventStreams.userProfiles(stream)
      val name = fresh(s, "str07_profiles")
      EventStreams.runToMemoryUpdate(profiles, name)
      // a user idle > (watermark + timeout) before the stream's end
      // ALSO fires its event-time timeout, re-emitting the identical
      // final profile — distinct() collapses the duplicate emission
      val out = s.table(name)
        .select(col("user_id"), col("n_events"),
          round(col("total_value"), 2).as("total_value"),
          unix_micros(col("last_seen")).as("last_seen_us"))
        .distinct()
        .orderBy("user_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""SELECT user_id, COUNT(*) AS n_events,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value,
        MAX(EPOCH_NS(ts) // 1000) AS last_seen_us
      FROM events GROUP BY user_id ORDER BY user_id"""),
  )

  // -------------------------------------------------------------- str08
  // Checkpoint-RESTART parity: the recovery guarantee str01 only
  // implies, oracle-checked directly. Half the corpus lands, the query
  // is STOPPED (a deploy, a crash), more files arrive, and a brand-new
  // query started on the SAME checkpoint must pick up exactly the
  // unseen files — the final table equals one uninterrupted batch
  // normalization of everything. Determinism: the file-source
  // checkpoint makes the second query's first micro-batch exactly the
  // delta (at-least-once on replayed batches), and the key-idempotent
  // upsert absorbs any replay — so the landed SET is restart-invariant.
  // StreamingIngestSpec pins the mechanics (nothing re-landed, row
  // counts); this row certifies the recovered CONTENT byte-for-byte.
  private val str08 = QueryDef(
    "str08_stream_restart_parity",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select("doc_id", "lang", "n_chars", "source", "text")
      val tmp = tempDir("graft_str08")
      val landing = tmp.resolve("landing").toString
      val ckpt = tmp.resolve("ckpt").toString
      val table = fresh(s, "str08_landed")
      def drain(): Unit = {
        val q = StreamingIngest.ingestStream(s, landing, docs.schema, table,
          keys = Seq("doc_id"), checkpointDir = ckpt, maxFilesPerTrigger = 2)
        try q.processAllAvailable() finally q.stop()
      }
      // epoch 1: even doc_ids land, then the query is stopped
      docs.filter(col("doc_id") % 2 === 0)
        .select(to_json(struct(docs.columns.map(col).toSeq: _*)).as("value"))
        .repartition(3).write.mode("append").text(landing)
      drain()
      // epoch 2: odd doc_ids arrive as NEW files; a fresh query on the
      // same checkpoint resumes and must ingest exactly these
      docs.filter(col("doc_id") % 2 === 1)
        .select(to_json(struct(docs.columns.map(col).toSeq: _*)).as("value"))
        .repartition(3).write.mode("append").text(landing)
      drain()
      deleteQuietly(tmp)
      s.table(table).drop("_source_file")
        .orderBy(col("doc_id").cast("bigint"))
    },
    // identical contract to str01: the restart must be invisible
    str01.oracle,
  )

  // -------------------------------------------------------------- str09
  // Stream-stream LEFT OUTER interval-join parity — the null-emission
  // semantics str06's inner join never exercises: a purchase with NO
  // qualifying click must still emit (null click columns), and in a
  // stream that verdict is a WATERMARK decision — the row may only
  // emit once no earlier click can arrive. Mechanics of the bounded
  // replay: the corpus lands as micro-batch 1; a second, later-mtime
  // sentinel file (one click + one purchase at max_ts + 3 h, user −1)
  // lands as micro-batch 2 and advances BOTH legs' watermarks (the
  // global watermark is the min across inputs) past every real
  // purchase, so the engine's no-data flush batch emits the unmatched
  // rows; the drain polls until every real purchase has emitted
  // (matched or null) because the flush batch runs asynchronously
  // after processAllAvailable returns. Sentinel rows are filtered from
  // the result. The oracle is the plain relational LEFT JOIN.
  private val str09 = QueryDef(
    "str09_stream_outer_join_parity",
    (s, dir) => withStatePartitions(s) {
      val tmp = tempDir("graft_str09")
      graft.ingest.FileUtils.copy(s"$dir/events.parquet",
        tmp.resolve("events.parquet").toString)
      // sentinel file, built from the on-disk schema so either ts
      // flavor (ns-long / TIMESTAMP) round-trips unchanged
      val raw = s.read.parquet(tmp.toString)
      val bumped = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("mx") + lit(10800L * 1000000000L)
        case _ => col("mx") + expr("INTERVAL 3 HOURS")
      }
      val sentinel = raw.agg(max(col("ts")).as("mx"))
        .select(explode(array(lit("click"), lit("purchase"))).as("event_type"), col("mx"))
        .select(
          when(col("event_type") === "click", lit(-1L)).otherwise(lit(-2L)).as("event_id"),
          bumped.as("ts"), lit(-1L).as("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("").as("props"))
        .select(raw.columns.map(col).toSeq: _*)
      val scratch = tempDir("graft_str09_sent")
      sentinel.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val listing = java.nio.file.Files.list(scratch)
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error("sentinel write produced no parquet part"))
        finally listing.close()
      val sentDst = tmp.resolve("zz_sentinel.parquet")
      graft.ingest.FileUtils.copy(part.toString, sentDst.toString)
      // strictly later mtime: the file source processes oldest-first,
      // so the sentinel must land as its own later micro-batch
      sentDst.toFile.setLastModified(System.currentTimeMillis() + 60000L): Unit
      deleteQuietly(scratch)

      val stream = EventStreams.readStream(s, tmp.toString, maxFilesPerTrigger = Some(1))
      val outer = EventStreams.purchaseAttributionOuter(stream)
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          unix_micros(col("click_ts")).as("click_us"), col("value"))
      val nPurchases = Tables(s, dir).events
        .filter(col("event_type") === "purchase").count()
      val name = fresh(s, "str09_outer")
      val q = outer.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        def emitted(): Long = s.table(name).filter(col("user_id") >= 0)
          .select("purchase_id").distinct().count()
        // the no-data flush batch runs on the engine's own trigger
        // cadence after processAllAvailable returns; a short poll
        // keeps drain latency (and bench jitter) at ~50 ms rather
        // than a full coarse sleep quantum
        while (emitted() < nPurchases && System.nanoTime() < deadline) {
          Thread.sleep(50)
          q.processAllAvailable()
        }
        require(emitted() == nPurchases,
          s"outer join flush incomplete: ${emitted()} of $nPurchases purchases emitted")
      } finally q.stop()
      val out = s.table(name).filter(col("user_id") >= 0)
        .orderBy("purchase_id", "click_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, value,
          EPOCH_NS(ts) // 1000 AS us FROM events),
      c AS (SELECT user_id, us AS click_us, event_id AS click_id
        FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, us AS purchase_us, event_id AS purchase_id, value
        FROM e WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, c.click_id, p.purchase_us, c.click_us,
        p.value
      FROM p LEFT JOIN c ON c.user_id = p.user_id
        AND c.click_us <= p.purchase_us
        AND c.click_us >= p.purchase_us - 1800000000
      ORDER BY p.purchase_id, c.click_id"""),
  )

  // -------------------------------------------------------------- str10
  // Streaming exact-dedup parity: the whole corpus replayed TWICE —
  // the byte-identical copy arrives as a later micro-batch (mtime
  // ordering + maxFilesPerTrigger=1) — through
  // dropDuplicatesWithinWatermark on event_id must emit every event
  // exactly once. The replay exercises BOTH exactly-once paths: rows
  // still inside the watermark horizon hit retained dedup state and
  // drop as duplicates; rows already behind the watermark drop as late
  // data. Either way the emitted set equals the batch table —
  // deterministic because replays are exact row copies, so whichever
  // arrival survives carries identical values. This is the ingestion
  // dedup guarantee (at-least-once source → exactly-once sink) as an
  // oracle row; the batch twin is dd01/Sinks.upsertTable.
  private val str10 = QueryDef(
    "str10_stream_dedup_parity",
    (s, dir) => withStatePartitions(s) {
      val tmp = tempDir("graft_str10")
      graft.ingest.FileUtils.copy(s"$dir/events.parquet",
        tmp.resolve("events.parquet").toString)
      graft.ingest.FileUtils.copy(s"$dir/events.parquet",
        tmp.resolve("replay.parquet").toString)
      // strictly later mtime: the duplicate copy must arrive as its
      // own later micro-batch, not interleave into the first
      tmp.resolve("replay.parquet").toFile
        .setLastModified(System.currentTimeMillis() + 60000L): Unit
      val stream = EventStreams.readStream(s, tmp.toString,
        maxFilesPerTrigger = Some(1))
      val deduped = EventStreams.dedupedEvents(stream)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("us"))
      val name = fresh(s, "str10_deduped")
      EventStreams.runToMemory(deduped, name,
        org.apache.spark.sql.streaming.OutputMode.Append())
      val out = s.table(name).orderBy("event_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""SELECT event_id, user_id, event_type, value,
        EPOCH_NS(ts) // 1000 AS us
      FROM events ORDER BY event_id"""),
  )

  // -------------------------------------------------------------- str11
  // Stream-maintained sketch parity: the events stream feeds the HLL
  // register build as a Complete-mode streaming aggregation (ONE
  // groupBy(reg).max over per-row projections — fixed 256-row state,
  // the production shape for continuous distinct-count dashboards);
  // estimation is a BATCH read of the landed registers, because
  // chained aggregations are illegal in a stream and unnecessary —
  // the expensive, unbounded part (hashing the firehose) is what the
  // stream does. The oracle replays build + estimate + linear-counting
  // correction relationally (hll01's proven SQL over events.user_id),
  // so a hash match certifies the whole streamed sketch bit-for-bit.
  private val str11 = QueryDef(
    "str11_stream_hll_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val regs = Sketches.hllRegisterUpdates(stream, "user_id")
      val name = fresh(s, "str11_regs")
      EventStreams.runToMemory(regs, name) // Complete mode
      val exact = Tables(s, dir).events
        .agg(count_distinct(col("user_id")).as("n_exact"))
      val out = Sketches.hllEstimateFromRegisters(s.table(name))
        .crossJoin(broadcast(exact))
        .select(lit("stream_user_hll").as("col_name"), col("n_exact"),
          col("n_est"),
          (abs(col("n_est") - col("n_exact")) <= lit(0.15) * col("n_exact"))
            .as("in_envelope"))
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some(Sketches.hllSql("events", "user_id", "stream_user_hll")),
  )

  // -------------------------------------------------------------- str12
  // str11's grouped twin — per-event-type distinct users, the
  // continuous "distinct per segment" dashboard: register state keys
  // on (event_type, reg), still ONE Complete-mode aggregation with
  // 256 rows per group; estimation + envelope per group in batch from
  // the landed registers. Oracle mirrors hll03's grouped replay over
  // events.
  private val str12 = QueryDef(
    "str12_stream_grouped_hll_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val regs = Sketches.hllRegisterUpdatesBy(stream, "event_type", "user_id")
      val name = fresh(s, "str12_regs")
      EventStreams.runToMemory(regs, name) // Complete mode
      val exact = Tables(s, dir).events
        .groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_exact"))
      val out = Sketches
        .hllEstimateFromRegisters(s.table(name), Seq("event_type"))
        .join(exact, "event_type")
        .select(col("event_type"), col("n_exact"), col("n_est"),
          (abs(col("n_est") - col("n_exact")) <= lit(0.15) * col("n_exact"))
            .as("in_envelope"))
        .orderBy("event_type")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some(s"""WITH hh AS (SELECT DISTINCT event_type,
          ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM events WHERE user_id IS NOT NULL),
      r AS (SELECT event_type, h // ${Sketches.HllRemBitsDiv} AS reg,
          MAX(${Sketches.rhoOracleSql}) AS max_rho
        FROM hh GROUP BY 1, 2),
      agg AS (SELECT event_type,
          (${Sketches.AlphaOracleSql}) /
            (SUM(CAST(1::BIGINT << (${Sketches.RemBitsP1} - max_rho) AS DECIMAL(38,0)))
            + (${Sketches.Regs} - COUNT(*)) * CAST(${Sketches.ScaleConst} AS DECIMAL(38,0))) AS raw,
          ${Sketches.Regs} - COUNT(*) AS zeros
        FROM r GROUP BY 1),
      ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1)
      SELECT agg.event_type, n_exact,
        CASE WHEN raw <= 2.5 * ${Sketches.Regs} AND zeros > 0
             THEN ${Sketches.Regs}.0 * ln(${Sketches.Regs}.0 / zeros) ELSE raw END AS n_est,
        abs(CASE WHEN raw <= 2.5 * ${Sketches.Regs} AND zeros > 0
             THEN ${Sketches.Regs}.0 * ln(${Sketches.Regs}.0 / zeros) ELSE raw END - n_exact)
          <= 0.15 * n_exact AS in_envelope
      FROM agg JOIN ex USING (event_type)
      ORDER BY event_type"""),
  )

  // -------------------------------------------------------------- str13
  // CEP parity: per-user funnel completion (view → click → purchase,
  // each stage strictly after the previous) detected by the
  // flatMapGroupsWithState pattern machine — the row-EMITTING stateful
  // surface (groups emit zero rows until the pattern completes, then
  // exactly one, then never again via the done latch), complementing
  // str07's always-emitting mapGroupsWithState. Drained in one
  // micro-batch; within a batch the machine advances in event-time
  // order, so the emitted set equals q38's relational funnel — which
  // the oracle replays per user (first view, first click after it,
  // first purchase after that).
  private val str13 = QueryDef(
    "str13_stream_funnel_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val hits = EventStreams.funnelHits(stream)
      val name = fresh(s, "str13_funnels")
      EventStreams.runToMemoryAppend(hits, name)
      val out = s.table(name)
        .select(col("user_id"), col("view_us"), col("click_us"), col("purchase_us"))
        .orderBy("user_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""WITH e AS (SELECT user_id, event_type, EPOCH_NS(ts) // 1000 AS tus
          FROM events),
      v AS (SELECT user_id, MIN(tus) AS view_us FROM e
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.tus) AS click_us FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.tus > v.view_us GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.tus) AS purchase_us FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.tus > c.click_us GROUP BY e.user_id)
      SELECT p.user_id, v.view_us, c.click_us, p.purchase_us
      FROM p JOIN c USING (user_id) JOIN v USING (user_id)
      ORDER BY p.user_id"""),
  )

  // -------------------------------------------------------------- str14
  // Streaming as-of enrichment parity: ao01's batch as-of join kept
  // continuously — each purchase picks up the user's most recent
  // at-or-before click from TWO fixed state fields per user
  // (flatMapGroupsWithState; see EventStreams.asofClickEnrich), never
  // a history re-sort. Drained in one micro-batch, where the machine's
  // event-time-ordered advance makes the emitted set equal the batch
  // as-of join — whose oracle (ao01's SQL, DuckDB native ASOF) replays
  // it independently.
  private val str14 = QueryDef(
    "str14_stream_asof_parity",
    (s, dir) => withStatePartitions(s) {
      val (stream, tmp) = stagedEventStream(s, dir)
      val hits = EventStreams.asofClickEnrich(stream)
      val name = fresh(s, "str14_asof")
      EventStreams.runToMemoryAppend(hits, name)
      val out = s.table(name)
        .select(col("p_event_id"), col("user_id"), col("click_value"))
        .orderBy("p_event_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some("""WITH e AS (SELECT user_id, event_id, value, event_type,
        MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts FROM events),
      p AS (SELECT event_id AS p_event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, MAX(value) AS click_value FROM e
        WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p_event_id, p.user_id, c.click_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      ORDER BY p_event_id"""),
  )

  // -------------------------------------------------------------- str15
  // Streaming ANN probe parity — the continuous-retrieval deployment
  // shape that ties the persisted vector index (VectorIndex, sim11) to
  // the streaming machinery: the index is built ONCE in batch; query
  // vectors then arrive as a stream (one file per trigger forces
  // several micro-batches) and each micro-batch probes the LOADED
  // index via foreachBatch, appending its top-k rows. Per-query
  // results are independent, so the union across batches must equal
  // the from-scratch batch search — str15 shares sim07's oracle, and a
  // hash match certifies source listing, per-batch probe, and sink
  // append together. Probe cost per batch is the batch's queries
  // against the stored code table; the index is never rebuilt.
  // ONE copy of the build-once/stream-queries/probe-per-micro-batch
  // topology for BOTH scoring objectives (str15 L2/ADC, str18 MIPS):
  // a retrieval deployment switches objectives per query stream, and
  // the streaming shell must be byte-identical around either.
  private def streamedIndexProbe(s: SparkSession, dir: String, tag: String,
      probe: (SparkSession, String, org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame,
      queryFilter: org.apache.spark.sql.Column = col("vec_id") < 3)
      : org.apache.spark.sql.DataFrame = {
    val emb = Tables(s, dir).embeddings
    val tmp = tempDir(s"graft_$tag")
    VectorIndex.saveVectorIndex(emb, tmp.resolve("vindex").toString)
    emb.filter(queryFilter).repartition(3)
      .write.mode("overwrite").parquet(tmp.resolve("queries").toString)
    val landed = tmp.resolve("landed").toString
    val q = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp.resolve("queries").toString)
      .writeStream
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // a trigger can fire on an empty file set: nothing to probe
        if (!batch.isEmpty)
          probe(s, tmp.resolve("vindex").toString, batch.toDF())
            .write.mode("append").parquet(landed): Unit
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = s.read.parquet(landed)
      .orderBy("qid", "rn")
      .localCheckpoint(eager = true)
    deleteQuietly(tmp)
    out
  }

  private val str15 = QueryDef(
    "str15_stream_index_probe_parity",
    (s, dir) => streamedIndexProbe(s, dir, "str15",
      (ss, path, batch) => VectorIndex.probeVectorIndex(ss, path, batch)),
    Similarity.sim07Oracle,
  )

  // -------------------------------------------------------------- str18
  // The MIPS twin of str15: the same build-once index serves the
  // dot-product objective per micro-batch (sim18's probe), and the
  // union across batches must equal the one-shot MIPS probe — str18
  // shares sim18's full-rebuild oracle, so a hash match certifies the
  // streamed MIPS ranking end to end.
  private val str18 = QueryDef(
    "str18_stream_mips_probe_parity",
    (s, dir) => streamedIndexProbe(s, dir, "str18",
      (ss, path, batch) => VectorIndex.probeVectorIndexMips(ss, path, batch)),
    VectorIndex.sim18Oracle,
  )

  // -------------------------------------------------------------- str22
  // The BULK plan through the same build-once/stream-queries shell:
  // query micro-batches probe via the distributed cell-join topology
  // (probeVectorIndexBulk — no per-batch driver collect, no LUT
  // broadcasts), at the all-pairs width sim24 proved (EVERY corpus
  // vector arrives as a query, split across triggers). Per-query
  // results are independent, so the union across micro-batches must
  // equal the one-shot bulk probe — str22 shares sim24's oracle, and a
  // hash match certifies the streamed distributed plan end to end.
  // This is the continuous embedding-dedup deployment shape: corpus
  // slices arrive, each slice ANN-joins the stored index in one
  // distributed plan per trigger.
  private val str22 = QueryDef(
    "str22_stream_bulk_probe_parity",
    (s, dir) => streamedIndexProbe(s, dir, "str22",
      // through the ROUTED entry with the driver cap forced to zero:
      // every micro-batch overflows the cap and delegates to the bulk
      // plan — the oversized-probe routing exercised in the streaming
      // topology, not just the one-shot spec
      (ss, path, batch) =>
        VectorIndex.probeVectorIndex(ss, path, batch, maxDriverQueries = 0),
      queryFilter = lit(true)),
    VectorIndex.sim24Oracle,
  )

  // -------------------------------------------------------------- str16
  // Streaming QUANTILE sketch parity — qs01's bottom-k sketch
  // maintained continuously (the str11 pattern for the quantile member
  // of the sketch quartet): orders land as 4 parquet files drained 2
  // per trigger, each hash shard's flatMapGroupsWithState keeps its
  // own ≤ k-row bottom-k and emits seq-tagged snapshots; estimation is
  // a BATCH read of the landed snapshots (latest per shard, union,
  // re-cut — mergeQuantileSketches' algebra, proven lossless by qs02).
  // The projection is Sketches.quantileRows, shared with the batch
  // sketch, so the streamed state is hash-identical by construction —
  // str16 shares qs01's oracle, and a hash match certifies the whole
  // streamed sketch cell-for-cell, deciles and envelope included.
  private val str16 = QueryDef(
    "str16_stream_quantile_parity",
    (s, dir) => withStatePartitions(s) {
      val orders = Tables(s, dir).orders
      val tmp = tempDir("graft_str16")
      val landing = tmp.resolve("orders").toString
      orders.select("o_orderkey", "o_totalprice").repartition(4)
        .write.mode("overwrite").parquet(landing)
      val stream = s.readStream.schema(s.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", 2).parquet(landing)
      val snaps = StreamingQuantile.bottomKUpdates(
        Sketches.quantileRows(stream, "o_orderkey", "o_totalprice"),
        Sketches.QsK)
      val name = fresh(s, "str16_qsketch")
      EventStreams.runToMemoryUpdate(snaps, name)
      val sketch = StreamingQuantile.latestSketch(s.table(name), Sketches.QsK)
      val out = Sketches.decileEnvelope(orders, "o_totalprice",
          Sketches.quantileEstimates(sketch))
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Sketches.qs01Oracle,
  )

  // -------------------------------------------------------------- str17
  // str01 for COMPRESSED feeds — the log-shipper reality ing22 proves
  // in batch, run through the continuous pipeline: the landing corpus
  // arrives as gzip JSONL part files (Spark's file-stream source
  // decompresses by extension, one task per file — gzip is not
  // splittable, so a compressed feed ships many modest files), drained
  // 2 per trigger through the same §1.2 normalization + idempotent
  // upsert. Shares str01's oracle: compression must be invisible to
  // every landed byte.
  private val str17 = QueryDef(
    "str17_stream_gzip_ingest_parity",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select("doc_id", "lang", "n_chars", "source", "text")
      val tmp = tempDir("graft_str17")
      val landing = tmp.resolve("landing").toString
      val ckpt = tmp.resolve("ckpt").toString
      docs.select(to_json(struct(docs.columns.map(col).toSeq: _*)).as("value"))
        .repartition(4)
        .write.mode("overwrite").option("compression", "gzip").text(landing)
      val table = fresh(s, "str17_landed")
      val q = StreamingIngest.ingestStream(s, landing, docs.schema, table,
        keys = Seq("doc_id"), checkpointDir = ckpt, maxFilesPerTrigger = 2)
      try q.processAllAvailable() finally q.stop()
      deleteQuietly(tmp)
      s.table(table).drop("_source_file")
        .orderBy(col("doc_id").cast("bigint"))
    },
    str01.oracle, // compression must not change a single landed byte
  )

  // -------------------------------------------------------------- str19
  // The persisted SKETCH WAREHOUSE's streaming lifecycle — wh01's
  // save-then-append contract driven by a file stream: partitions 0–1
  // are built by the batch save, then each micro-batch lands a whole
  // new partition (the daily-ingestion arrival shape — the landing
  // write hash-partitions by the partition column, so a partition's
  // rows can never split across triggers and violate the
  // partition-granular append contract) and foreachBatch appends it.
  // The final merged estimate must hash-match the DIRECT whole-corpus
  // HLL build — neither micro-batch boundaries, the _APPENDED marker
  // path, nor retry-skips can move a register. Per-trigger cost is the
  // batch's partitions only; stored state is never re-read.
  private val str19 = QueryDef(
    "str19_stream_warehouse_append_parity",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("part", pmod(col("o_custkey"), lit(8)))
      val tmp = tempDir("graft_str19")
      val wh = tmp.resolve("wh").toString
      SketchWarehouse.saveHllWarehouse(
        o.filter(col("part") < 2), wh, "o_custkey", "part")
      val landing = tmp.resolve("landing").toString
      o.filter(col("part") >= 2).repartition(6, col("part"))
        .write.mode("overwrite").parquet(landing)
      val q = s.readStream.schema(o.schema)
        .option("maxFilesPerTrigger", 1).parquet(landing)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!batch.isEmpty)
            SketchWarehouse.appendWarehousePartitions(batch.toDF(), wh): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val exact = o.agg(count_distinct(col("o_custkey")).as("n_exact"))
      val out = SketchWarehouse.estimateHllWarehouse(s, wh)
        .crossJoin(broadcast(exact))
        .select(lit("warehouse_custkey_streamed").as("col_name"),
          col("n_exact"), col("n_est"),
          (abs(col("n_est") - col("n_exact")) <= lit(0.15) * col("n_exact"))
            .as("in_envelope"))
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Some(Sketches.hllSql("orders", "o_custkey", "warehouse_custkey_streamed")),
  )

  // -------------------------------------------------------------- str20
  // Streaming twin of the MAINTENANCE AUDIT — sim22's quantizer-drift
  // audit run the way a continuously-ingesting deployment runs it:
  // installments arrive as files on a stream, each micro-batch lands
  // in the persisted index (save on first arrival, append after) and
  // is audited IMMEDIATELY — auditVectorIndexDrift over just the
  // arrived rows audits exactly the newest stored batch (the audit
  // joins raw by cid, and batch cid sets are disjoint), under the
  // save-time model both calls load. The union of per-micro-batch
  // audit rows must equal sim22's one-shot audit — str20 shares
  // sim22's oracle, so a hash match certifies the streamed audit end
  // to end, drifted flags included. Arrival order is forced by
  // feeding the source incrementally (write file →
  // processAllAvailable → write file), the installment idiom the
  // incremental-curation queries drive.
  private val str20 = QueryDef(
    "str20_stream_drift_audit_parity",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val tmp = tempDir("graft_str20")
      val conf = s.sparkContext.hadoopConfiguration
      val asD = graft.functions.VectorFunctions.asDouble(col("embedding"))
      // one uniform (vec_id long, embedding double[]) schema for both
      // installments — a file stream has a single declared schema
      val base = emb.filter(col("vec_id") < 400)
        .select(col("vec_id").cast("long").as("vec_id"), asD.as("embedding"))
      val shifted = emb.filter(col("vec_id") >= 400)
        .select((col("vec_id").cast("long") + 100000L).as("vec_id"),
          transform(asD, x => x * lit(3.0d) + lit(1.0d)).as("embedding"))
      val arrivals = tmp.resolve("arrivals").toString
      val audits = tmp.resolve("audits").toString
      val idx = tmp.resolve("vindex").toString
      // the source dir must exist before the stream initializes (the
      // first installment lands only after start)
      graft.ingest.FileUtils.mkdirs(arrivals, conf)
      val q = s.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // a trigger can fire on an empty file set: nothing arrived
          if (!b.isEmpty) {
            val batch = b.toDF()
            if (!graft.ingest.FileUtils.exists(s"$idx/centroids", conf))
              VectorIndex.saveVectorIndex(batch, idx)
            else VectorIndex.appendVectorIndex(batch, idx)
            VectorIndex.auditVectorIndexDrift(s, idx, batch,
                threshold = 8.0, sampleMod = 2)
              .write.mode("append").parquet(audits): Unit
          }
        }
        .start()
      try {
        base.coalesce(1).write.mode("append").parquet(arrivals)
        q.processAllAvailable()
        shifted.coalesce(1).write.mode("append").parquet(arrivals)
        q.processAllAvailable()
      } finally q.stop()
      val out = s.read.parquet(audits)
        .orderBy("batch_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    VectorIndex.sim22Oracle,
  )

  // -------------------------------------------------------------- str21
  // The near-dup side's streamed maintenance audit — dd18's bucket-skew
  // audit run per appended micro-batch (str20's shape for the OTHER
  // persisted index): the history installment arrives first and lands
  // as the save batch, the deliberately boilerplate-heavy installment
  // lands as the append batch, and after each landing the audit row
  // for JUST the newest batch is emitted (auditIndexBuckets censuses
  // every stored batch; the newest-batch filter keeps the streamed
  // output one row per arrival — and a batch's stored bands never
  // change after commit, so each row equals its one-shot counterpart).
  // Union across micro-batches shares dd18's oracle: the history
  // batch's honest bucket profile, then the boilerplate batch flagged
  // over the cap.
  private val str21 = QueryDef(
    "str21_stream_bucket_audit_parity",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val boiler =
        "the same boilerplate footer appears verbatim on every page of this site"
      val tmp = tempDir("graft_str21")
      val conf = s.sparkContext.hadoopConfiguration
      val hist = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val surge = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id").cast("long").as("doc_id"),
          lit(boiler).as("text"))
      val arrivals = tmp.resolve("arrivals").toString
      val audits = tmp.resolve("audits").toString
      val idx = tmp.resolve("ndindex").toString
      graft.ingest.FileUtils.mkdirs(arrivals, conf)
      val landed = new AtomicLong(0L)
      val q = s.readStream.schema(hist.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!b.isEmpty) {
            val batch = b.toDF()
            if (!graft.ingest.FileUtils.exists(s"$idx/meta", conf))
              Dedup.saveNearDupIndex(batch, idx)
            else Dedup.appendNearDupIndex(batch, idx)
            val bid = landed.getAndIncrement()
            Dedup.auditIndexBuckets(s, idx, cap = 16)
              .filter(col("batch_id") === lit(bid))
              .write.mode("append").parquet(audits): Unit
          }
        }
        .start()
      try {
        hist.coalesce(1).write.mode("append").parquet(arrivals)
        q.processAllAvailable()
        surge.coalesce(1).write.mode("append").parquet(arrivals)
        q.processAllAvailable()
      } finally q.stop()
      val out = s.read.parquet(audits)
        .orderBy("batch_id")
        .localCheckpoint(eager = true)
      deleteQuietly(tmp)
      out
    },
    Dedup.dd18Oracle,
  )

  val defs: Seq[QueryDef] =
    Seq(str01, str02, str03, str04, str05, str06, str07, str08, str09, str10,
      str11, str12, str13, str14, str15, str16, str17, str18, str19, str20,
      str21, str22)
}
