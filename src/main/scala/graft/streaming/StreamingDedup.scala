package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: MinHash-LSH as a stateful
  * Structured Streaming operator — dedup-on-ingest for a document
  * firehose, the streaming twin of [[graft.operators.Dedup.minhashPairs]]
  * (SURVEY.md §2C extension; the reference is batch-only).
  *
  * Topology: signature (custom MinHashSignature expression, same hash
  * family as batch) → explode LSH band keys → `flatMapGroupsWithState`
  * keyed by band hash. Each bucket's state holds the recent member
  * signatures; an arriving document emits a candidate pair for every
  * stored member whose estimated Jaccard (fraction of equal minhash
  * coordinates — the unbiased MinHash estimator) clears `threshold`.
  *
  * Scale/state bounds (the part that must hold at 100 TB/day):
  *  - per-bucket state is capped at `maxBucket` members (oldest
  *    evicted first — boilerplate-heavy buckets degrade gracefully
  *    instead of growing without bound, the streaming analogue of the
  *    batch stop-bucket cutoff);
  *  - whole buckets are evicted via event-time timeout once idle past
  *    the watermark (`idleTimeout`), so total state is bounded by
  *    (active buckets × maxBucket) — nothing lives forever;
  *  - the exact-Jaccard verify of the batch path needs both shingle
  *    sets and is deliberately NOT kept in state; the stream emits
  *    estimator-scored candidates (32 coordinates → ±0.09 std err),
  *    and a downstream batch verify can rescore exactly.
  *
  * A pair colliding in several bands is emitted once per colliding
  * band; `dropDuplicatesWithinWatermark` on (doc_a, doc_b) downstream
  * collapses them when uniqueness matters.
  */
object StreamingDedup {

  final case class BandDoc(bandkey: Long, ts: java.sql.Timestamp, doc_id: Long,
      sig: Array[Long])
  final case class BucketMember(doc_id: Long, sig: Array[Long])
  final case class BucketState(members: List[BucketMember])
  final case class CandidatePair(doc_a: Long, doc_b: Long, est_jaccard: Double,
      ts: java.sql.Timestamp)

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  private def updateBucket(threshold: Double, maxBucket: Int, idleMs: Long)(
      bandkey: Long, rows: Iterator[BandDoc],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    if (state.hasTimedOut) {
      // bucket idle past the horizon: evict — new arrivals simply
      // start a fresh bucket (they could not have paired with members
      // older than the watermark anyway)
      state.remove()
      Iterator.empty
    } else {
      var members = state.getOption.map(_.members).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
      var maxTs = 0L
      rows.foreach { r =>
        maxTs = math.max(maxTs, r.ts.getTime)
        members.foreach { m =>
          if (m.doc_id != r.doc_id) {
            val est = estJaccard(m.sig, r.sig)
            if (est >= threshold)
              out += CandidatePair(math.min(m.doc_id, r.doc_id),
                math.max(m.doc_id, r.doc_id), est, r.ts)
          }
        }
        members = (BucketMember(r.doc_id, r.sig) :: members).take(maxBucket)
      }
      state.update(BucketState(members))
      if (maxTs > 0) state.setTimeoutTimestamp(maxTs + idleMs)
      out.iterator
    }
  }

  /** Candidate near-dup pairs over a streaming (doc_id, ts, text)
    * frame. `watermark` bounds late data; `idleTimeout` evicts buckets
    * idle past it (must be >= watermark to not drop pairable state).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 32, bands: Int = 16, maxBucket: Int = 50,
      watermark: String = "2 hours", idleTimeoutMs: Long = 2 * 3600 * 1000L)
      : Dataset[CandidatePair] = {
    val rows = numHashes / bands
    val sigs = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("doc_id"),
        graft.functions.TextExpressions.minhash_signature(
          graft.functions.TextExpressions.word_shingles(col("text"), 3), numHashes).as("sig"))
    val banded = sigs.select(col("ts"), col("doc_id"), col("sig"),
        explode(array((0 until bands).map { b =>
          // band key = band index tagged into the hash of its rows
          xxhash64(lit(b) +: (b * rows until (b + 1) * rows)
            .map(j => element_at(col("sig"), j + 1)): _*)
        }: _*)).as("bandkey"))
      .select(col("bandkey"), col("ts"), col("doc_id"), col("sig"))
      .as[BandDoc](Encoders.product[BandDoc])
    banded
      .groupByKey(_.bandkey)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateBucket(threshold, maxBucket, idleTimeoutMs))(
        Encoders.product[BucketState], Encoders.product[CandidatePair])
  }
}
