package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming maintenance of the bottom-k quantile sketch
  * (Sketches.quantileSketch's KMV form) — the continuous analog of the
  * batch cut, for the "live decile dashboard" a 100-TB event feed
  * needs: state NEVER exceeds k rows per shard, whatever the firehose
  * volume.
  *
  * Shape: rows shard by key-hash into `nGroups` groups; each group's
  * flatMapGroupsWithState keeps its own bottom-k (h, kk, v) and emits a
  * FULL snapshot per trigger tagged with a per-group monotone `seq`.
  * The reader takes each group's LATEST snapshot, unions, and re-cuts
  * at k — exactly mergeQuantileSketches' union-and-recut algebra, whose
  * losslessness qs02 proves cell-for-cell (every global bottom-k member
  * survives its own shard's cut). Snapshot-emission beats delta-
  * emission here because the memory/table sink is append-shaped: the
  * latest (gid, seq) group IS the state, no replay needed.
  */
object StreamingQuantile {

  final case class QRow(gid: Int, h: Long, kk: Long, v: Double)
  final case class QState(seq: Long, h: Array[Long], kk: Array[Long],
      v: Array[Double])
  // `ng` pins the sharding the snapshot was written under: a snapshot
  // table can outlive its checkpoint, and gid = kk % nGroups means
  // snapshots from a run with a DIFFERENT nGroups shard the key space
  // differently — folding them together would double-count survivors
  // or miss them. latestSketch filters ng === its own nGroups, so
  // re-sharded runs can never mix.
  final case class QSnap(gid: Int, ng: Int, seq: Long, h: Long, kk: Long,
      v: Double)

  // keyed on (h, kk): a re-delivered row is the SAME element (set-add
  // no-ops), so a retried batch can never duplicate a survivor
  private val bottomKOrd: Ordering[(Long, Long, Double)] =
    Ordering.by(t => (t._1, t._2))

  private def advance(k: Int, nGroups: Int)(gid: Int, rows: Iterator[QRow],
      state: GroupState[QState]): Iterator[QSnap] = {
    val old = state.getOption.getOrElse(QState(0L, Array.empty, Array.empty, Array.empty))
    // bounded fold, NOT buffer-sort-cut: the group's micro-batch can
    // be arbitrarily large (the firehose case this operator exists
    // for), so rows stream through a ≤ k-element ordered set — O(k)
    // memory and O(n log k) work, never O(batch) of either
    val heap = scala.collection.mutable.TreeSet.empty(bottomKOrd)
    def insert(t: (Long, Long, Double)): Unit = {
      if (heap.size < k) heap.add(t): Unit
      else if (bottomKOrd.lt(t, heap.last) && heap.add(t)) heap.remove(heap.last): Unit
    }
    // seed through the SAME size-k insert as incoming rows: state
    // restored from a checkpoint written under a larger k must re-cap
    // here, or oversized state would persist and re-emit forever
    var i = 0
    while (i < old.h.length) { insert((old.h(i), old.kk(i), old.v(i))); i += 1 }
    rows.foreach(r => insert((r.h, r.kk, r.v)))
    val merged = heap.toSeq
    val seq = old.seq + 1
    state.update(QState(seq, merged.map(_._1).toArray,
      merged.map(_._2).toArray, merged.map(_._3).toArray))
    merged.iterator.map(t => QSnap(gid, nGroups, seq, t._1, t._2, t._3))
  }

  /** `rows` is the streaming (h, kk, v) projection
    * (Sketches.quantileRows over a stream — hash-identical to the
    * batch sketch by construction). Returns the per-trigger snapshot
    * stream; read back with [[latestSketch]].
    *
    * CONTRACT: the sketch key (the column hashed into `h`/`kk`) must be
    * UNIQUE per element — qsHash's strict-total-order contract. The
    * stream dedupes on (h, kk) (set-add, so a RETRIED batch can never
    * duplicate a survivor), while the batch quantileSketch keeps
    * duplicate (h, kk) rows; with a duplicated key the two would
    * legitimately diverge. Every caller here feeds a primary key
    * (o_orderkey, doc_id), which satisfies it by construction.
    */
  def bottomKUpdates(rows: DataFrame, k: Int,
      nGroups: Int = 8): Dataset[QSnap] = {
    implicit val rowEnc = Encoders.product[QRow]
    implicit val snapEnc = Encoders.product[QSnap]
    implicit val stateEnc = Encoders.product[QState]
    rows
      .select(pmod(col("kk"), lit(nGroups)).cast("int").as("gid"),
        col("h"), col("kk"), col("v"))
      .as[QRow]
      .groupByKey(_.gid)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(advance(k, nGroups))
  }

  /** The current global sketch from a landed snapshot table: latest
    * snapshot per group (a window over ≤ nGroups × k × triggers rows,
    * bounded), union, re-cut at k. `nGroups` must repeat the writer's:
    * only snapshots stamped with the SAME sharding fold in, so a
    * snapshot table that outlives its checkpoint (or a restart that
    * changed nGroups) can never mix two shardings into one sketch.
    */
  def latestSketch(snaps: DataFrame, k: Int, nGroups: Int = 8): DataFrame = {
    // a snapshot table written BEFORE the sharding stamp existed has no
    // ng column — fail with the remedy, not an unresolved-column error
    require(snaps.columns.contains("ng"),
      "snapshot table predates the ng sharding stamp; re-land it with " +
        "the current bottomKUpdates (its sharding cannot be verified)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gid"))
    snaps
      .filter(col("ng") === nGroups)
      .withColumn("mx", max(col("seq")).over(w))
      .filter(col("seq") === col("mx"))
      .select("h", "kk", "v")
      .orderBy(col("h"), col("kk")).limit(k)
  }
}
