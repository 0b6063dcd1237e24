package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the binned range join: binning must be an
  * optimization, never a semantics change.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val facts = Seq(
    (1L, ts("2024-01-01 00:00:00")), // exactly at a window start
    (2L, ts("2024-01-01 11:59:59")), // inside
    (3L, ts("2024-01-02 00:00:00")), // exactly at window end -> excluded
    (4L, ts("2024-03-15 05:00:00")), // in no window
    (5L, ts("2024-01-05 23:00:00")), // inside the second window
  ).toDF("id", "t")

  private val windows = Seq(
    ("w1", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    ("w2", ts("2024-01-04 12:00:00"), ts("2024-01-06 00:00:00")),
  ).toDF("w", "s", "e")

  test("binned join equals the naive range join, half-open boundaries exact") {
    val binned = RangeJoin.binnedRangeJoin(facts, "t", windows, "s", "e", 3600L)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = facts.crossJoin(windows)
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("id", "w").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
    assert(binned == Set((1L, "w1"), (2L, "w1"), (5L, "w2")))
  }

  test("bin width does not change results (only the explode factor)") {
    for (width <- Seq(60L, 3600L, 86400L, 7 * 86400L)) {
      val got = RangeJoin.binnedRangeJoin(facts, "t", windows, "s", "e", width)
        .select("id", "w").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "w1"), (2L, "w1"), (5L, "w2")), s"width=$width")
    }
  }

  test("degenerate window (end <= start) matches nothing and does not explode") {
    val bad = Seq(
      ("ok", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      ("swapped", ts("2024-03-01 00:00:00"), ts("2024-01-01 00:00:00")), // end < start
      ("empty", ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00")),   // end == start
    ).toDF("w", "s", "e")
    // binSeconds=60: an unguarded descending sequence() over the
    // swapped window would generate ~86k bins; the guard must keep the
    // result identical to the naive join (which matches nothing)
    val got = RangeJoin.binnedRangeJoin(facts, "t", bad, "s", "e", 60L)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "ok"), (2L, "ok")))
  }

  test("overlapping windows: a fact matches each container exactly once") {
    val overlapping = Seq(
      ("a", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      ("b", ts("2024-01-01 06:00:00"), ts("2024-01-02 06:00:00")),
    ).toDF("w", "s", "e")
    val got = RangeJoin.binnedRangeJoin(facts, "t", overlapping, "s", "e", 3600L)
      .select("id", "w").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == got.distinct.length, "no duplicate (fact, window) pairs")
    assert(got.toSet == Set((1L, "a"), (2L, "a"), (3L, "a"), (2L, "b"), (3L, "b")))
  }
}
