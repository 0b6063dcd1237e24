package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Keyless interval-containment join, made scalable by BINNING
  * (SURVEY.md §2C extension; contrast q33, whose equi key already
  * anchors a hash join).
  *
  * A pure range predicate (`w.start <= f.ts < w.end`, no shared key)
  * gives Catalyst nothing to hash on: the plan degenerates to a
  * broadcast-nested-loop — or, with two big sides, a cartesian
  * product, which no cluster survives. The standard fix is to
  * discretize time into fixed-width bins: facts land in exactly one
  * bin, each window explodes into the bins it covers (span/binWidth
  * rows — bounded, controlled by the caller), and the join becomes a
  * plain hash equi-join on the bin with the exact predicate as a
  * residual filter. A (fact, window) match is found in exactly one bin
  * (the fact's), so no dedup step is needed.
  */
object RangeJoin {

  /** Join `facts` rows (event time `tsCol`, seconds resolution) to
    * `windows` rows covering `[startCol, endCol)`. All three columns
    * are timestamps; `binSeconds` trades explode factor (long windows)
    * against bin selectivity (short windows) — set it near the median
    * window span.
    */
  def binnedRangeJoin(facts: DataFrame, tsCol: String, windows: DataFrame,
      startCol: String, endCol: String, binSeconds: Long): DataFrame = {
    def bin(c: Column) = floor(unix_timestamp(c) / binSeconds)
    val f = facts.withColumn("_bin", bin(col(tsCol)))
    // degenerate windows (end <= start) match nothing in the naive
    // semantics and must be dropped BEFORE the explode: Spark's
    // sequence() defaults to step -1 when start > stop, so a single
    // swapped-bounds row would otherwise fan out into a huge
    // DESCENDING bin list instead of zero bins
    val w = windows.filter(col(endCol) > col(startCol)).withColumn("_bin",
      explode(sequence(bin(col(startCol)),
        floor((unix_timestamp(col(endCol)) - 1) / binSeconds))))
    f.join(w, Seq("_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }

  // -------------------------------------------------------------- q42
  // Flash-window attribution: the 10 highest-revenue order days define
  // 3-day interest windows [day-1, day+2); every lineitem shipped
  // inside a window attributes to it — by date CONTAINMENT only, no
  // join key. The Spark side runs the binned equi-join (plan guard:
  // no nested loop, no cartesian); the DuckDB oracle runs the naive
  // range join — independent computation paths, same rows.
  private val q42 = QueryDef(
    "q42_binned_range_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val windows = t.orders
        .groupBy(date_trunc("DAY", col("o_orderdate")).as("wday"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
        .orderBy(desc("rev"), col("wday"))
        .limit(10)
        .select(col("wday"),
          (col("wday") - expr("INTERVAL 1 DAY")).as("wstart"),
          (col("wday") + expr("INTERVAL 2 DAY")).as("wend"))
      binnedRangeJoin(
        t.lineitem.select(col("l_shipdate"), col("l_extendedprice")),
        "l_shipdate", windows, "wstart", "wend", 86400L)
        .groupBy("wday")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("revenue"))
        .orderBy("wday")
    },
    Some("""WITH w AS (
        SELECT wday, wday - INTERVAL 1 DAY AS wstart, wday + INTERVAL 2 DAY AS wend
        FROM (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS wday,
                SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
              FROM orders GROUP BY 1 ORDER BY rev DESC, wday LIMIT 10))
      SELECT wday, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN w ON l_shipdate >= wstart AND l_shipdate < wend
      GROUP BY wday ORDER BY wday"""),
  )

  val defs: Seq[QueryDef] = Seq(q42)
}
