package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** As-of join: each left row picks up the most recent right row with
  * `right.ts <= left.ts` within the same key — the standard
  * time-series enrichment operator (trades→quotes, purchases→clicks)
  * that Spark has no built-in for.
  *
  * Implementation is preference-order (a), composition: tag both
  * sides, UNION them, and run one `last(value, ignoreNulls)` window
  * ordered by (ts, side) per key — no join at all, so there is
  * exactly ONE shuffle (the window's partitionBy) regardless of side
  * sizes, and no row-multiplication risk from duplicate timestamps.
  * Equal timestamps order the right row first, giving `<=` semantics
  * identical to DuckDB's native ASOF JOIN (which the oracle uses).
  * A custom SparkStrategy (preference (c)) would only pay off if the
  * window's sort became the bottleneck — at that point a sort-merge
  * physical operator over pre-bucketed inputs is the upgrade path.
  */
object AsOf {

  /** Shared union+window as-of kernel; [[asofJoin]] / [[asofJoinForward]]
    * are the two directions. Backward: right rows tag 0 (sort before
    * left at equal ts → `<=` matches), frame looks back, `last` picks
    * the most recent. Forward: left rows tag 0 (`>=` matches), frame
    * looks ahead, `first` picks the earliest. Everything else — the
    * `_r_` column isolation, the single key-partitioned shuffle, the
    * null-fill contract — is direction-independent and lives here once.
    */
  private def asofKernel(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, valueCols: Seq[String], forward: Boolean): DataFrame = {
    val tag = "_graft_side"
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)
    val leftCols = left.columns.toSeq
    val l = left.withColumn(tag, lit(leftTag))
    val r = right
      .select((keys :+ ts).map(col) ++ valueCols.map(c => col(c).as(s"_r_$c")): _*)
      .withColumn(tag, lit(rightTag))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc)
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: Column): Column =
      if (forward) first(c, ignoreNulls = true) else last(c, ignoreNulls = true)
    val filled = valueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"asof_$c", pick(col(s"_r_$c")).over(w)))
    filled.filter(col(tag) === leftTag)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Left as-of join. `valueCols` are brought over from `right`
    * (nulled where no earlier right row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      valueCols: Seq[String]): DataFrame =
    asofKernel(left, right, keys, ts, valueCols, forward = false)

  // ---------------------------------------------------------------- ao01
  // Each purchase picks up the same user's most recent prior (or
  // simultaneous) click value. Right side is pre-deduplicated to one
  // row per (user, ts) so the as-of choice is well-defined in both
  // engines.
  private val ao01 = QueryDef(
    "ao01_asof_join",
    (s, dir) => {
      val e = Tables(s, dir).events
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      asofJoin(purchases, clicks, Seq("user_id"), "ts", Seq("click_value"))
        .select(col("p_event_id"), col("user_id"), col("asof_click_value").as("click_value"))
        .orderBy("p_event_id")
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

  // ---------------------------------------------------------------- ao02
  // As-of with a tolerance (staleness bound): the matched click must be
  // at most 1 hour older than the purchase, else the enrichment is
  // nulled — the time-series form where stale context is worse than no
  // context. Composed from the same single-shuffle asofJoin by carrying
  // the matched right timestamp as a value column; the bound is applied
  // as a post-projection, identical to the oracle's CASE over DuckDB's
  // native ASOF match. Timestamp difference compares against a literal
  // interval — both engines evaluate it at microsecond precision.
  private val ao02 = QueryDef(
    "ao02_asof_tolerance",
    (s, dir) => {
      val e = Tables(s, dir).events
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
        .withColumn("r_ts", col("ts"))
      asofJoin(purchases, clicks, Seq("user_id"), "ts", Seq("click_value", "r_ts"))
        .select(col("p_event_id"), col("user_id"),
          when(col("ts") - col("asof_r_ts") <= expr("INTERVAL '1' HOUR"),
            col("asof_click_value")).as("click_value_1h"))
        .orderBy("p_event_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, value, event_type,
        MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts FROM events),
      p AS (SELECT event_id AS p_event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, MAX(value) AS click_value FROM e
        WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p_event_id, p.user_id,
        CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.click_value END AS click_value_1h
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      ORDER BY p_event_id"""),
  )

  /** FORWARD as-of join: each left row picks up the EARLIEST right row
    * with `right.ts >= left.ts` per key — the lookahead enrichment
    * (order → next shipment, click → next purchase). Same one-shuffle
    * union+window shape as [[asofJoin]], mirrored: the frame looks
    * forward (`first` over [current, unbounded following]) and the
    * side tag orders LEFT first at equal timestamps so a simultaneous
    * right row still matches (`>=` semantics).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      valueCols: Seq[String]): DataFrame =
    asofKernel(left, right, keys, ts, valueCols, forward = true)

  // ---------------------------------------------------------------- ao03
  // Forward twin of ao01: each view picks up the same user's NEXT (or
  // simultaneous) purchase value — time-to-conversion enrichment.
  // Oracle uses DuckDB's native ASOF with the >= comparison.
  private val ao03 = QueryDef(
    "ao03_asof_forward",
    (s, dir) => {
      val e = Tables(s, dir).events
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      asofJoinForward(views, purchases, Seq("user_id"), "ts", Seq("purchase_value"))
        .select(col("v_event_id"), col("user_id"),
          col("asof_purchase_value").as("purchase_value"))
        .orderBy("v_event_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, value, event_type,
        MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts FROM events),
      v AS (SELECT event_id AS v_event_id, user_id, ts FROM e WHERE event_type = 'view'),
      p AS (SELECT user_id, ts, MAX(value) AS purchase_value FROM e
        WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT v_event_id, v.user_id, p.purchase_value
      FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND p.ts >= v.ts
      ORDER BY v_event_id"""),
  )

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`):
    * each left row picks up the right row minimizing |right.ts −
    * left.ts| per key, preferring the BACKWARD match on an exact
    * distance tie (and an equal-timestamp match is distance 0, so it
    * always wins). Still ONE shuffle: both directional candidates come
    * from the same key-partitioned, (ts, side)-ordered sort — the
    * backward `last` and forward `first` windows share the exchange
    * and the sort, and the per-row distance comparison is a pure
    * projection. The right row's (ts, values) travel as ONE struct so
    * the chosen timestamp and the chosen values can never come from
    * different right rows (a hazard the per-column ignoreNulls fill
    * would have under null right values).
    *
    * Right side must be unique per (keys, ts) — pre-aggregate as ao01
    * does — or the equal-key ordering is undefined.
    *
    * Output: left columns ++ `asof_<valueCol>`* ++ `asof_ts` (the
    * matched right timestamp; null when the key has no right rows).
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      valueCols: Seq[String]): DataFrame = {
    // working columns live in the _graft_ namespace (the side-tag
    // precedent) AND are asserted absent: a caller column silently
    // shadowed by a temporary would produce wrong output, not an error
    val tag = "_graft_side"
    val (bCol, fCol, nearCol, packCol) =
      ("_graft_b", "_graft_f", "_graft_near", "_graft_r_pack")
    Seq(tag, bCol, fCol, nearCol, packCol).foreach(c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"asofJoinNearest reserves working column name $c"))
    // the pack struct names the matched timestamp _ts internally; a
    // value column of that name would duplicate the struct field and
    // make the nearCol._ts reference ambiguous
    require(!valueCols.contains("_ts") && ts != "_ts",
      "asofJoinNearest reserves the struct field name _ts")
    val leftCols = left.columns.toSeq
    // right tags 0: at equal ts it sorts BEFORE the left row, so the
    // backward frame includes it (<= semantics) and the forward frame
    // sees only strictly-later right rows — which is exactly right for
    // nearest: the distance-0 match is already the backward candidate.
    val l = left.withColumn(tag, lit(1))
    val pack = struct(col(ts).as("_ts") +: valueCols.map(col): _*)
    val r = right.select(keys.map(col) :+ col(ts) :+ pack.as(packCol): _*)
      .withColumn(tag, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val backWins = col(bCol).isNotNull && (col(fCol).isNull ||
      (col(ts) - col(s"$bCol._ts")) <= (col(s"$fCol._ts") - col(ts)))
    unioned
      .withColumn(bCol, last(col(packCol), ignoreNulls = true).over(wb))
      .withColumn(fCol, first(col(packCol), ignoreNulls = true).over(wf))
      .filter(col(tag) === 1)
      .withColumn(nearCol, when(backWins, col(bCol)).otherwise(col(fCol)))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$nearCol.$c").as(s"asof_$c")) :+
        col(s"$nearCol._ts").as("asof_ts"): _*)
  }

  // ---------------------------------------------------------------- ao04
  // Nearest twin of ao01/ao03: each purchase picks the temporally
  // CLOSEST click (before or after) — proximity attribution. The
  // signed gap (positive = click preceded the purchase) rides along as
  // gap_us so the hash also pins WHICH side won every tie. DuckDB has
  // no nearest ASOF; the oracle composes its backward (<=) and strict
  // forward (>) ASOF joins and replays the same tie-break.
  private val ao04 = QueryDef(
    "ao04_asof_nearest",
    (s, dir) => {
      val e = Tables(s, dir).events
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      asofJoinNearest(purchases, clicks, Seq("user_id"), "ts", Seq("click_value"))
        .select(col("p_event_id"), col("user_id"),
          col("asof_click_value").as("click_value"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("p_event_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, value, event_type,
        MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts FROM events),
      p AS (SELECT event_id AS p_event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, MAX(value) AS click_value FROM e
        WHERE event_type = 'click' GROUP BY 1, 2),
      b AS (SELECT p_event_id, p.user_id, p.ts, c.ts AS b_ts, c.click_value AS b_v
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts),
      f AS (SELECT p_event_id, c.ts AS f_ts, c.click_value AS f_v
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts > p.ts)
      SELECT b.p_event_id, b.user_id,
        CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR b.ts - b_ts <= f_ts - b.ts)
          THEN b_v ELSE f_v END AS click_value,
        CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR b.ts - b_ts <= f_ts - b.ts)
          THEN EPOCH_US(b.ts) - EPOCH_US(b_ts)
          ELSE EPOCH_US(b.ts) - EPOCH_US(f_ts) END AS gap_us
      FROM b JOIN f USING (p_event_id)
      ORDER BY p_event_id"""),
  )

  val defs: Seq[QueryDef] = Seq(ao01, ao02, ao03, ao04)
}
