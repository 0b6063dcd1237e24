package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Distribution-drift and release-audit statistics (SURVEY.md §2C
  * extension; the reference's audit surface stops at error-log
  * aggregation, error_logger.py:61-118 — these are the statistical
  * monitors a 100 TB pipeline runs between corpus releases).
  *
  *  - ks01: two-sample Kolmogorov–Smirnov distance between an early and
  *    a late order cohort — numeric-distribution drift;
  *  - chi01: chi-square contingency audit of a categorical column
  *    across the same cohorts — categorical drift;
  *  - dp01: differentially-private (Laplace) noised group counts — the
  *    release-safe aggregate a governance pipeline publishes;
  *  - cal01: reliability (calibration) bins for the qf02 quality
  *    classifier — score-decile observed-positive rates.
  *
  * Determinism contract (QueryDef): every statistic is either exact
  * integer arithmetic, a single IEEE-exact double op over exact
  * integers (correctly-rounded * and / are bit-identical across
  * engines), or — for the Laplace ln() only — a library transcendental
  * whose cross-engine ulp differences vanish under the oracle's 6
  * significant-digit hash canonicalization.
  */
object Drift {

  /** Cohort split reused by ks01/chi01: first half vs second half of
    * the order history. Spark side; the oracle inlines the same
    * timestamp literal.
    */
  private val SplitTs = "1995-07-01"

  // -------------------------------------------------------------- ks01
  /** Two-sample KS distance D = max_x |F_early(x) - F_late(x)| over
    * o_totalprice, comparing orders before/after [[SplitTs]].
    *
    * Exactness: CDF steps are ratios of integers, so D is computed as
    * the INTEGER max of |cum1·n2 − cum2·n1| (common denominator n1·n2)
    * and only scaled once at the end — no floating-point ECDFs to
    * accumulate error, and the output hashes identically everywhere.
    *
    * 100 TB shape: a naive ECDF is a global-sort single-partition
    * running sum — a scale killer. This reuses pack01's HIERARCHICAL
    * prefix sum: distinct values are sharded by price range, cumulative
    * counts run per-shard in parallel, shard totals (tiny) take a
    * shard-level scan, and the global cumulative = shard base +
    * within-shard cumsum. The final reduction is a plain max. ks_num ·
    * 10^6 must fit int64 — n1·n2 ≤ ~9·10^12, i.e. fine to ~3M rows per
    * cohort; beyond that the same formula runs in DECIMAL(38,0).
    */
  private val ks01 = QueryDef(
    "ks01_ks_drift",
    (s, dir) => {
      val o = Tables(s, dir).orders.select(col("o_totalprice").as("x"),
        (col("o_orderdate") < lit(SplitTs).cast("timestamp")).as("early"))
      val c = o.groupBy("x").agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("early"), 0L).otherwise(1L)).as("c2"))
        .withColumn("shard", floor(col("x") / lit(25000.0)).cast("long"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("x"))
      val withCum = c
        .withColumn("p1", sum(col("c1")).over(wIn))
        .withColumn("p2", sum(col("c2")).over(wIn))
      val bases = Sharded.prefixSumBases(
        c.groupBy(col("shard"))
          .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2")),
        "shard", Seq("t1" -> "b1", "t2" -> "b2"))
      val cum = withCum.join(broadcast(bases), "shard")
        .select((col("p1") + col("b1")).as("cum1"), (col("p2") + col("b2")).as("cum2"))
      val tot = c.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .groupBy("n1", "n2")
        .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("ksn"))
        .select(col("n1").cast("bigint").as("n_early"),
          col("n2").cast("bigint").as("n_late"),
          col("ksn").cast("bigint").as("ks_num"),
          expr("(ksn * 1000000L) div (n1 * n2)").cast("bigint").as("ks_scaled"))
    },
    Some(s"""WITH s AS (SELECT o_totalprice AS x,
          o_orderdate < TIMESTAMP '$SplitTs' AS early FROM orders),
      c AS (SELECT x,
          SUM(CASE WHEN early THEN 1 ELSE 0 END) AS c1,
          SUM(CASE WHEN early THEN 0 ELSE 1 END) AS c2
        FROM s GROUP BY x),
      cc AS (SELECT CAST(SUM(c1) OVER (ORDER BY x) AS HUGEINT) AS cum1,
          CAST(SUM(c2) OVER (ORDER BY x) AS HUGEINT) AS cum2 FROM c),
      t AS (SELECT CAST(SUM(c1) AS HUGEINT) AS n1,
          CAST(SUM(c2) AS HUGEINT) AS n2 FROM c)
      SELECT CAST(t.n1 AS BIGINT) AS n_early, CAST(t.n2 AS BIGINT) AS n_late,
        CAST(MAX(ABS(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT) AS ks_num,
        CAST((MAX(ABS(cum1 * t.n2 - cum2 * t.n1))
            * CAST(1000000 AS HUGEINT)) // (t.n1 * t.n2)
          AS BIGINT) AS ks_scaled
      FROM cc, t GROUP BY t.n1, t.n2"""),
  )

  // ------------------------------------------------------------- chi01
  /** Chi-square contingency audit: o_orderpriority × cohort. Emits one
    * row per OBSERVED cell (a priority absent from a cohort would
    * simply not appear — same semantics both engines) with the
    * observed count, the floored expected count, and the cell's
    * chi-square contribution (obs·n − rt·ct)² / (n·rt·ct).
    *
    * Exactness: diff = obs·n − rt·ct and n·rt·ct are exact int64
    * (≲ 10^15 at sf0.1); each fits a double EXACTLY (< 2^53), and the
    * one multiply + one divide that form the double statistic are
    * IEEE-correctly-rounded — bit-identical across engines, no sum of
    * doubles anywhere (the total χ² is the consumer's exact-integer sum
    * to take, spec'd but not emitted).
    *
    * 100 TB shape: one groupBy over the fact, two tiny marginal
    * aggregations broadcast back — a single shuffle on the cell key.
    */
  private val chi01 = QueryDef(
    "chi01_chisq_drift",
    (s, dir) => {
      val o = Tables(s, dir).orders.select(col("o_orderpriority").as("prio"),
        when(col("o_orderdate") < lit(SplitTs).cast("timestamp"), "early")
          .otherwise("late").as("grp"))
      val cells = o.groupBy("prio", "grp").agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy("prio").agg(sum(col("obs")).as("rt"))
      val ct = cells.groupBy("grp").agg(sum(col("obs")).as("ct"))
      val n = cells.agg(sum(col("obs")).as("n"))
      cells.join(broadcast(rt), "prio").join(broadcast(ct), "grp")
        .crossJoin(broadcast(n))
        .withColumn("diff", col("obs") * col("n") - col("rt") * col("ct"))
        .select(col("prio").as("o_orderpriority"), col("grp"),
          col("obs").cast("bigint").as("obs"),
          expr("(rt * ct) div n").cast("bigint").as("exp_floor"),
          ((col("diff").cast("double") * col("diff").cast("double"))
            / (col("n") * col("rt") * col("ct")).cast("double")).as("chi2_cell"))
        .orderBy("o_orderpriority", "grp")
    },
    Some(s"""WITH s AS (SELECT o_orderpriority AS prio,
          CASE WHEN o_orderdate < TIMESTAMP '$SplitTs' THEN 'early' ELSE 'late' END AS grp
        FROM orders),
      cells AS (SELECT prio, grp, CAST(COUNT(*) AS BIGINT) AS obs FROM s GROUP BY prio, grp),
      rt AS (SELECT prio, CAST(SUM(obs) AS BIGINT) AS rt FROM cells GROUP BY prio),
      ct AS (SELECT grp, CAST(SUM(obs) AS BIGINT) AS ct FROM cells GROUP BY grp),
      n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
      SELECT c.prio AS o_orderpriority, c.grp AS grp, c.obs AS obs,
        CAST((rt.rt * ct.ct) // n.n AS BIGINT) AS exp_floor,
        (CAST(c.obs * n.n - rt.rt * ct.ct AS DOUBLE)
          * CAST(c.obs * n.n - rt.rt * ct.ct AS DOUBLE))
          / CAST(n.n * rt.rt * ct.ct AS DOUBLE) AS chi2_cell
      FROM cells c JOIN rt ON rt.prio = c.prio JOIN ct ON ct.grp = c.grp, n
      ORDER BY o_orderpriority, grp"""),
  )

  // -------------------------------------------------------------- dp01
  /** Laplace-noised group counts (ε = 1, sensitivity 1): the
    * differential-privacy release shape for published aggregates. The
    * noise draw is DERANDOMIZED for the oracle: u = (h + 0.5)/2^24 with
    * h the first 6 md5 hex digits of the salted group key — u is
    * strictly inside (0, 1) by the +0.5 offset (ln never sees 0), and
    * noise = −(1/ε)·sign(u−½)·ln(1 − 2|u−½|) is the standard inverse-CDF
    * Laplace transform. Production swaps the hash for a real RNG; the
    * plan (one aggregation, one map) is unchanged.
    *
    * 100 TB shape: a single hash aggregation with map-side combine;
    * noise is a per-GROUP scalar, so the map stage is group-count
    * sized, not data-sized.
    */
  private val dp01 = QueryDef(
    "dp01_dp_counts",
    (s, dir) => {
      val eps = 1.0
      Tables(s, dir).events.groupBy("event_type").agg(count(lit(1)).as("n"))
        .withColumn("u",
          (expr("cast(conv(substr(md5(cast(concat('dp:', event_type) as binary)), 1, 6), 16, 10) as bigint)")
            .cast("double") + lit(0.5)) / lit(16777216.0))
        .withColumn("noise",
          lit(-1.0 / eps) * signum(col("u") - lit(0.5))
            * log(lit(1.0) - lit(2.0) * abs(col("u") - lit(0.5))))
        .select(col("event_type"), col("n").cast("bigint").as("n"),
          (col("n") + col("noise")).as("noisy_count"),
          lit(eps).as("epsilon"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type),
      u AS (SELECT event_type, n,
          (CAST(('0x' || substr(md5('dp:' || event_type), 1, 6)) AS BIGINT) + 0.5)
            / 16777216.0 AS u
        FROM g)
      SELECT event_type, n,
        n + (-1.0) * SIGN(u - 0.5) * LN(1 - 2 * ABS(u - 0.5)) AS noisy_count,
        CAST(1.0 AS DOUBLE) AS epsilon
      FROM u ORDER BY event_type"""),
  )

  // ------------------------------------------------------------- cal01
  /** Reliability (calibration) bins for the qf02 quality classifier:
    * re-score every document with the SAME kernel
    * ([[Quality.ClassifierScoreExpr]]), quantize the score to an exact
    * integer (score_int·10^5 div (4096·n_words) ∈ [−50000, 50000]),
    * bucket into 10 bins, and report per-bin document count, positive
    * count (label: n_chars ≥ 500 — the length proxy), observed positive
    * rate and the exact integer score sum. A well-calibrated scorer's
    * pos_rate should rise monotonically with the bin.
    *
    * Exactness: binning and the score sum are pure int64. score_scaled
    * has a NEGATIVE numerator for roughly half the docs — that is safe
    * because Spark's `div` and DuckDB's `//` both truncate toward zero
    * (verified: -7 // 2 = -3 in DuckDB); an engine with FLOORED integer
    * division would bin negative scores off by one. pos_rate is one
    * exact-int division.
    *
    * 100 TB shape: one codegen'd scoring projection (no join — the
    * model is arithmetic, see qf02), one 10-key aggregation.
    */
  private val cal01 = QueryDef(
    "cal01_reliability_bins",
    (s, dir) => {
      val toks = graft.functions.TextExpressions.tokens(col("text"))
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) > 0)
        .withColumn("n_words", size(col("toks")).cast("bigint"))
        .withColumn("score_int", expr(Quality.ClassifierScoreExpr))
        .withColumn("score_scaled",
          expr("(score_int * 100000L) div (4096L * n_words)"))
        .withColumn("bin",
          least(greatest(expr("(score_scaled + 50000L) div 10000L"), lit(0L)), lit(9L)))
        .withColumn("pos", (col("n_chars") >= 500).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pos")).as("n_pos"),
          sum(col("score_scaled")).as("sum_score_scaled"))
        .select(col("bin"), col("n_docs").cast("bigint").as("n_docs"),
          col("n_pos").cast("bigint").as("n_pos"),
          (col("n_pos").cast("double") / col("n_docs").cast("double")).as("pos_rate"),
          col("sum_score_scaled").cast("bigint").as("sum_score_scaled"))
        .orderBy("bin")
    },
    Some(s"""WITH t AS (SELECT doc_id, n_chars, ${OracleSql.Toks} AS toks FROM documents),
      m AS (SELECT doc_id, n_chars,
          CAST(len(toks) AS BIGINT) AS n_words,
          ${Quality.ClassifierScoreSql} AS score_int
        FROM t WHERE len(toks) > 0),
      q AS (SELECT doc_id, n_chars,
          (score_int * 100000) // (4096 * n_words) AS score_scaled
        FROM m),
      b AS (SELECT LEAST(GREATEST((score_scaled + 50000) // 10000, 0), 9) AS bin,
          score_scaled, CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS pos
        FROM q)
      SELECT CAST(bin AS BIGINT) AS bin,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate,
        CAST(SUM(score_scaled) AS BIGINT) AS sum_score_scaled
      FROM b GROUP BY bin ORDER BY bin"""),
  )

  // -------------------------------------------------------------- fe01
  /** Equal-frequency (quantile) discretization of o_totalprice into 10
    * bins — the feature-engineering binning step — WITHOUT a global
    * sort: a naive ntile() is one single-partition window over the
    * fact. This reuses ks01's hierarchical ECDF: per-value counts
    * shard by price range, within-shard cumulative counts run in
    * parallel, shard bases broadcast back, and a value's bin is the
    * integer rank-quantile of its FIRST row, ((cum − cnt) · 10) div n
    * — so ties share a bin and the arithmetic is exact. Output is the
    * bin summary (count + value range) a feature store publishes;
    * boundary rows: bins can be uneven exactly where ties cross a
    * quantile edge, which equal-frequency binning accepts by
    * definition.
    */
  private val fe01 = QueryDef(
    "fe01_quantile_bins",
    (s, dir) => {
      val c = Tables(s, dir).orders.groupBy(col("o_totalprice").as("x"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("shard", floor(col("x") / lit(25000.0)).cast("long"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("x"))
      val withCum = c.withColumn("p", sum(col("cnt")).over(wIn))
      val bases = Sharded.prefixSumBases(
        c.groupBy(col("shard")).agg(sum(col("cnt")).as("t")),
        "shard", Seq("t" -> "b"))
      val tot = c.agg(sum(col("cnt")).as("n"))
      withCum.join(broadcast(bases), "shard")
        .crossJoin(broadcast(tot))
        .withColumn("bin", expr("((p + b - cnt) * 10) div n"))
        .groupBy("bin")
        .agg(sum(col("cnt")).as("n_rows"), min(col("x")).as("x_min"),
          max(col("x")).as("x_max"))
        .select(col("bin").cast("bigint").as("bin"),
          col("n_rows").cast("bigint").as("n_rows"), col("x_min"), col("x_max"))
        .orderBy("bin")
    },
    Some("""WITH c AS (SELECT o_totalprice AS x, COUNT(*) AS cnt
          FROM orders GROUP BY 1),
      cc AS (SELECT x, cnt,
          CAST(SUM(cnt) OVER (ORDER BY x) AS BIGINT) AS cum FROM c),
      t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
      b AS (SELECT x, cnt, ((cum - cnt) * 10) // t.n AS bin FROM cc, t)
      SELECT CAST(bin AS BIGINT) AS bin, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        MIN(x) AS x_min, MAX(x) AS x_max
      FROM b GROUP BY bin ORDER BY bin"""),
  )

  // ------------------------------------------------------------- psi01
  /** Population Stability Index — THE model-monitoring drift metric
    * (credit-risk lineage; the number dashboards alert on at 0.1/0.25
    * thresholds), complementing ks01's sup-norm view with a per-bin
    * decomposition: PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i), over 10
    * equal-width bins spanning the EARLY cohort's value range (the
    * reference distribution defines the binning; late-cohort outliers
    * clamp into the edge bins). Counts get +1 smoothing so empty bins
    * stay finite — deterministic, and both engines smooth identically.
    *
    * Determinism: bin index is one subtract/divide/floor over the
    * early min/width (dm02's contract); fractions and the ln() chain
    * are the same literal-order IEEE ops in both engines. Scale: one
    * min/max pass over the early cohort broadcast back, one
    * 10×2-group aggregation, a 20-row PSI fold — nothing sorts,
    * nothing collects.
    */
  private val psi01 = QueryDef(
    "psi01_psi_drift",
    (s, dir) => {
      val o = Tables(s, dir).orders.select(col("o_totalprice").as("x"),
        (col("o_orderdate") < lit(SplitTs).cast("timestamp")).as("early"))
      val mm = o.filter(col("early"))
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
        .withColumn("width", (col("hi") - col("lo")) / lit(10.0))
      val observed = o.crossJoin(broadcast(mm))
        .withColumn("bin",
          greatest(least(floor((col("x") - col("lo")) / col("width")), lit(9L)), lit(0L))
            .cast("bigint"))
        .groupBy("bin")
        .agg(sum(when(col("early"), 1L).otherwise(0L)).as("ce"),
          sum(when(col("early"), 0L).otherwise(1L)).as("cl"))
      // fixed 0..9 spine: a bin empty in BOTH cohorts still contributes
      // its smoothed term (without it sum(p) < 1 and n_bins < 10 —
      // deviating from standard fixed-10-bin smoothed PSI)
      val binned = s.range(10).select(col("id").as("bin"))
        .join(observed, Seq("bin"), "left")
        .na.fill(0L, Seq("ce", "cl"))
      val tot = binned.agg(sum(col("ce")).as("ne"), sum(col("cl")).as("nl"))
      val perBin = binned.crossJoin(broadcast(tot))
        .withColumn("p", (col("ce") + 1L).cast("double") / (col("ne") + 10L).cast("double"))
        .withColumn("q", (col("cl") + 1L).cast("double") / (col("nl") + 10L).cast("double"))
        .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
      perBin.agg(sum(col("contrib")).as("psi"),
          count(lit(1)).cast("bigint").as("n_bins"))
        .select(col("psi"), col("n_bins"), (col("psi") > 0.1).as("drift_flag"))
    },
    Some(s"""WITH o AS (SELECT o_totalprice AS x,
          o_orderdate < TIMESTAMP '$SplitTs' AS early FROM orders),
      mm AS (SELECT MIN(x) AS lo, MAX(x) AS hi,
          (MAX(x) - MIN(x)) / 10.0 AS width FROM o WHERE early),
      b0 AS (SELECT CAST(GREATEST(LEAST(FLOOR((x - lo) / width), 9), 0) AS BIGINT) AS bin,
          SUM(CASE WHEN early THEN 1 ELSE 0 END) AS ce,
          SUM(CASE WHEN early THEN 0 ELSE 1 END) AS cl
        FROM o CROSS JOIN mm GROUP BY 1),
      b AS (SELECT s.bin, COALESCE(ce, 0) AS ce, COALESCE(cl, 0) AS cl
        FROM (SELECT range AS bin FROM range(10)) s LEFT JOIN b0 ON b0.bin = s.bin),
      t AS (SELECT SUM(ce) AS ne, SUM(cl) AS nl FROM b),
      pb AS (SELECT
          CAST(ce + 1 AS DOUBLE) / CAST(ne + 10 AS DOUBLE) AS p,
          CAST(cl + 1 AS DOUBLE) / CAST(nl + 10 AS DOUBLE) AS q
        FROM b CROSS JOIN t)
      SELECT SUM((p - q) * ln(p / q)) AS psi,
        CAST(COUNT(*) AS BIGINT) AS n_bins,
        SUM((p - q) * ln(p / q)) > 0.1 AS drift_flag
      FROM pb"""),
  )

  // -------------------------------------------------------------- fe02
  /** Leakage-safe TARGET ENCODING — the other feature-engineering
    * staple next to fe01's binning: replace a categorical column with
    * the mean of the target within its category, computed LEAVE-ONE-OUT
    * (each row's own target is excluded) so the encoded feature never
    * carries the row's own label into training — the naive in-fold mean
    * is a classic leakage bug that inflates offline metrics. Both the
    * LOO and the naive encodings are emitted so the leak is measurable
    * per row.
    *
    * 100 TB shape: one hash aggregation to category-level (sum, count)
    * — a handful of rows — broadcast back over the fact in a map-only
    * join; no window, no shuffle beyond the aggregation. Exactness:
    * sums stay DECIMAL, the means are emitted as micro-unit integers
    * ((sum − own)·10^6 div (n − 1) — the qf03/ks01 idiom), with the
    * integral-valued numerator CAST to DECIMAL(38,0)/HUGEINT before
    * the floor-division: DuckDB's // on DECIMAL operands rounds the
    * decimal quotient first (observed +1 ULP vs Spark's truncating
    * div), while on integer operands both engines floor identically. Categories of size 1
    * yield NULL (LOO undefined), not a division error.
    */
  private val fe02 = QueryDef(
    "fe02_target_encode",
    (s, dir) => {
      val f = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(12,2)").as("y"))
      val cat = f.groupBy("o_orderpriority")
        .agg(sum(col("y")).as("cat_sum"), count(lit(1)).as("cat_n"))
      f.join(broadcast(cat), "o_orderpriority")
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("cat_n") > 1,
            expr("CAST((cat_sum - y) * 1000000 AS DECIMAL(38,0)) div (cat_n - 1)")
              .cast("bigint"))
            .as("loo_micro"),
          expr("CAST(cat_sum * 1000000 AS DECIMAL(38,0)) div cat_n")
            .cast("bigint").as("naive_micro"))
        .orderBy("o_orderkey")
    },
    Some("""WITH f AS (SELECT o_orderkey, o_orderpriority,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y_c
        FROM orders),
      cat AS (SELECT o_orderpriority, CAST(SUM(y_c) AS HUGEINT) AS sum_c,
          COUNT(*) AS cat_n
        FROM f GROUP BY 1)
      SELECT o_orderkey, f.o_orderpriority,
        CASE WHEN cat_n > 1
          THEN CAST((sum_c - y_c) * CAST(10000 AS HUGEINT)
            // (cat_n - 1) AS BIGINT)
          END AS loo_micro,
        CAST(sum_c * CAST(10000 AS HUGEINT) // cat_n AS BIGINT) AS naive_micro
      FROM f JOIN cat USING (o_orderpriority)
      ORDER BY o_orderkey"""),
  )

  // -------------------------------------------------------------- dq11
  /** Rolling TIME-SERIES anomaly audit — the volume monitor a pipeline
    * runs on every ingestion day: each day's event count is scored
    * against the trailing-7-day window's sample mean/std (the current
    * day EXCLUDED, so a spike can't mask itself), z = (n − μ)/σ,
    * |z| > 3 flags. Exactness: window sums (Σn, Σn², k) are exact
    * integers assembled by the q51 explode idiom (each day's count
    * serves the 7 FOLLOWING days — one small aggregation, no
    * data-sized window); μ, σ², z are then a fixed chain of
    * correctly-rounded IEEE ops over exact integers (the chi01
    * contract), identical in both engines. Days with fewer than 2
    * prior days in window emit NULL z (score undefined), not a guess.
    */
  private val dq11 = QueryDef(
    "dq11_rolling_anomaly",
    (s, dir) => {
      val daily = Tables(s, dir).events
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      val prior = daily
        .select(explode(sequence(date_add(col("day"), 1), date_add(col("day"), 7)))
          .as("day"), col("n"))
        .groupBy("day").agg(count(lit(1)).as("k"),
          sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"))
      daily.join(prior, Seq("day"), "left")
        .withColumn("k", coalesce(col("k"), lit(0L)))
        .withColumn("z",
          when(col("k") >= 2,
            (col("n").cast("double") - col("s1").cast("double") / col("k")) /
              sqrt((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
                (col("k") * (col("k") - 1)).cast("double"))))
        .select(col("day"), col("n").cast("bigint").as("n"),
          col("k").cast("bigint").as("k_prior"), col("z"),
          (abs(col("z")) > 3.0).as("is_anomaly"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT
          CAST(MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS DATE) AS day,
          COUNT(*) AS n
        FROM events GROUP BY 1),
      prior AS (SELECT d.day + CAST(j AS INTEGER) AS day,
          CAST(COUNT(*) AS HUGEINT) AS k, CAST(SUM(n) AS HUGEINT) AS s1,
          CAST(SUM(n * n) AS HUGEINT) AS s2
        FROM daily d, range(1, 8) r(j) GROUP BY 1)
      SELECT d.day, CAST(d.n AS BIGINT) AS n,
        CAST(COALESCE(p.k, 0) AS BIGINT) AS k_prior,
        CASE WHEN COALESCE(p.k, 0) >= 2 THEN
          (CAST(d.n AS DOUBLE) - CAST(p.s1 AS DOUBLE) / CAST(p.k AS DOUBLE)) /
            sqrt(CAST(p.k * p.s2 - p.s1 * p.s1 AS DOUBLE) /
              CAST(p.k * (p.k - 1) AS DOUBLE)) END AS z,
        CASE WHEN COALESCE(p.k, 0) >= 2 THEN abs(
          (CAST(d.n AS DOUBLE) - CAST(p.s1 AS DOUBLE) / CAST(p.k AS DOUBLE)) /
            sqrt(CAST(p.k * p.s2 - p.s1 * p.s1 AS DOUBLE) /
              CAST(p.k * (p.k - 1) AS DOUBLE))) > 3.0 END AS is_anomaly
      FROM daily d LEFT JOIN prior p ON p.day = d.day
      ORDER BY d.day"""),
  )

  val defs: Seq[QueryDef] = Seq(ks01, chi01, dp01, cal01, fe01, fe02, psi01, dq11)
}
