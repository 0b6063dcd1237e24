package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Data-quality audit operators (SURVEY.md §2C extensions): the checks
  * a 100 TB pipeline runs before and after every load — referential
  * integrity between related tables, per-column completeness /
  * cardinality profiles, and per-document quality filtering (rule-based
  * Gopher signals and a hashed-feature linear classifier). Everything
  * is keyed joins, aggregations, or pure per-row projections; nothing
  * is collected to the driver.
  */
object Quality {

  private def toks = graft.functions.TextExpressions.tokens(col("text"))

  // -------------------------------------------------------------- dq01
  // Referential integrity: documents and embeddings are releases of the
  // same corpus keyed by id — count rows on each side, ids missing from
  // the other side (left-anti both directions), and id duplicates. One
  // row of audit results; each leg is a keyed join or aggregation.
  private val dq01 = QueryDef(
    "dq01_referential_integrity",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id").as("id"))
      val embs = Tables(s, dir).embeddings.select(col("vec_id").as("id"))
      val missingEmb = docs.join(embs, Seq("id"), "left_anti")
        .agg(count(lit(1)).as("docs_without_embedding"))
      val orphanEmb = embs.join(docs, Seq("id"), "left_anti")
        .agg(count(lit(1)).as("embeddings_without_doc"))
      val dupDocs = docs.groupBy("id").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).agg(count(lit(1)).as("duplicate_doc_ids"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(embs.agg(count(lit(1)).as("n_embeddings")))
        .crossJoin(missingEmb)
        .crossJoin(orphanEmb)
        .crossJoin(dupDocs)
    },
    Some("""SELECT
        (SELECT COUNT(*) FROM documents) AS n_docs,
        (SELECT COUNT(*) FROM embeddings) AS n_embeddings,
        (SELECT COUNT(*) FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))
          AS docs_without_embedding,
        (SELECT COUNT(*) FROM embeddings e
          WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
          AS embeddings_without_doc,
        (SELECT COUNT(*) FROM (SELECT doc_id FROM documents
          GROUP BY doc_id HAVING COUNT(*) > 1)) AS duplicate_doc_ids"""),
  )

  // -------------------------------------------------------------- dq02
  // Column completeness/cardinality profile over orders: one row per
  // audited column with null count and exact distinct count. Each
  // column's distinct count is its own two-level aggregation (distinct
  // then count — never a multi-distinct Expand), unioned into the
  // profile table; all passes read the same narrow scan.
  private val dq02 = QueryDef(
    "dq02_column_profile",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
      cols.map { c =>
        o.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"))
          .crossJoin(o.select(c).distinct().agg(count(lit(1)).as("n_distinct")))
          .select(lit(c).as("column_name"), col("n_rows"),
            col("n_null").cast("bigint").as("n_null"), col("n_distinct"))
      }.reduce(_.unionByName(_)).orderBy("column_name")
    },
    Some("""WITH p AS (
        SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders)) AS n_distinct
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
          CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderstatus FROM orders))
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*),
          CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderpriority FROM orders))
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', COUNT(*),
          CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderdate FROM orders))
        FROM orders)
      SELECT column_name, n_rows, n_null, n_distinct FROM p ORDER BY column_name"""),
  )

  /** One-pass approximate column profile — the 100 TB companion to
    * dq02: dq02's exact distinct counts deliberately run one
    * distinct-aggregation per audited column (2 scans per column — fine
    * for a handful of columns, documented there), which at 100 TB is 2N
    * scans. This variant computes EVERY column's null count and
    * HyperLogLog++ distinct estimate in ONE aggregation over ONE scan
    * (adding a column adds two agg expressions, not a scan), then
    * explodes the single agg row into the per-column profile. `rsd` is
    * the HLL relative standard deviation (default 5% — the standard
    * accuracy/sketch-size dial); n_rows/n_null stay exact. Spec asserts
    * the single-pass shape (job count) and the estimate's error bound
    * against dq02's exact counts.
    */
  def approxProfile(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
      rsd: Double = 0.05): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "approxProfile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"approxProfile column list has duplicates: $cols")
    require(!cols.contains("n_rows"),
      "approxProfile reserves the alias 'n_rows'; rename the column first")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
        approx_count_distinct(col(c), rsd).as(s"_nd_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column_name"), col("n_rows"),
          col(s"_null_$c").cast("bigint").as("n_null"),
          col(s"_nd_$c").as("approx_distinct"))
      }: _*)).as("r"))
      .select(col("r.*"))
      .orderBy("column_name")
  }

  // -------------------------------------------------------------- qf01
  // Gopher-style rule filter (Rae et al. 2021 §A1.1 shape, adapted to
  // the synthetic corpus): per-document word count, exact mean word
  // length (integer sums divided once), stopword hits, and the pass
  // flag a curation pipeline gates on. Pure per-row projection over one
  // scan — no shuffle except the presentation sort; at 100 TB this is
  // a map-only pass that fuses into whatever reads the corpus next.
  // Mean is the ONLY double (single division of two exact integers), so
  // the oracle hash-matches bit-for-bit.
  private val GopherStop = Seq("the", "a", "and", "of", "to", "in", "is")
  private val qf01 = QueryDef(
    "qf01_gopher_rules",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) > 0)
        .withColumn("n_words", size(col("toks")).cast("bigint"))
        .withColumn("sum_len",
          expr("aggregate(toks, 0L, (a, t) -> a + length(t))"))
        .withColumn("mean_word_len",
          col("sum_len").cast("double") / col("n_words"))
        .withColumn("max_word_len",
          expr("array_max(transform(toks, t -> length(t)))").cast("bigint"))
        .withColumn("n_stop",
          graft.functions.TextExpressions.stopword_count(col("toks"), GopherStop).cast("bigint"))
        .withColumn("passes",
          col("n_words") >= 40 && col("n_words") <= 100000 &&
            col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
            col("n_stop") >= 2)
        .select("doc_id", "n_words", "mean_word_len", "max_word_len", "n_stop", "passes")
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      m AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) AS sum_len,
          CAST(list_max(list_transform(toks, t -> len(t))) AS BIGINT) AS max_word_len,
          CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS BIGINT) AS n_stop
        FROM t WHERE len(toks) > 0)
      SELECT doc_id, n_words,
        CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
        max_word_len, n_stop,
        (n_words >= 40 AND n_words <= 100000
          AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
          AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
          AND n_stop >= 2) AS passes
      FROM m ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- qf05
  /** Gopher repetition signals (Rae et al. 2021 §A1.2) — the
    * within-document repetition signals rep01's bigram histogram does
    * NOT cover: the duplicate-TOKEN fraction (vocabulary collapse) and
    * the longest CONSECUTIVE same-token run (the "word word word"
    * stutter n-gram histograms wash out because they count unordered
    * multiplicity, not adjacency). Complements rep01 (per-doc bigram
    * repetition), dd11 (cross-doc dup spans) and bp01 (cross-doc
    * boilerplate); line/paragraph signals are omitted because the
    * synthetic corpus is single-line.
    *
    * Scale shape: ENTIRELY map-only — both signals are per-row
    * expressions fused into the scan (max_run is one linear
    * `aggregate` fold over the token array, no explode, no shuffle
    * but the presentation sort). All counts exact integers; the one
    * fraction is a single IEEE division, hash-identical cross-engine.
    */
  private val qf05 = QueryDef(
    "qf05_repetition_signals",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"),
          size(col("toks")).cast("bigint").as("n_toks"),
          (size(col("toks")) - size(array_distinct(col("toks"))))
            .cast("bigint").as("dup_tok_excess"),
          expr("""aggregate(toks,
              named_struct('run', 0, 'best', 0, 'prev', CAST(NULL AS STRING)),
              (s, t) -> named_struct(
                'run', CASE WHEN s.prev IS NOT NULL AND t = s.prev
                  THEN s.run + 1 ELSE 1 END,
                'best', GREATEST(s.best,
                  CASE WHEN s.prev IS NOT NULL AND t = s.prev
                    THEN s.run + 1 ELSE 1 END),
                'prev', t),
              s -> s.best)""").cast("bigint").as("max_run"))
        .withColumn("dup_tok_frac",
          col("dup_tok_excess").cast("double") / col("n_toks"))
        .withColumn("flagged",
          col("dup_tok_frac") > 0.6 || col("max_run") >= 3)
        .select("doc_id", "n_toks", "dup_tok_excess", "dup_tok_frac",
          "max_run", "flagged")
        .orderBy("doc_id"),
    // the oracle computes max_run via the classic gaps-and-islands
    // window (position minus per-token rank is constant within a run)
    // — an INDEPENDENT derivation of the same quantity, not a replay
    // of the fold
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 1),
      u AS (SELECT doc_id, unnest(toks) AS w,
          generate_subscripts(toks, 1) AS i FROM f),
      p AS (SELECT doc_id, w, i,
          i - ROW_NUMBER() OVER (PARTITION BY doc_id, w ORDER BY i) AS isl
        FROM u),
      runs AS (SELECT doc_id, COUNT(*) AS run FROM p GROUP BY doc_id, w, isl),
      mx AS (SELECT doc_id, MAX(run) AS max_run FROM runs GROUP BY doc_id)
      SELECT f.doc_id,
        CAST(len(toks) AS BIGINT) AS n_toks,
        CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS dup_tok_excess,
        CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_tok_frac,
        CAST(max_run AS BIGINT) AS max_run,
        (CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.6
          OR max_run >= 3) AS flagged
      FROM f JOIN mx ON mx.doc_id = f.doc_id
      ORDER BY f.doc_id"""),
  )

  // -------------------------------------------------------------- qf02
  // Hashed-feature linear quality classifier — the fasttext-style
  // scorer (hash token → bucket, sum bucket weights, threshold) that
  // pipelines run to keep "high-quality-looking" documents. Weights
  // are a deterministic function of the bucket (Knuth multiplicative
  // hash onto [-2048, 2048]) so the model ships as ARITHMETIC, not a
  // lookup table: scoring is one codegen'd fold per row — no join, no
  // broadcast, no shuffle — and the integer score is exact, making the
  // whole model inference oracle-checkable. Swapping real trained
  // weights for the synthetic ones means broadcasting a 1024-entry
  // array; the plan shape is unchanged.
  /** The qf02 scorer as a reusable Spark expression over a `toks`
    * array column (exact integer score; see qf02's doc comment). The
    * calibration audit (Drift.cal01) re-scores with the SAME kernel so
    * the two stay in lockstep.
    */
  private[operators] val ClassifierScoreExpr: String =
    """aggregate(toks, 0L, (a, t) ->
      a + ((cast(conv(substr(md5(cast(concat('w:', t) as binary)), 1, 8), 16, 10) as bigint) % 1024)
           * 2654435761L) % 4097 - 2048)"""

  /** DuckDB twin of [[ClassifierScoreExpr]] over a `toks` list. */
  private[operators] val ClassifierScoreSql: String =
    """CAST(list_sum(list_transform(toks, t ->
      ((('0x' || substr(md5('w:' || t), 1, 8))::BIGINT % 1024) * 2654435761) % 4097 - 2048))
      AS BIGINT)"""

  private val qf02 = QueryDef(
    "qf02_classifier_score",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) > 0)
        .withColumn("n_words", size(col("toks")).cast("bigint"))
        .withColumn("score_int", expr(ClassifierScoreExpr))
        .withColumn("score",
          col("score_int").cast("double") / (lit(4096.0) * col("n_words")))
        .withColumn("accept", col("score") > 0.0)
        .select("doc_id", "n_words", "score_int", "score", "accept")
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      m AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          $ClassifierScoreSql AS score_int
        FROM t WHERE len(toks) > 0)
      SELECT doc_id, n_words, score_int,
        CAST(score_int AS DOUBLE) / (4096.0 * n_words) AS score,
        CAST(score_int AS DOUBLE) / (4096.0 * n_words) > 0.0 AS accept
      FROM m ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- qf03
  // Perplexity-proxy filtering (the CCNet recipe with the KenLM swapped
  // for a self-trained unigram model): token surprisal -ln(count/total)
  // is QUANTIZED to integer milli-nats per token, so the per-document
  // sum is exact integer arithmetic — deterministic under any partition
  // count or aggregation order (a raw double sum over a groupBy is
  // order-dependent and would never hash-match at 100 TB). Shape: one
  // token-keyed frequency aggregation, the corpus-total scalar
  // broadcast (txt06 pattern), one token-keyed join back, one doc-keyed
  // aggregation — all map-side-combined, no collect.
  private val qf03 = QueryDef(
    "qf03_unigram_surprisal",
    (s, dir) => {
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks).as("tk"))
      val freq = tok.groupBy("tk").agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum(col("cnt")).as("total"))
      val sur = freq.crossJoin(broadcast(total))
        .withColumn("sur_milli",
          floor(-log(col("cnt").cast("double") / col("total").cast("double"))
            * lit(1000.0)).cast("bigint"))
        .select("tk", "sur_milli")
      tok.join(sur, "tk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("sur_milli")).as("sur_sum"))
        .withColumn("mean_surprisal",
          col("sur_sum").cast("double") / (lit(1000.0) * col("n_tokens")))
        .withColumn("flagged", col("mean_surprisal") > 7.0)
        .select("doc_id", "n_tokens", "sur_sum", "mean_surprisal", "flagged")
        .orderBy("doc_id")
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${OracleSql.Toks}) AS tk FROM documents),
      freq AS (SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY tk),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
      sur AS (SELECT tk,
          CAST(floor(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) * 1000.0) AS BIGINT) AS sur_milli
        FROM freq, tot),
      d AS (SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(sur_milli) AS BIGINT) AS sur_sum
        FROM tok JOIN sur USING (tk) GROUP BY doc_id)
      SELECT doc_id, n_tokens, sur_sum,
        CAST(sur_sum AS DOUBLE) / (1000.0 * n_tokens) AS mean_surprisal,
        CAST(sur_sum AS DOUBLE) / (1000.0 * n_tokens) > 7.0 AS flagged
      FROM d ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- dq03
  // Declarative expectation suite (the great-expectations pattern): a
  // fixed set of data-contract rules — domain membership, bounds, key
  // uniqueness, freshness — each reporting rows checked / rows failed /
  // verdict. Two rules fail on this data by design (the suite must
  // demonstrate failure attribution, not rubber-stamp).
  //
  // 100 TB shape: ONE aggregation pass per table computes every rule's
  // failure count simultaneously (rules are when()-sums inside a single
  // agg — adding a rule adds a column, not a scan); the per-rule rows
  // are exploded from the single agg row. The only distinct aggregate
  // (key uniqueness) shares the same pass.
  private val dq03 = QueryDef(
    "dq03_expectation_suite",
    (s, dir) => {
      val t = Tables(s, dir)
      def fails(pred: org.apache.spark.sql.Column) =
        sum(when(pred, 0L).otherwise(1L))
      val o = t.orders.agg(
        count(lit(1)).as("n"),
        fails(col("o_totalprice") > 0).as("f1"),
        fails(col("o_orderstatus").isin("O", "F", "P")).as("f2"),
        fails(col("o_orderdate") < lit("2000-01-01").cast("timestamp")).as("f4"),
        countDistinct(col("o_orderkey")).as("nd"))
      val l = t.lineitem.agg(
        count(lit(1)).as("n"),
        fails(col("l_quantity") <= 45).as("f5"),
        fails(col("l_discount").between(0, 0.1)).as("f6"))
      def rules(agg: org.apache.spark.sql.DataFrame,
          rs: Seq[(String, org.apache.spark.sql.Column)]) =
        agg.select(explode(array(rs.map { case (name, f) =>
          struct(lit(name).as("rule_name"), col("n").as("n_checked"),
            f.cast("bigint").as("n_failed"))
        }: _*)).as("r")).select(col("r.*"))
      rules(o, Seq(
        "orders.totalprice_positive" -> col("f1"),
        "orders.status_in_domain" -> col("f2"),
        "orders.orderkey_unique" -> (col("n") - col("nd")),
        "orders.date_before_2000" -> col("f4")))
        .unionByName(rules(l, Seq(
          "lineitem.quantity_le_45" -> col("f5"),
          "lineitem.discount_in_range" -> col("f6"))))
        .withColumn("passed", col("n_failed") === 0L)
        .orderBy("rule_name")
    },
    Some("""WITH o AS (SELECT COUNT(*) AS n,
          CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS f1,
          CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS BIGINT) AS f2,
          CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '2000-01-01' THEN 0 ELSE 1 END) AS BIGINT) AS f4,
          COUNT(DISTINCT o_orderkey) AS nd
        FROM orders),
      l AS (SELECT COUNT(*) AS n,
          CAST(SUM(CASE WHEN l_quantity <= 45 THEN 0 ELSE 1 END) AS BIGINT) AS f5,
          CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS f6
        FROM lineitem),
      r AS (
        SELECT 'orders.totalprice_positive' AS rule_name, n AS n_checked, f1 AS n_failed FROM o
        UNION ALL SELECT 'orders.status_in_domain', n, f2 FROM o
        UNION ALL SELECT 'orders.orderkey_unique', n, n - nd FROM o
        UNION ALL SELECT 'orders.date_before_2000', n, f4 FROM o
        UNION ALL SELECT 'lineitem.quantity_le_45', n, f5 FROM l
        UNION ALL SELECT 'lineitem.discount_in_range', n, f6 FROM l)
      SELECT rule_name, n_checked, n_failed, n_failed = 0 AS passed
      FROM r ORDER BY rule_name"""),
  )

  // -------------------------------------------------------------- dq04
  /** Robust per-group outlier detection: median / MAD (median absolute
    * deviation) per event type, and the count of values beyond
    * 3 × MAD — the robust z-score data-quality check that, unlike
    * mean/stddev, a few extreme rows can't drag. Three keyed
    * aggregation passes over the same narrow scan (median → MAD →
    * outlier count); the per-group statistics are tiny and broadcast
    * back, so no pass shuffles more than (group, value) pairs. Exact
    * interpolated percentiles (the q44 precedent) keep both engines
    * bit-identical.
    */
  private val dq04 = QueryDef(
    "dq04_outlier_mad",
    (s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
          max(col("med")).as("med"))
      ev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
      med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM e GROUP BY 1),
      mad AS (SELECT e.event_type,
          quantile_cont(abs(e.value - med.med), 0.5) AS mad, MAX(med.med) AS med
        FROM e JOIN med USING (event_type) GROUP BY 1)
      SELECT e.event_type, COUNT(*) AS n, MAX(mad.med) AS med, MAX(mad.mad) AS mad,
        CAST(SUM(CASE WHEN abs(e.value - mad.med) > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM e JOIN mad USING (event_type)
      GROUP BY e.event_type ORDER BY e.event_type"""),
  )

  // -------------------------------------------------------------- dq05
  /** K-anonymity audit: group sizes over a quasi-identifier tuple
    * (nation, market segment, account-balance band) with an at-risk
    * flag for groups below k=5 — the re-identification check a
    * governance pipeline runs before releasing a derived dataset.
    * One hash aggregation (map-side combined) over the QI projection;
    * the flag is a pure post-agg expression.
    */
  private val dq05 = QueryDef(
    "dq05_k_anonymity",
    (s, dir) =>
      Tables(s, dir).customer
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000.0).cast("bigint").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", col("n") < 5)
        .orderBy("c_nationkey", "c_mktsegment", "bal_band"),
    Some("""SELECT c_nationkey, c_mktsegment,
        CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
        COUNT(*) AS n, COUNT(*) < 5 AS at_risk
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, bal_band
      ORDER BY c_nationkey, c_mktsegment, bal_band"""),
  )

  // -------------------------------------------------------------- dq06
  /** L-diversity audit — dq05's companion: a k-anonymous group is
    * still re-identifiable when every member shares the same SENSITIVE
    * value, so governance checks distinct-sensitive-value counts per
    * quasi-identifier group (here: order priority as the sensitive
    * attribute within (nation, mktsegment) QI groups, via the
    * customer⋈orders join). One shuffle on the join key, one hash
    * aggregation; the diversity flag is a post-agg expression.
    */
  private val dq06 = QueryDef(
    "dq06_l_diversity",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(t.orders,
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderpriority")).as("l_diversity"))
        .withColumn("at_risk", col("l_diversity") < 3)
        .orderBy("c_nationkey", "c_mktsegment")
    },
    Some("""SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_diversity,
        COUNT(DISTINCT o_orderpriority) < 3 AS at_risk
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_nationkey, c_mktsegment
      ORDER BY c_nationkey, c_mktsegment"""),
  )

  // -------------------------------------------------------------- imp01
  /** Group-mean imputation — the standard missing-value repair step of
    * a cleaning pipeline: rows whose measure is missing (deterministic
    * stand-in: l_orderkey ≡ 0 mod 97, since the synthetic tables carry
    * no real NULLs) receive their group's exact-decimal mean computed
    * over the NON-missing rows. Scale shape: one map-side-combined
    * aggregation producing a group-count-sized mean table, broadcast
    * back over the fact — no fact-side shuffle at all.
    *
    * Determinism: the mean is decimal-sum / count (one IEEE division,
    * identical in both engines — Relational.davg's contract); imputed
    * values are that raw double, never re-rounded.
    */
  private val imp01 = QueryDef(
    "imp01_group_impute",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .withColumn("was_missing", col("l_orderkey") % 97 === 0)
      val means = li.filter(!col("was_missing"))
        .groupBy(col("l_returnflag").as("g"))
        .agg((sum(col("l_discount").cast("decimal(4,2)")).cast("double") /
          count(lit(1))).as("g_mean"))
      li.join(broadcast(means), col("l_returnflag") === col("g"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("was_missing"),
          when(col("was_missing"), col("g_mean"))
            .otherwise(col("l_discount").cast("double")).as("disc_imputed"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""WITH b AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_discount,
          (l_orderkey % 97 = 0) AS was_missing FROM lineitem),
      m AS (SELECT l_returnflag,
          CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS g_mean
        FROM b WHERE NOT was_missing GROUP BY l_returnflag)
      SELECT l_orderkey, l_linenumber, b.l_returnflag, was_missing,
        CASE WHEN was_missing THEN g_mean
             ELSE CAST(l_discount AS DOUBLE) END AS disc_imputed
      FROM b JOIN m USING (l_returnflag)
      ORDER BY l_orderkey, l_linenumber"""),
  )

  // -------------------------------------------------------------- qf04
  /** DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): documents are scored
    * by the log importance ratio of a TARGET-domain language model to
    * the RAW-corpus model, then resampled proportionally to the
    * weight. Here the target is the English slice (lang='en' — the
    * stand-in for "looks like my eval domain"), both models are
    * Laplace-smoothed unigram LMs over the shared corpus vocabulary
    * (qf03's machinery, twice), and the resampling is DETERMINISTIC
    * Gumbel-top-k: key = logw + (-ln(-ln(u))) with u an md5-derived
    * uniform — the standard trick that turns weighted sampling without
    * replacement into a reproducible top-k, exactly what a production
    * run needs for task-retry stability.
    *
    * Determinism: both models' token counts come from ONE conditional
    * aggregation pass; the per-token log ratio is quantized to integer
    * MILLI-NATS once (a single float subtract + floor, identical in
    * both engines), so per-doc sums are exact BIGINTs; the Gumbel key
    * adds two IEEE ops to the exact-derived logw. 100 TB shape: token
    * explode → one keyed count aggregation (map-side combined) →
    * broadcast totals → per-doc sum → global top-k as
    * TakeOrderedAndProject (per-partition local top-50, driver merge
    * of 50·P rows — never a full-corpus rank window). Nothing
    * iterative, nothing collected.
    */
  private val qf04 = QueryDef(
    "qf04_dsir_select",
    (s, dir) => {
      val t = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), toks.as("toks"))
      val tok = t.select(col("doc_id"), (col("lang") === "en").as("is_tgt"),
        explode(col("toks")).as("tk"))
      // one pass: per-token raw count + target count
      val counts = tok.groupBy("tk").agg(
        count(lit(1)).as("cr"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"))
      val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"),
        count(lit(1)).as("v"))
      val ratio = counts.crossJoin(broadcast(totals))
        .withColumn("lr_milli",
          floor((log((col("ct") + lit(1)).cast("double") / (col("nt") + col("v"))) -
            log((col("cr") + lit(1)).cast("double") / (col("nr") + col("v"))))
            * lit(1000.0)).cast("bigint"))
        .select("tk", "lr_milli")
      val scored = tok.join(ratio, "tk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("lr_milli")).as("lr_sum"))
        .withColumn("log_weight", col("lr_sum").cast("double") / 1000.0)
      // u strictly inside (0,1): the +0.5 offset keeps ln(-ln(u)) finite
      // — a doc whose md5 prefix is 000000 (one per ~17M docs) would
      // otherwise make u = 0, which DuckDB's ln() rejects outright and
      // Spark maps to NULL (silently un-selecting the doc)
      val u = (conv(substring(md5(concat(lit("dsir:"), col("doc_id").cast("string"))
        .cast("binary")), 1, 6), 16, 10).cast("bigint") + lit(0.5)) / lit(16777216.0)
      import org.apache.spark.sql.expressions.Window
      // Global top-50 via orderBy+limit (TakeOrderedAndProject: each
      // partition keeps its local top-50, the driver merges 50·P rows)
      // — NOT a row_number window over the full corpus, which would
      // move every scored doc to one partition. The rank window then
      // runs over the already-limited 50 rows only.
      val top = scored
        .withColumn("gumbel_key", col("log_weight") - log(-log(u)))
        .orderBy(col("gumbel_key").desc, col("doc_id"))
        .limit(50)
      top
        .withColumn("rank", row_number().over(
          Window.orderBy(col("gumbel_key").desc, col("doc_id"))).cast("bigint"))
        .select("doc_id", "n_tokens", "lr_sum", "log_weight", "gumbel_key", "rank")
        .orderBy("rank")
    },
    Some(s"""WITH t AS (SELECT doc_id, lang, ${OracleSql.Toks} AS toks FROM documents),
      tok AS (SELECT doc_id, lang = 'en' AS is_tgt, unnest(toks) AS tk FROM t),
      counts AS (SELECT tk, COUNT(*) AS cr,
          SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct
        FROM tok GROUP BY tk),
      totals AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt, COUNT(*) AS v FROM counts),
      ratio AS (SELECT tk,
          CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / (nt + v)) -
            ln(CAST(cr + 1 AS DOUBLE) / (nr + v))) * 1000.0) AS BIGINT) AS lr_milli
        FROM counts CROSS JOIN totals),
      scored AS (SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(lr_milli) AS BIGINT) AS lr_sum
        FROM tok JOIN ratio USING (tk) GROUP BY doc_id),
      keyed AS (SELECT doc_id, n_tokens, lr_sum,
          CAST(lr_sum AS DOUBLE) / 1000.0 AS log_weight,
          CAST(lr_sum AS DOUBLE) / 1000.0 - ln(-ln(
            (('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 0.5) / 16777216.0))
            AS gumbel_key
        FROM scored),
      r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id) AS BIGINT) AS rank
        FROM keyed)
      SELECT doc_id, n_tokens, lr_sum, log_weight, gumbel_key, rank
      FROM r WHERE rank <= 50 ORDER BY rank"""),
  )

  // -------------------------------------------------------------- dq08
  /** Data-freshness audit over the event stream: per event type, the
    * event count, newest event time, and the lag behind the stream's
    * global high-water mark — the landing-health check a pipeline
    * dashboard alerts on (a type whose lag exceeds the staleness bound
    * has stopped flowing). One map-side-combined aggregation to
    * |event types| rows; the global max broadcasts back over that tiny
    * table. Lag arithmetic is exact nanosecond integers (ts_ns).
    */
  private val dq08 = QueryDef(
    "dq08_freshness",
    (s, dir) => {
      val perType = Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), max(col("ts_ns")).as("last_ns"))
      val hwm = perType.agg(max(col("last_ns")).as("hwm_ns"))
      perType.crossJoin(broadcast(hwm))
        .select(col("event_type"), col("n_events"),
          (col("hwm_ns") - col("last_ns")).as("lag_ns"))
        .withColumn("stale", col("lag_ns") > lit(3600L * 1000000000L))
        .orderBy("event_type")
    },
    Some("""WITH pt AS (SELECT event_type, COUNT(*) AS n_events,
          MAX(epoch_ns(ts)) AS last_ns
        FROM events GROUP BY event_type),
      hwm AS (SELECT MAX(last_ns) AS hwm_ns FROM pt)
      SELECT event_type, n_events, hwm_ns - last_ns AS lag_ns,
        hwm_ns - last_ns > 3600000000000 AS stale
      FROM pt CROSS JOIN hwm ORDER BY event_type"""),
  )

  // -------------------------------------------------------------- dq09
  /** Benford's-law first-digit audit — the fraud/anomaly screen
    * auditors run on monetary columns: naturally-occurring amounts
    * follow P(d) = log10(1 + 1/d), and a column whose leading-digit
    * distribution deviates hard from that curve was likely generated,
    * capped, or tampered with. Per digit: exact count, observed
    * fraction, the Benford expectation, absolute deviation, and the
    * screening flag.
    *
    * Determinism: the leading digit comes from the INTEGER rendering
    * (substr of the floored value's decimal string — identical in both
    * engines; float log10 of the value is NOT reliably identical at
    * exact powers of ten, so it is never used); expected fractions are
    * ln(1+1/d)/ln(10) on digit literals (both engines' ln agrees
    * bit-for-bit on this corpus — the txt06 precedent); observed is
    * one n/total division. Scale: one map-side digit projection, one
    * 9-group aggregation, a broadcast 1-row total — no sort, no
    * collect. (The synthetic uniform-ish prices genuinely FAIL Benford
    * — the audit's flag fires, which is the point of auditing
    * generated data.)
    */
  private val dq09 = QueryDef(
    "dq09_benford",
    (s, dir) => {
      val d = Tables(s, dir).orders.select(
        substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .as("digit"))
        .filter(col("digit").between("1", "9"))
      val tot = d.agg(count(lit(1)).as("total"))
      d.groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .withColumn("observed", col("n").cast("double") / col("total"))
        .withColumn("expected",
          log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
        .withColumn("abs_dev", abs(col("observed") - col("expected")))
        .withColumn("suspicious", col("abs_dev") > lit(0.05))
        .select("digit", "n", "observed", "expected", "abs_dev", "suspicious")
        .orderBy("digit")
    },
    Some("""WITH d AS (SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
        FROM orders
        WHERE substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) BETWEEN '1' AND '9'),
      g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      t AS (SELECT COUNT(*) AS total FROM d)
      SELECT digit, n, CAST(n AS DOUBLE) / total AS observed,
        ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS expected,
        abs(CAST(n AS DOUBLE) / total - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)) AS abs_dev,
        abs(CAST(n AS DOUBLE) / total - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)) > 0.05 AS suspicious
      FROM g CROSS JOIN t ORDER BY digit"""),
  )

  // -------------------------------------------------------------- dq10
  /** Cross-table FINANCIAL RECONCILIATION — the warehouse audit that a
    * row-level expectation suite (dq03) and referential check (dq01)
    * both miss: does the denormalized header total equal the rollup of
    * its detail lines? Every order's o_totalprice is compared against
    * Σ l_extendedprice·(1−l_discount) of its lineitems, each order
    * lands in one verdict bucket (orphan_no_lines / reconciled /
    * overstated / understated), and the report carries the exact
    * micro-unit delta mass per bucket. On the synthetic data NOTHING
    * reconciles and 257 orders have no lines at sf0.01 — a report that
    * genuinely fires, like dq03's failing rules.
    *
    * 100 TB shape: one hash aggregation of the fact to order grain,
    * one join on the order key (both sides key-partitioned — co-
    * partitioned tables make it shuffle-free), one 4-row aggregate
    * out. Exactness: money stays DECIMAL end to end; deltas are exact
    * 4-dp decimals summed as micro-unit integers.
    */
  private val dq10 = QueryDef(
    "dq10_reconciliation",
    (s, dir) => {
      val t = Tables(s, dir)
      val roll = t.lineitem.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)"))).as("rollup"))
      t.orders
        .select(col("o_orderkey"), col("o_totalprice").cast("decimal(12,2)").as("tp"))
        .join(roll, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("delta", col("tp") - col("rollup"))
        .withColumn("verdict",
          when(col("rollup").isNull, "orphan_no_lines")
            .when(abs(col("delta")) < 0.01, "reconciled")
            .when(col("delta") > 0, "overstated")
            .otherwise("understated"))
        .groupBy("verdict")
        .agg(count(lit(1)).as("n_orders"),
          coalesce(sum(expr("CAST(delta * 1000000 AS DECIMAL(38,0))")), lit(0L))
            .cast("bigint").as("delta_micro"))
        .orderBy("verdict")
    },
    Some("""WITH roll AS (SELECT l_orderkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rollup
        FROM lineitem GROUP BY 1),
      j AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS tp, rollup,
          CAST(o_totalprice AS DECIMAL(12,2)) - rollup AS delta
        FROM orders LEFT JOIN roll ON l_orderkey = o_orderkey),
      v AS (SELECT *,
          CASE WHEN rollup IS NULL THEN 'orphan_no_lines'
               WHEN ABS(delta) < 0.01 THEN 'reconciled'
               WHEN delta > 0 THEN 'overstated'
               ELSE 'understated' END AS verdict
        FROM j)
      SELECT verdict, COUNT(*) AS n_orders,
        CAST(COALESCE(SUM(CAST(delta * 1000000 AS DECIMAL(38,0))), 0) AS BIGINT)
          AS delta_micro
      FROM v GROUP BY verdict ORDER BY verdict"""),
  )

  // -------------------------------------------------------------- dq12
  /** Calendar COVERAGE GAPS — the continuity audit dq08's freshness
    * check doesn't make: between the first and last order date, which
    * whole days have NO data at all, reported as contiguous gap
    * islands (the gaps-and-islands pattern: island key = day − rank).
    * A silent upstream outage shows up here as a multi-day island
    * long before a freshness alarm would fire on the current day.
    *
    * 100 TB shape: the fact collapses to DISTINCT active days first
    * (one map-side-combined aggregation), the calendar spine comes
    * from one 1-row min/max aggregate exploded driver-free, and the
    * gap set is calendar-bounded (≤ span days, ~2.4k here) — so the
    * global rank window runs over the tiny MISSING-day set, never
    * anything data-sized. Six genuine gap days exist in the synthetic
    * order history.
    */
  private val dq12 = QueryDef(
    "dq12_coverage_gaps",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val active = o.select(to_date(col("o_orderdate")).as("day")).distinct()
      val spine = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
          max(to_date(col("o_orderdate"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val missing = spine.join(active, Seq("day"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      missing.withColumn("rk", row_number().over(w))
        .withColumn("grp", expr("date_sub(day, rk)"))
        .groupBy("grp")
        .agg(min(col("day")).as("gap_start"), max(col("day")).as("gap_end"),
          count(lit(1)).cast("bigint").as("n_days"))
        .select("gap_start", "gap_end", "n_days")
        .orderBy("gap_start")
    },
    Some("""WITH span AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
          MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      all_days AS (SELECT CAST(unnest(generate_series(lo::TIMESTAMP,
          hi::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day FROM span),
      active AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders),
      missing AS (SELECT day FROM all_days
        WHERE day NOT IN (SELECT day FROM active)),
      g AS (SELECT day,
          day - CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS grp
        FROM missing)
      SELECT MIN(day) AS gap_start, MAX(day) AS gap_end,
        CAST(COUNT(*) AS BIGINT) AS n_days
      FROM g GROUP BY grp ORDER BY gap_start"""),
  )

  // -------------------------------------------------------------- dq07
  /** T-closeness audit (Li et al. 2007) — the third leg of the
    * governance triple after dq05 (k-anonymity) and dq06 (l-diversity):
    * an l-diverse group still leaks when its SENSITIVE-value
    * distribution diverges from the table's. For an ORDERED sensitive
    * attribute (order-value band = floor(o_totalprice/50000)) the
    * distance is the Earth Mover's Distance, which over ordered bins is
    * the mean absolute difference of the two CDFs.
    *
    * Determinism: ALL arithmetic is exact integer. The EMD numerator
    * sum_b |cum_gb*n - cum_b*n_g| is exact in DECIMAL(38,0) (HUGEINT on
    * the oracle — DuckDB's DECIMAL(38,0)*BIGINT would widen past 38
    * digits and fall back to inexact DOUBLE products, which is exactly
    * how the round-6 version diverged in the last bit); the reported
    * `t_emd_micro` is (10^6 · numerator) div (n_g·n·(bins−1)) — an
    * integer division with no IEEE step anywhere, so both engines hash
    * identical BIGINTs (the qf03/ks01 scaled-integer idiom).
    *
    * Scale shape: one map-side-combined aggregation over the join
    * produces the (group × band) counts; the dense group×band grid, the
    * CDFs and the EMD all live on sketch-sized tables (|groups|·|bands|
    * rows), windows included. Nothing downstream of the first agg ever
    * touches the fact again.
    */
  /** Generic t-closeness over `assigned` rows carrying the
    * quasi-identifier columns `groupCols` plus an ordered BIGINT
    * `band` (the binned sensitive attribute). See dq07 for semantics
    * and the determinism/scale contract.
    */
  def tCloseness(assigned: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], threshold: Double = 0.2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gCols = groupCols.map(col)
    val gb = assigned.groupBy(gCols :+ col("band"): _*)
      .agg(count(lit(1)).as("n_gb"))
    val groups = gb.groupBy(gCols: _*).agg(sum(col("n_gb")).as("n_g"))
    val bands = gb.groupBy("band").agg(sum(col("n_gb")).as("n_b"))
    val totals = bands.agg(sum(col("n_b")).as("n"), count(lit(1)).as("n_bins"))
    val wg = Window.partitionBy(gCols: _*).orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = groups.crossJoin(broadcast(
        bands.withColumn("cum_b", sum(col("n_b")).over(wb))))
      .join(broadcast(gb), groupCols :+ "band", "left")
      .na.fill(0L, Seq("n_gb"))
      .withColumn("cum_gb", sum(col("n_gb")).over(wg))
    // overflow guard: cum*n products reach n_g*n ≈ 1e19 at
    // multi-billion-row corpora, past Long.MaxValue — the EMD numerator
    // stays exact in DECIMAL(38,0), and the ×10^6 scaling (+7 digits)
    // still fits: a 10^12-row corpus puts the scaled numerator near
    // 10^12·10^12·10^6 = 10^30 < 10^38
    grid.crossJoin(broadcast(totals))
      .groupBy(gCols: _*)
      .agg(max(col("n_g")).as("n"),
        sum(abs(col("cum_gb").cast("decimal(38,0)") * col("n") -
            col("cum_b").cast("decimal(38,0)") * col("n_g"))).as("emd_num"),
        (max(col("n_g")).cast("decimal(38,0)") * max(col("n")) *
          (max(col("n_bins")) - lit(1L))).as("emd_den"))
      .withColumn("t_emd_micro",
        expr("CAST((emd_num * CAST(1000000 AS DECIMAL(38,0))) div emd_den AS BIGINT)"))
      .withColumn("at_risk", col("t_emd_micro") > lit(math.round(threshold * 1e6)))
      .select(gCols ++ Seq(col("n"), col("t_emd_micro"), col("at_risk")): _*)
      .orderBy(gCols: _*)
  }

  private val dq07 = QueryDef(
    "dq07_t_closeness",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("o_totalprice") / 50000.0).cast("bigint").as("band"))
      tCloseness(base, Seq("c_nationkey", "c_mktsegment"))
    },
    Some("""WITH base AS (SELECT c_nationkey, c_mktsegment,
          CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS band
        FROM customer JOIN orders ON c_custkey = o_custkey),
      gb AS (SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS n_gb
        FROM base GROUP BY 1, 2, 3),
      groups_ AS (SELECT c_nationkey, c_mktsegment, SUM(n_gb) AS n_g
        FROM gb GROUP BY 1, 2),
      bands AS (SELECT band, SUM(n_gb) AS n_b,
          SUM(SUM(n_gb)) OVER (ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
        FROM gb GROUP BY band),
      totals AS (SELECT SUM(n_b) AS n, COUNT(*) AS n_bins FROM bands),
      grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.band, b.cum_b,
          SUM(COALESCE(x.n_gb, 0)) OVER (PARTITION BY g.c_nationkey, g.c_mktsegment
            ORDER BY b.band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_gb
        FROM groups_ g CROSS JOIN bands b
        LEFT JOIN gb x ON x.c_nationkey = g.c_nationkey
          AND x.c_mktsegment = g.c_mktsegment AND x.band = b.band),
      emd AS (SELECT grid.c_nationkey, grid.c_mktsegment,
          CAST(MAX(n_g) AS BIGINT) AS n,
          CAST((SUM(abs(CAST(cum_gb AS HUGEINT) * CAST(totals.n AS HUGEINT)
              - CAST(cum_b AS HUGEINT) * CAST(n_g AS HUGEINT)))
              * CAST(1000000 AS HUGEINT))
            // (CAST(MAX(n_g) AS HUGEINT) * CAST(MAX(totals.n) AS HUGEINT)
               * CAST(MAX(totals.n_bins) - 1 AS HUGEINT))
            AS BIGINT) AS t_emd_micro
        FROM grid CROSS JOIN totals
        GROUP BY grid.c_nationkey, grid.c_mktsegment)
      SELECT c_nationkey, c_mktsegment, n, t_emd_micro,
        t_emd_micro > 200000 AS at_risk
      FROM emd ORDER BY c_nationkey, c_mktsegment"""),
  )

  // -------------------------------------------------------------- gov01
  /** Right-to-be-forgotten cascade audit: a deterministic forget set
    * (user_id ≡ 0 mod 37) is erased from the events fact AND from a
    * derived per-type aggregate rebuilt over the clean fact; the audit
    * row per table reports rows before/after and — the compliance
    * proof — the RESIDUE count of forgotten keys still reachable,
    * which must be 0. Erasure is one broadcast anti-join per table
    * (the forget set is user-count bounded, never fact-sized); the
    * derived table is REBUILT from the clean fact rather than patched,
    * the only cascade that is provably residue-free.
    *
    * The oracle's erasure is NOT EXISTS, not NOT IN: a NULL-keyed fact
    * row survives a left_anti join (NULL never equals a forget key)
    * and NOT EXISTS matches that, while NOT IN would evaluate to NULL
    * and silently drop the row — a latent cross-engine divergence the
    * moment the data carries NULL user_ids.
    */
  private val gov01 = QueryDef(
    "gov01_forget_cascade",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val forget = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 37 === 0)
      val clean = ev.join(broadcast(forget), Seq("user_id"), "left_anti")
      val residue = clean.join(broadcast(forget), Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("residue"))
      val evRow = ev.agg(count(lit(1)).as("rows_before"))
        .crossJoin(clean.agg(count(lit(1)).as("rows_after")))
        .crossJoin(residue)
        .select(lit("events").as("table_name"), col("rows_before"),
          col("rows_after"), col("residue"))
      def daily(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type").agg(count(lit(1)).as("n"))
      val aggRow = daily(ev).agg(count(lit(1)).as("rows_before"))
        .crossJoin(daily(clean).agg(count(lit(1)).as("rows_after")))
        .crossJoin(residue.select(col("residue")))
        .select(lit("events_by_type").as("table_name"), col("rows_before"),
          col("rows_after"), col("residue"))
      evRow.unionByName(aggRow).orderBy("table_name")
    },
    Some("""WITH forget AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0),
      clean AS (SELECT * FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id))
      SELECT 'events' AS table_name,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS rows_before,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM clean) AS rows_after,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM clean
          WHERE user_id IN (SELECT user_id FROM forget)) AS residue
      UNION ALL
      SELECT 'events_by_type',
        (SELECT COUNT(*) FROM (SELECT event_type FROM events GROUP BY 1)),
        (SELECT COUNT(*) FROM (SELECT event_type FROM clean GROUP BY 1)),
        (SELECT COUNT(*) FROM clean WHERE user_id IN (SELECT user_id FROM forget))
      ORDER BY table_name"""),
  )

  // -------------------------------------------------------------- dq13
  /** Candidate-key discovery — the uniqueness audit behind "can we
    * MERGE on this?": for each declared key candidate, exact row and
    * distinct counts, whether it is a key, and how many groups carry
    * duplicates. Includes (l_orderkey, l_linenumber), which LOOKS like
    * the TPC-H lineitem primary key but is NOT unique in the synthetic
    * data (the repo-wide gotcha every join author here must know) —
    * this row documents that fact as an oracle-pinned artifact.
    *
    * 100 TB shape: one groupBy per candidate over only the candidate's
    * columns (column-pruned scans), counts reduced map-side; the
    * per-candidate distributions never leave the executors — each
    * candidate contributes ONE output row. Candidate count is the
    * declared audit list (bounded), not a powerset search.
    */
  private val dq13 = QueryDef(
    "dq13_candidate_keys",
    (s, dir) => {
      val t = Tables(s, dir)
      def audit(label: String, df: org.apache.spark.sql.DataFrame,
          cols: Seq[String]) =
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_distinct"),
            sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("dup_groups"))
          .select(lit(label).as("candidate"),
            col("n_rows").cast("bigint").as("n_rows"), col("n_distinct"),
            (col("n_rows") === col("n_distinct")).as("is_key"),
            col("dup_groups").cast("bigint").as("dup_groups"))
      audit("orders.o_orderkey", t.orders, Seq("o_orderkey"))
        .unionByName(audit("orders.o_custkey", t.orders, Seq("o_custkey")))
        .unionByName(audit("orders.o_custkey+o_orderdate", t.orders,
          Seq("o_custkey", "o_orderdate")))
        .unionByName(audit("lineitem.l_orderkey+l_linenumber", t.lineitem,
          Seq("l_orderkey", "l_linenumber")))
        .unionByName(audit("lineitem.l_orderkey+l_linenumber+l_partkey",
          t.lineitem, Seq("l_orderkey", "l_linenumber", "l_partkey")))
        .orderBy("candidate")
    },
    Some("""WITH a AS (
        SELECT 'orders.o_orderkey' AS candidate, COUNT(*) AS n_rows,
          COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
        UNION ALL
        SELECT 'orders.o_custkey', COUNT(*), COUNT(DISTINCT o_custkey) FROM orders
        UNION ALL
        SELECT 'orders.o_custkey+o_orderdate', COUNT(*),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey, o_orderdate FROM orders))
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_orderkey+l_linenumber', COUNT(*),
          (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_orderkey+l_linenumber+l_partkey', COUNT(*),
          (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey FROM lineitem))
        FROM lineitem),
      d AS (
        SELECT 'orders.o_orderkey' AS candidate, CAST(COUNT(*) AS BIGINT) AS dup_groups
        FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'orders.o_custkey', COUNT(*)
        FROM (SELECT o_custkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'orders.o_custkey+o_orderdate', COUNT(*)
        FROM (SELECT o_custkey, o_orderdate FROM orders GROUP BY 1, 2 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'lineitem.l_orderkey+l_linenumber', COUNT(*)
        FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'lineitem.l_orderkey+l_linenumber+l_partkey', COUNT(*)
        FROM (SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
          GROUP BY 1, 2, 3 HAVING COUNT(*) > 1))
      SELECT a.candidate, a.n_rows, a.n_distinct,
        a.n_rows = a.n_distinct AS is_key, d.dup_groups
      FROM a JOIN d USING (candidate) ORDER BY candidate"""),
  )

  val defs: Seq[QueryDef] = Seq(dq01, dq02, dq03, dq04, dq05, dq06, dq07, dq08, dq09, dq10, dq12, dq13, imp01, qf04,
    qf01, qf02, qf03, qf05, gov01)
}
