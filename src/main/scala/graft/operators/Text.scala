package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Text-analysis operators over the `documents` table (north-star
  * LLM-pipeline additions, SURVEY.md §2C): token statistics, quality
  * scoring, language identification, fingerprinting.
  *
  * Everything is built from codegen'd string/array functions — a single
  * narrow scan of (doc_id, text), no UDFs, no shuffle except the final
  * presentation ORDER BY (and the small group-by in the lang-id
  * histogram), so each scales linearly with the corpus.
  */
object Text {

  private val Stop = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"),
  )

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** lowercased whitespace tokens via the custom Tokens expression
    * (same semantics as filter(split(lower(text),'\s+'), _ != '') but
    * one native traversal instead of interpreted lambdas).
    */
  private def toks = graft.functions.TextExpressions.tokens(col("text"))
  private def nStop(c: org.apache.spark.sql.Column, lang: String) =
    graft.functions.TextExpressions.stopword_count(c, Stop(lang))

  // -------------------------------------------------------------- txt01
  private val txt01 = QueryDef(
    "txt01_token_stats",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .select(
          col("doc_id"),
          size(col("toks")).cast("bigint").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("bigint").as("n_distinct"),
          length(col("text")).cast("bigint").as("char_len"),
          // total token length == count of non-whitespace chars: lets
          // the whole computation stay in codegen'd string ops
          (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
            size(col("toks"))).as("avg_token_len"),
          // BPE-ish tokenization estimate: letter runs, digit runs,
          // and punctuation runs count separately (subword-style
          // splitting without a vocab)
          size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]+', 0)"))
            .cast("bigint").as("n_bpeish"))
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, text,
        ${OracleSql.Toks} AS toks
      FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(length(text) AS BIGINT) AS char_len,
        CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks) AS avg_token_len,
        CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS BIGINT) AS n_bpeish
      FROM t ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- txt02
  // Quality scoring: length/punctuation/stopword/repetition signals in
  // [0,1], the standard pre-training corpus filters.
  private val txt02 = QueryDef(
    "txt02_quality_score",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .withColumn("n_tokens", size(col("toks")).cast("bigint"))
        .withColumn("n_stop", nStop(col("toks"), "en"))
        .withColumn("n_punct",
          size(expr("regexp_extract_all(text, '[.,!?;:]', 0)")).cast("bigint"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
        .withColumn("punct_ratio", col("n_punct").cast("double") / length(col("text")).cast("bigint"))
        .withColumn("distinct_ratio",
          size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
        .withColumn("quality",
          least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * col("distinct_ratio"))
        .select("doc_id", "n_tokens", "n_stop", "n_punct",
          "stop_ratio", "punct_ratio", "distinct_ratio", "quality")
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, text,
        ${OracleSql.Toks} AS toks
      FROM documents),
      m AS (SELECT doc_id, text, toks,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN (${sqlList(Stop("en"))}))) AS BIGINT) AS n_stop,
        CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
        CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct
      FROM t)
      SELECT doc_id, n_tokens, n_stop, n_punct,
        CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        CAST(n_punct AS DOUBLE) / CAST(length(text) AS BIGINT) AS punct_ratio,
        n_distinct / n_tokens AS distinct_ratio,
        least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * (n_distinct / n_tokens) AS quality
      FROM m ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- txt03
  // Language ID: stopword-profile argmax with a fixed tie order — the
  // classic cheap n-gram/stopword heuristic, aggregated to a histogram.
  private val txt03 = QueryDef(
    "txt03_lang_id",
    (s, dir) => {
      val langs = Seq("en", "de", "fr", "es")
      val base = Tables(s, dir).documents.withColumn("toks", toks)
      val scored = langs.foldLeft(base)((df, l) =>
        df.withColumn(s"s_$l", nStop(col("toks"), l)))
      scored
        .withColumn("lang_pred",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es") && col("s_en") > 0, "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es") &&
              col("s_de") > 0, "de")
            .when(col("s_fr") >= col("s_es") && col("s_fr") > 0, "fr")
            .when(col("s_es") > 0, "es")
            .otherwise("unknown"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_pred")
    },
    Some(s"""WITH t AS (SELECT doc_id,
        ${OracleSql.Toks} AS toks
      FROM documents),
      sc AS (SELECT doc_id,
        len(list_filter(toks, x -> x IN (${sqlList(Stop("en"))}))) AS s_en,
        len(list_filter(toks, x -> x IN (${sqlList(Stop("de"))}))) AS s_de,
        len(list_filter(toks, x -> x IN (${sqlList(Stop("fr"))}))) AS s_fr,
        len(list_filter(toks, x -> x IN (${sqlList(Stop("es"))}))) AS s_es
      FROM t)
      SELECT CASE
        WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        WHEN s_es > 0 THEN 'es'
        ELSE 'unknown' END AS lang_pred,
        COUNT(*) AS n_docs
      FROM sc GROUP BY 1 ORDER BY lang_pred"""),
  )

  // -------------------------------------------------------------- txt04
  // Document fingerprinting: content hash for exact-dup keys + a
  // prefix fingerprint for fast prefiltering.
  private val txt04 = QueryDef(
    "txt04_fingerprint",
    (s, dir) =>
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("content_md5"),
          md5(substring(col("text"), 1, 64).cast("binary")).as("prefix_md5"),
          length(col("text")).cast("bigint").as("char_len"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(text) AS content_md5,
      md5(substring(text, 1, 64)) AS prefix_md5,
      CAST(length(text) AS BIGINT) AS char_len
      FROM documents ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- txt05
  // Corpus term frequencies: explode (UNNEST) + aggregate — the
  // generator/lateral-view operator over the token arrays; top-50 with
  // a total tie order.
  private val txt05 = QueryDef(
    "txt05_token_freq",
    (s, dir) =>
      Tables(s, dir).documents
        .select(explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), col("token"))
        .limit(50),
    Some(s"""SELECT token, COUNT(*) AS freq FROM (
        SELECT unnest(${OracleSql.Toks}) AS token
        FROM documents)
      GROUP BY token ORDER BY freq DESC, token LIMIT 50"""),
  )

  // -------------------------------------------------------------- txt06
  // TF-IDF: per-document top-3 distinguishing terms. tf and df come
  // from one explode+agg each; the corpus size N joins in as a
  // broadcast scalar (no driver-side count action), and the final
  // per-doc top-3 is a window rank. Scale shape: two token-key
  // aggregations plus one broadcast — no all-pairs, no collect.
  private val txt06 = QueryDef(
    "txt06_tfidf",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val tf = docs.select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(desc("tfidf"), col("token"))
      tf.join(dfreq, "token")
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf").cast("double") *
          log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${OracleSql.Toks}) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      sc AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
          CAST(tf.tf AS DOUBLE) *
            ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS tfidf,
          CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
            ORDER BY CAST(tf.tf AS DOUBLE) *
              ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) DESC,
              tf.token) AS BIGINT) AS rn
        FROM tf JOIN dfreq USING (token), n)
      SELECT doc_id, token, tf, df, tfidf, rn FROM sc
      WHERE rn <= 3 ORDER BY doc_id, rn"""),
  )

  // -------------------------------------------------------------- txt07
  // BPE-style regex pre-tokenization: the GPT-2-family pre-tokenizer
  // splits text into letter runs / digit runs / punctuation runs before
  // BPE merges apply; the pre-token count is the standard proxy for
  // "how many tokens will the tokenizer emit" and chars-per-pre-token
  // is the compression signal curation gates on. The character-class
  // alternation is ASCII-only by design so Java regex (Spark) and RE2
  // (DuckDB) produce identical matches — whitespace is an EXPLICIT
  // char class, not \s, because the engines disagree on \s at the
  // edges (Java includes vertical tab \x0B, RE2 does not);
  // regexp_extract_all is a codegen'd builtin — one scan, no shuffle,
  // no UDF.
  private val PreTokRe = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]+"
  private val txt07 = QueryDef(
    "txt07_pretokenize",
    (s, dir) =>
      Tables(s, dir).documents
        // lit() pattern, not expr(): a SQL string literal would eat the
        // backslash in \s (Spark processes escapes in single quotes)
        .withColumn("pre", regexp_extract_all(lower(col("text")), lit(PreTokRe), lit(0)))
        .withColumn("n_pre_tokens", size(col("pre")).cast("bigint"))
        .filter(col("n_pre_tokens") > 0)
        .withColumn("n_ws_tokens", size(toks).cast("bigint"))
        .withColumn("chars_per_token",
          col("n_chars").cast("double") / col("n_pre_tokens"))
        .select("doc_id", "n_pre_tokens", "n_ws_tokens", "chars_per_token")
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, n_chars,
          CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]+')) AS BIGINT) AS n_pre_tokens,
          CAST(len(${OracleSql.Toks}) AS BIGINT) AS n_ws_tokens
        FROM documents)
      SELECT doc_id, n_pre_tokens, n_ws_tokens,
        CAST(n_chars AS DOUBLE) / n_pre_tokens AS chars_per_token
      FROM t WHERE n_pre_tokens > 0 ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- txt08
  // Vocabulary-growth profile per source: total tokens, distinct types,
  // hapax legomena (frequency-1 types), and type-token ratio — the
  // Heaps/Zipf health check run before tokenizer training (a source
  // whose TTR or hapax share is anomalous is boilerplate-heavy or
  // machine-generated). Two-stage aggregation, (source, token) then
  // source, both map-side combined; the Zipf hapax tail dominates the
  // key count but carries one row each.
  private val txt08 = QueryDef(
    "txt08_vocab_growth",
    (s, dir) => {
      val tf = Tables(s, dir).documents
        .select(col("source"), explode(toks).as("tk"))
        .groupBy("source", "tk").agg(count(lit(1)).as("cnt"))
      tf.groupBy("source")
        .agg(sum(col("cnt")).as("total_tokens"),
          count(lit(1)).as("vocab_size"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"))
        .withColumn("ttr", col("vocab_size").cast("double") / col("total_tokens"))
        .select(col("source"), col("total_tokens"), col("vocab_size"),
          col("hapax").cast("bigint").as("hapax"), col("ttr"))
        .orderBy("source")
    },
    Some(s"""WITH tok AS (SELECT source, unnest(${OracleSql.Toks}) AS tk FROM documents),
      tf AS (SELECT source, tk, COUNT(*) AS cnt FROM tok GROUP BY source, tk)
      SELECT source,
        CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        COUNT(*) AS vocab_size,
        CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS ttr
      FROM tf GROUP BY source ORDER BY source"""),
  )

  // -------------------------------------------------------------- txt09
  /** Bigram-LM surprisal (the CCNet-style perplexity filter with one
    * word of context — qf03 is the unigram twin): a Laplace-smoothed
    * bigram model P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) is self-trained
    * on the corpus, and each document scores the mean surprisal of its
    * ordered bigrams. Bigrams come straight out of the token array (a
    * transform over indices — no positional self-join); surprisals are
    * quantized to integer MILLI-NATS (floor(-ln(p)*1000), the qf03
    * contract) so per-doc sums are order-independent exact BIGINTs.
    *
    * 100 TB shape: the bigram count table is the big intermediate —
    * both its aggregation and the prefix-count join are keyed shuffles
    * (the w1 join inherits natural Zipf skew; AQE's skew-join split
    * handles the "the"-prefix bucket). V and nothing else crosses the
    * driver.
    */
  private val txt09 = QueryDef(
    "txt09_bigram_surprisal",
    (s, dir) => {
      val t = Tables(s, dir).documents.select(col("doc_id"), toks.as("toks"))
      val tok = t.select(col("doc_id"), explode(col("toks")).as("tk"))
      val uni = tok.groupBy("tk").agg(count(lit(1)).as("c1"))
      val voc = uni.agg(count(lit(1)).as("v"))
      val bg = t.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
          .as("bgr"))
      val bgc = bg.groupBy("bgr").agg(count(lit(1)).as("c2"))
        .withColumn("w1", element_at(split(col("bgr"), " "), 1))
      val sur = bgc
        .join(uni.withColumnRenamed("tk", "w1"), "w1")
        .crossJoin(broadcast(voc))
        .withColumn("sur_milli",
          floor(-log((col("c2") + lit(1)).cast("double") /
            (col("c1") + col("v")).cast("double")) * lit(1000.0)).cast("bigint"))
        .select("bgr", "sur_milli")
      bg.join(sur, "bgr")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("sur_milli")).as("sur_sum"))
        .withColumn("mean_surprisal",
          col("sur_sum").cast("double") / (lit(1000.0) * col("n_bigrams")))
        .withColumn("flagged", col("mean_surprisal") > 3.5)
        .select("doc_id", "n_bigrams", "sur_sum", "mean_surprisal", "flagged")
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
      uni AS (SELECT tk, COUNT(*) AS c1 FROM tok GROUP BY tk),
      voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      bg AS (SELECT doc_id,
          unnest(list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])) AS bgr
        FROM t WHERE len(toks) >= 2),
      bgc AS (SELECT bgr, COUNT(*) AS c2 FROM bg GROUP BY bgr),
      sur AS (SELECT bgr,
          CAST(floor(-ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) * 1000.0) AS BIGINT) AS sur_milli
        FROM bgc JOIN uni ON uni.tk = string_split(bgr, ' ')[1] CROSS JOIN voc),
      d AS (SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(sur_milli) AS BIGINT) AS sur_sum
        FROM bg JOIN sur USING (bgr) GROUP BY doc_id)
      SELECT doc_id, n_bigrams, sur_sum,
        CAST(sur_sum AS DOUBLE) / (1000.0 * n_bigrams) AS mean_surprisal,
        CAST(sur_sum AS DOUBLE) / (1000.0 * n_bigrams) > 3.5 AS flagged
      FROM d ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- txt10
  /** BM25 retrieval scoring (k1 = 1.2, b = 0.75) for a fixed query
    * term set — the lexical-retrieval baseline next to txt06's TF-IDF,
    * reusable as a kernel (txt10 runs it as declared; Retrieval.hyb01
    * consumes it as the hybrid fusion's lexical leg). Per-term partial
    * scores are quantized to integer MICRO-units (floor(score * 1e6),
    * the qf03 contract) before the per-document sum, so the cross-term
    * addition is order-independent and exact in both engines; idf/tf
    * normalization is written with the identical operation shape on
    * both sides (same casts, same association). Returns
    * (doc_id, score_micro, rn), rn 1..k.
    *
    * Scale: tf filters to the query terms at the scan (a handful of
    * rows per doc survive), df and the corpus stats are tiny broadcast
    * sides, and the final top-k plans as TakeOrderedAndProject (a
    * frequent query term can match millions of docs, so the global
    * rank must never be a single-partition window; the rank column is
    * assigned over the already-limited k rows).
    */
  private[operators] def bm25TopK(docs: DataFrame, terms: Seq[String],
      k: Int): DataFrame = {
    val t = docs.select(col("doc_id"), toks.as("toks"))
    val dl = t.select(col("doc_id"), size(col("toks")).cast("bigint").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    val tf = t.select(col("doc_id"), explode(col("toks")).as("tk"))
      .filter(col("tk").isin(terms: _*))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("tk").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(dl, "doc_id")
      .join(broadcast(dft), "tk")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("tfn",
        col("tf").cast("double") * lit(2.2) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("score_micro",
        floor(col("idf") * col("tfn") * lit(1000000.0)).cast("bigint"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.groupBy("doc_id").agg(sum(col("score_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .select("doc_id", "score_micro", "rn")
      .orderBy("rn")
  }

  private val txt10 = QueryDef(
    "txt10_bm25",
    (s, dir) =>
      bm25TopK(Tables(s, dir).documents, Seq("table", "scan", "stream"), 20),
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
      stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
      tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
      tf AS (SELECT doc_id, tk, COUNT(*) AS tf FROM tok
        WHERE tk IN ('table', 'scan', 'stream') GROUP BY doc_id, tk),
      dft AS (SELECT tk, COUNT(*) AS df FROM tf GROUP BY tk),
      scored AS (SELECT tf.doc_id,
          CAST(floor(
            ln((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
            (CAST(tf AS DOUBLE) * 2.2 /
              (CAST(tf AS DOUBLE) + 1.2 *
                (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
                  (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) *
            1000000.0) AS BIGINT) AS score_micro
        FROM tf JOIN dl ON dl.doc_id = tf.doc_id
        JOIN dft ON dft.tk = tf.tk CROSS JOIN stats),
      agg AS (SELECT doc_id, CAST(SUM(score_micro) AS BIGINT) AS score_micro
        FROM scored GROUP BY doc_id),
      r AS (SELECT doc_id, score_micro,
          CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rn
        FROM agg)
      SELECT doc_id, score_micro, rn FROM r WHERE rn <= 20 ORDER BY rn"""),
  )

  // -------------------------------------------------------------- txt11
  /** Per-document lexical entropy + type-token ratio — the diversity
    * quality signal (boilerplate and template spam have low token
    * entropy even at high length; cf. rep01 which catches REPEATED
    * text, this catches LOW-VARIETY text). One explode + two hash
    * aggregations, all map-side combinable; linear in corpus size.
    *
    * Determinism: H = log2(n) - Σ c·log2(c) / n. The Σ term is summed
    * in ASCENDING TOKEN ORDER in both engines (list_sum over a sorted
    * list / aggregate over sort_array) so the floating accumulation
    * order is pinned, then rounded to 6 decimals.
    */
  private val txt11 = QueryDef(
    "txt11_token_entropy",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), explode(toks).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          // pin accumulation order: per-type terms sorted by token
          sort_array(collect_list(struct(col("w"), col("c")))).as("terms"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(expr("log2(n_tokens) - aggregate(terms, 0.0D, " +
            "(acc, t) -> acc + t.c * log2(t.c)) / n_tokens"), 6)
            .as("entropy"),
          round(col("n_types").cast("double") / col("n_tokens"), 6)
            .as("ttr"))
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, unnest(${OracleSql.Toks}) AS w
        FROM documents),
      f AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w),
      a AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_types,
          list_sum(list_transform(list(c ORDER BY w), x -> x * log2(x))) AS plogp
        FROM f GROUP BY doc_id)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_types AS BIGINT) AS n_types,
        ROUND(log2(n_tokens) - plogp / n_tokens, 6) AS entropy,
        ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr
      FROM a ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- txt12
  /** Flesch-style readability scoring — the classic per-document
    * complexity signal next to txt02's quality score: sentences from
    * terminal-punctuation runs, syllables approximated as vowel-group
    * runs per word (the standard heuristic when no dictionary ships
    * with the pipeline). All three counts are codegen'd regex counts
    * (map-only, no shuffle beyond the presentation sort); the score
    * arithmetic is a fixed literal-order IEEE expression, identical in
    * both engines, rounded to 6 decimals. Simple regex classes only
    * ([.!?]+, [aeiouy]+) so Java regex and DuckDB's RE2 agree — the
    * txt07 lesson: fancy escapes diverge, character classes don't.
    */
  private val txt12 = QueryDef(
    "txt12_readability",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"),
          size(col("toks")).cast("bigint").as("n_words"),
          greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
            .cast("bigint").as("n_sentences"),
          greatest(size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")), lit(1))
            .cast("bigint").as("n_syllables"))
        .withColumn("flesch",
          round(lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")), 6))
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, text, ${OracleSql.Toks} AS toks
        FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
        CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT) AS n_syllables,
        ROUND(206.835
          - 1.015 * (CAST(len(toks) AS DOUBLE) / GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1))
          - 84.6 * (CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS DOUBLE) / len(toks)),
          6) AS flesch
      FROM t WHERE len(toks) > 0 ORDER BY doc_id"""),
  )

  // --------------------------------------------------------------- ii01
  /** Inverted-index build: the posting-list table a retrieval system
    * (and txt10's BM25 scoring) reads — one row per frequent term with
    * document frequency, total term frequency, and the HEAD of the
    * doc-id posting list (first 16 ids ascending, comma-joined so the
    * output stays scalar-typed for the oracle hash). Terms below the
    * df floor are dropped (the Zipf hapax tail is index noise).
    *
    * 100 TB shape: one (doc, token) aggregation and one token
    * aggregation, both map-side combinable and sharing the token
    * shuffle key; the posting-list head is built with the sorted-fold
    * idiom (sort_array before slice) so it is deterministic under any
    * partitioning. Full posting lists at scale would be written
    * per-term-bucket rather than concat'd — the head column is the
    * audit surface, the (token, doc, tf) table IS the index.
    */
  private val ii01 = QueryDef(
    "ii01_inverted_index",
    (s, dir) => {
      val tf = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      tf.groupBy("token")
        .agg(count(lit(1)).as("df"),
          sum(col("tf")).as("total_tf"),
          concat_ws(",", slice(sort_array(collect_list(col("doc_id"))), 1, 16))
            .as("postings_head"))
        .filter(col("df") >= 50)
        .select(col("token"), col("df").cast("bigint").as("df"),
          col("total_tf").cast("bigint").as("total_tf"), col("postings_head"))
        .orderBy("token")
    },
    Some(s"""WITH tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM (
          SELECT doc_id, unnest(${OracleSql.Toks}) AS token FROM documents)
        GROUP BY token, doc_id)
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
        CAST(SUM(tf) AS BIGINT) AS total_tf,
        array_to_string(list_sort(list(doc_id))[1:16], ',') AS postings_head
      FROM tf GROUP BY token HAVING COUNT(*) >= 50 ORDER BY token"""),
  )

  // Shared by Retrieval's hyb01: the hybrid fusion's lexical leg must
  // be txt10's exact ranking, so its oracle extends txt10's CTE chain.
  private[operators] def bm25Oracle: Option[String] = txt10.oracle

  val defs: Seq[QueryDef] = Seq(txt01, txt02, txt03, txt04, txt05, txt06, txt07,
    txt08, txt09, txt10, txt11, txt12, ii01)
}
