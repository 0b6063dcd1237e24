package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Corpus-curation operators for large-scale training-data pipelines
  * (SURVEY.md §2C extensions — the reference has no corpus tooling):
  * benchmark decontamination, repetition metrics, deterministic
  * sampling, token chunking, and PII-style redaction.
  *
  * All are oracle-checked against DuckDB, which constrains every
  * computation to bit-deterministic forms (md5-based hashing instead of
  * seeded RNG, exact integer arithmetic before any double cast, total
  * ORDER BY — see operators/Relational.scala header).
  *
  * Scale shapes (the 100 TB story for each):
  *  - dc01: the benchmark/eval side of a decontamination join is small
  *    by construction (eval suites are thousands of documents, the
  *    corpus is billions) — it is broadcast, so the corpus-side shingle
  *    explode streams through a map-side hash join with ZERO shuffle of
  *    corpus data; only the per-doc hit aggregation shuffles (by
  *    doc_id, after heavy map-side combine).
  *  - rep01: two-stage aggregation (doc_id, bigram) → doc_id; both
  *    stages get map-side partial aggregation, and the second groupBy
  *    reuses the first's hash partitioning on the doc_id prefix.
  *  - smp01: a pure filter on a hash of the row key — no shuffle, no
  *    RNG state, reproducible across retries/re-partitions (Bernoulli
  *    sampling via `rand()` is NOT stable under task retry).
  *  - smp02: exact per-stratum top-N needs one shuffle by stratum;
  *    row_number + filter lets Spark's WindowGroupLimit push the limit
  *    below the sort (partial top-N per map task) — at extreme stratum
  *    skew, salt the stratum and re-rank the per-salt winners.
  *  - chk01: linear explode, output rows ≈ n_tokens/stride per doc; no
  *    shuffle except the presentation sort.
  *  - pii01: per-row regex projection, no shuffle.
  */
object Corpus {

  /** Same lowercase-whitespace tokenization as Text/Dedup (custom
    * codegen'd expression; DuckDB twin is
    * list_filter(string_split_regex(lower(text),'\s+'), x -> x <> '')).
    */
  private def toks = graft.functions.TextExpressions.tokens(col("text"))

  /** DuckDB CTE producing the shared token list (fragment hoisted to
    * [[OracleSql]] so every tokenizing oracle shares ONE copy).
    */
  private val TokCte =
    s"""WITH t AS (SELECT doc_id, lang, text, ${OracleSql.Toks} AS toks
      FROM documents)"""

  private val ShinglesSql = OracleSql.Shingles3

  // -------------------------------------------------------------- dc01
  /** Benchmark decontamination: flag corpus documents sharing ≥3
    * distinct word 3-shingles with any "benchmark" document (held-out
    * set = doc_id ≡ 0 mod 97 — a deterministic stand-in for an eval
    * suite). This is the standard n-gram-overlap decontamination pass a
    * pre-training pipeline runs before the corpus ships.
    */
  /** (doc_id, sh) exploded distinct 3-shingles of every document. */
  private def explodedShingles(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir).documents
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.word_shingles(col("text"), 3)).as("sh"))

  /** Shared tail of dc01/dc02: exact-verify shingle hits against the
    * broadcast benchmark side and aggregate per corpus document.
    */
  private def contaminationAgg(corpus: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame) =
    corpus.join(broadcast(bench), "sh")
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_shared"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared") >= 3)
      .orderBy("doc_id")

  private val dc01 = QueryDef(
    "dc01_decontaminate",
    (s, dir) => {
      val sh = explodedShingles(s, dir)
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .select(col("sh"), col("doc_id").as("bench_id"))
      contaminationAgg(sh.filter(col("doc_id") % 97 =!= 0), bench)
    },
    Some(s"""$TokCte,
      g AS (SELECT doc_id, $ShinglesSql AS shingles FROM t),
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      b AS (SELECT doc_id AS bench_id, sh FROM e WHERE doc_id % 97 = 0),
      c AS (SELECT doc_id, sh FROM e WHERE doc_id % 97 <> 0)
      SELECT c.doc_id,
        CAST(COUNT(DISTINCT c.sh) AS BIGINT) AS n_shared,
        CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
      FROM c JOIN b USING (sh)
      GROUP BY c.doc_id HAVING COUNT(DISTINCT c.sh) >= 3
      ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- dc02
  /** dc01 with a bloom-filter pre-pass (the runtime-filter idiom, and
    * the shape that wins at 100 TB): a bloom of the benchmark shingles
    * — kilobytes, shipped inside the task closure — filters the
    * corpus-side shingle stream BEFORE the join, so only probable hits
    * reach the broadcast-join verify. No false negatives, and the
    * exact join removes the bloom's false positives, so the output is
    * byte-identical to dc01 (same oracle — CorpusSpec also pins the
    * equality).
    */
  private val dc02 = QueryDef(
    "dc02_bloom_decontaminate",
    (s, dir) => {
      val sh = explodedShingles(s, dir)
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .select(col("sh"), col("doc_id").as("bench_id"))
      // sized to the benchmark side (eval suites are small); 100k at 1%
      // fpp ≈ 120 KB in the task closure — size UP with the eval set,
      // not the corpus
      val bloom = bench.stat.bloomFilter("sh", 100000L, 0.01)
      val corpus = sh.filter(col("doc_id") % 97 =!= 0)
        .filter(graft.functions.TextExpressions.bloom_might_contain(col("sh"), bloom))
      contaminationAgg(corpus, bench)
    },
    dc01.oracle,
  )

  // -------------------------------------------------------------- rep01
  /** Gopher-style repetition metrics: per-document bigram counts, the
    * most frequent bigram's multiplicity, and the repeated-bigram
    * ratio. High rep_ratio marks boilerplate/spam for quality filters.
    */
  private val rep01 = QueryDef(
    "rep01_repetition",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
            .as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).cast("bigint").as("n_bigrams"),
          count(lit(1)).cast("bigint").as("n_distinct"),
          max(col("c")).cast("bigint").as("top_freq"))
        .withColumn("rep_ratio",
          lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"))
        .orderBy("doc_id"),
    Some(s"""$TokCte,
      f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
      bg AS (SELECT doc_id,
        unnest(list_transform(range(len(toks) - 1), i -> toks[i + 1] || ' ' || toks[i + 2])) AS bg
      FROM f),
      c AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2)
      SELECT doc_id,
        CAST(SUM(c) AS BIGINT) AS n_bigrams,
        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        CAST(MAX(c) AS BIGINT) AS top_freq,
        CAST(1 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE) / SUM(c) AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- smp01
  /** Deterministic language-stratified Bernoulli sample: keep a row iff
    * the first md5 byte of a salted row key clears a per-language
    * threshold (en ≈ 10%, others ≈ 30% — downsample the dominant
    * language, as corpus balancing does). Hash-threshold sampling is
    * reproducible under task retry and across engines, unlike rand().
    */
  private val smp01 = QueryDef(
    "smp01_hash_sample",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("hx",
          substring(md5(concat(lit("smp1:"), col("doc_id").cast("string")).cast("binary")), 1, 2))
        .filter(when(col("lang") === "en", col("hx") < "1a").otherwise(col("hx") < "4d"))
        .select(col("doc_id"), col("lang"), col("hx"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, substring(md5('smp1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS hx
      FROM documents
      WHERE CASE WHEN lang = 'en'
        THEN substring(md5('smp1:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        ELSE substring(md5('smp1:' || CAST(doc_id AS VARCHAR)), 1, 2) < '4d' END
      ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- smp02
  /** Exact fixed-size stratified sample: the 20 hash-smallest documents
    * per language (deterministic "random" order via salted md5;
    * doc_id tie-break makes the rank total).
    */
  private val smp02 = QueryDef(
    "smp02_stratified_topn",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("smp2:"), col("doc_id").cast("string")).cast("binary")),
          col("doc_id"))
      Tables(s, dir).documents
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("lang"), col("rn"))
        .orderBy("lang", "rn")
    },
    Some("""SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY md5('smp2:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        FROM documents)
      WHERE rn <= 20 ORDER BY lang, rn"""),
  )

  // -------------------------------------------------------------- chk01
  /** Token chunking for training windows: 64-token chunks on a
    * 48-token stride (16-token overlap), each fingerprinted with md5 so
    * chunk-level dedup can run downstream (see mm03 for byte chunks).
    */
  private val chk01 = QueryDef(
    "chk01_token_chunks",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("toks", toks)
        .filter(size(col("toks")) > 0)
        .withColumn("start", explode(expr("sequence(0, size(toks) - 1, 48)")))
        .withColumn("chunk", expr("slice(toks, start + 1, 64)"))
        .select(col("doc_id"),
          (col("start") / lit(48)).cast("bigint").as("chunk_idx"),
          size(col("chunk")).cast("bigint").as("n_chunk_tokens"),
          md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
    Some(s"""$TokCte,
      f AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
      st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM f)
      SELECT doc_id,
        CAST(start // 48 AS BIGINT) AS chunk_idx,
        CAST(len(toks[start + 1:start + 64]) AS BIGINT) AS n_chunk_tokens,
        md5(array_to_string(toks[start + 1:start + 64], ' ')) AS chunk_md5
      FROM st ORDER BY doc_id, chunk_idx"""),
  )

  // -------------------------------------------------------------- mix01
  /** Corpus mixing: per-language replication weights (en ×1, every
    * other language ×2 — upsample the minority strata, the standard
    * data-mixing step before training). Pure map-side explode — a
    * weight change never shuffles the corpus; `copy` indexes the
    * replica so a downstream epoch shuffle can hash (doc_id, copy).
    */
  private val mix01 = QueryDef(
    "mix01_language_mix",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          explode(expr("sequence(1, CASE WHEN lang = 'en' THEN 1 ELSE 2 END)")).as("copy"))
        .select(col("doc_id"), col("lang"), col("copy").cast("bigint").as("copy"))
        .orderBy("doc_id", "copy"),
    Some("""SELECT doc_id, lang,
        CAST(unnest(generate_series(1, CASE WHEN lang = 'en' THEN 1 ELSE 2 END)) AS BIGINT) AS copy
      FROM documents ORDER BY doc_id, copy"""),
  )

  // -------------------------------------------------------------- pii01
  /** PII-style redaction: mask every digit run in a free-text field
    * (customer names carry numeric ids) and count the masked spans per
    * row — the shape of an email/phone/SSN scrub pass, with the
    * pattern kept to syntax both regex engines (Java, RE2) agree on.
    */
  private val pii01 = QueryDef(
    "pii01_redact",
    (s, dir) =>
      Tables(s, dir).customer
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("redacted"),
          size(expr("regexp_extract_all(c_name, '[0-9]+', 0)")).cast("bigint").as("n_redacted"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
        regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS redacted,
        CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_redacted
      FROM customer ORDER BY c_custkey"""),
  )

  // -------------------------------------------------------------- pii02
  /** Deterministic keyed pseudonymization — the governance op pii01's
    * redaction can't provide: direct identifiers are replaced by a
    * peppered-hash surrogate (md5(pepper || key)) CONSISTENTLY across
    * tables, so analytic joins still line up while the raw key never
    * appears downstream. The query proves referential consistency by
    * joining customer and orders ON THE PSEUDONYM and reproducing the
    * per-customer order stats a raw-key join gives (which is exactly
    * what the oracle computes, pseudonymizing independently in DuckDB).
    *
    * Scale shape: pseudonymization is a map-only projection on each
    * side (no extra shuffle — the join exchange hashes the surrogate
    * instead of the key, same distribution since md5 is injective on
    * the key domain here); the pepper rotates per release in a real
    * deployment, which re-keys every surrogate without touching data
    * layout. GDPR-style "pseudonymisation": re-identification requires
    * the pepper, which lives outside the dataset.
    */
  private val pii02 = QueryDef(
    "pii02_pseudonymize",
    (s, dir) => {
      val pepper = "graft-pepper-2026"
      val t = Tables(s, dir)
      val cust = t.customer.select(
        md5(concat(lit(pepper), col("c_custkey").cast("string"))).as("pid"),
        col("c_mktsegment"))
      val ords = t.orders.select(
        md5(concat(lit(pepper), col("o_custkey").cast("string"))).as("pid"),
        col("o_totalprice"))
      cust.join(ords, "pid")
        .groupBy("pid", "c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_spent"))
        .orderBy("pid")
    },
    Some("""SELECT md5('graft-pepper-2026' || CAST(c_custkey AS VARCHAR)) AS pid,
        c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2 ORDER BY pid"""),
  )

  // -------------------------------------------------------------- pii03
  /** Checksum-GATED redaction — the practice that separates a PII scrub
    * from pii01's blanket regex: a 16-digit string is only a payment
    * card if its Luhn check digit verifies, so the scrubber masks
    * exactly the validating candidates and leaves random numeric ids
    * alone (blanket masking destroys join keys and analytics for no
    * privacy gain). Candidate numbers are synthesized deterministically
    * from c_custkey — 15 payload digits plus a check digit that is
    * CORRECT for even keys and off-by-5 for odd keys — so exactly half
    * the corpus validates, and both engines rebuild identical
    * candidates from the same integer arithmetic.
    *
    * The Luhn fold (ISO/IEC 7812: right-to-left, double every second
    * digit, subtract 9 above 9, total ≡ 0 mod 10) runs as ONE
    * sequence-aggregate expression per row — map-only, codegen'd, no
    * UDF; the oracle replays it with list_sum over the same positions.
    * Valid cards mask to their last 4 digits (the PCI display rule);
    * invalid candidates pass through untouched.
    */
  private val pii03 = QueryDef(
    "pii03_luhn_redact",
    (s, dir) => {
      // payload: 15 digits from a fixed multiplicative scramble of the key
      val payload = lpad((col("c_custkey") * 7919L % 1000000000000000L)
        .cast("string"), 15, "0")
      // Luhn sum of the 15 payload digits, rightmost payload digit
      // doubled (it sits immediately left of the check digit): position
      // i (1-based from the LEFT of the 15) doubles when i is odd
      // (15,13,... from the right). Fold ascending — integer adds.
      def luhnPayloadSum(c: String) = expr(
        s"""aggregate(sequence(1, 15), 0, (acc, i) -> acc + (
           CASE WHEN i % 2 = 1 THEN
             CASE WHEN 2 * CAST(substring($c, i, 1) AS INT) > 9
                  THEN 2 * CAST(substring($c, i, 1) AS INT) - 9
                  ELSE 2 * CAST(substring($c, i, 1) AS INT) END
           ELSE CAST(substring($c, i, 1) AS INT) END))""")
      val t = Tables(s, dir)
      val withCard = t.customer
        .select(col("c_custkey"), payload.as("pay"))
        .withColumn("psum", luhnPayloadSum("pay"))
        .withColumn("check_ok", (lit(10) - col("psum") % 10) % 10)
        .withColumn("check", when(col("c_custkey") % 2 === 0, col("check_ok"))
          .otherwise((col("check_ok") + 5) % 10))
        .withColumn("card", concat(col("pay"), col("check").cast("string")))
      withCard
        .withColumn("luhn_valid", (col("psum") + col("check")) % 10 === 0)
        .select(col("c_custkey"),
          when(col("luhn_valid"),
            concat(lit("************"), substring(col("card"), 13, 4)))
            .otherwise(col("card")).as("masked"),
          col("luhn_valid"))
        .orderBy("c_custkey")
    },
    Some("""WITH cand AS (SELECT c_custkey,
          lpad(CAST(c_custkey * 7919 % 1000000000000000 AS VARCHAR), 15, '0') AS pay
        FROM customer),
      summed AS (SELECT c_custkey, pay,
          CAST(list_sum(list_transform(range(1, 16), i ->
            CASE WHEN i % 2 = 1 THEN
              CASE WHEN 2 * CAST(substring(pay, i, 1) AS INT) > 9
                   THEN 2 * CAST(substring(pay, i, 1) AS INT) - 9
                   ELSE 2 * CAST(substring(pay, i, 1) AS INT) END
            ELSE CAST(substring(pay, i, 1) AS INT) END)) AS INT) AS psum
        FROM cand),
      carded AS (SELECT c_custkey, pay, psum,
          CASE WHEN c_custkey % 2 = 0 THEN (10 - psum % 10) % 10
               ELSE ((10 - psum % 10) % 10 + 5) % 10 END AS chk
        FROM summed)
      SELECT c_custkey,
        CASE WHEN (psum + chk) % 10 = 0
             THEN '************' || substring(pay || CAST(chk AS VARCHAR), 13, 4)
             ELSE pay || CAST(chk AS VARCHAR) END AS masked,
        (psum + chk) % 10 = 0 AS luhn_valid
      FROM carded ORDER BY c_custkey"""),
  )

  // -------------------------------------------------------------- pack01
  /** Sequence packing for LM training: documents are concatenated in
    * doc_id order and split into fixed 2048-token sequences; each doc
    * reports the sequence it starts in and its offset there (the
    * concat-and-split packing standard pre-training uses).
    *
    * 100 TB shape: a naive global running sum is a single-partition
    * window — a scale killer. This uses the HIERARCHICAL prefix sum:
    * within-shard cumulative sums run in parallel (window partitioned
    * by shard), shard totals (one row per shard — tiny) get a
    * shard-level prefix scan, and global offset = shard base +
    * within-shard cumsum. Identical arithmetic to the flat cumsum the
    * oracle computes, with no global sort of the corpus.
    */
  private val pack01 = QueryDef(
    "pack01_sequence_pack",
    (s, dir) => {
      val B = 2048L
      val n = Tables(s, dir).documents
        .select(col("doc_id"), size(toks).cast("bigint").as("n_tokens"))
        .withColumn("shard", expr("doc_id div 1000"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      val withCum = n.withColumn("cum_in", sum(col("n_tokens")).over(wIn))
      val bases = Sharded.prefixSumBases(
        n.groupBy(col("shard")).agg(sum(col("n_tokens")).as("tot")),
        "shard", Seq("tot" -> "base"))
      withCum.join(broadcast(bases), "shard")
        .withColumn("start", col("base") + col("cum_in") - col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          expr(s"start div $B").as("seq_id"),
          (col("start") % B).as("seq_offset"))
        .orderBy("doc_id")
    },
    Some(s"""$TokCte,
      n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
      c AS (SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        FROM n)
      SELECT doc_id, n_tokens,
        (cum - n_tokens) // 2048 AS seq_id,
        (cum - n_tokens) % 2048 AS seq_offset
      FROM c ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- vcb01
  /** Min-count vocabulary + per-document OOV rate: tokens occurring
    * >= 5 times corpus-wide form the vocabulary; each document reports
    * how much of it falls outside (the tokenizer-coverage check run
    * before training).
    *
    * 100 TB shape: the vocab build is one token-keyed aggregation with
    * map-side combine (Zipf tail hapaxes dominate the key count but
    * each carries one row); the join back is token-keyed too, so both
    * shuffles share partitioning. The vocab is NOT assumed
    * driver-small — no broadcast, no collect.
    */
  private val vcb01 = QueryDef(
    "vcb01_vocab_oov",
    (s, dir) => {
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks).as("tk"))
      val vocab = tok.groupBy("tk").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5).select(col("tk"), lit(1).as("in_v"))
      tok.join(vocab, Seq("tk"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("bigint").as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).cast("bigint").as("n_oov"))
        .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""$TokCte,
      tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
      v AS (SELECT tk FROM tok GROUP BY tk HAVING COUNT(*) >= 5)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        CAST(SUM(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
      FROM tok LEFT JOIN v ON tok.tk = v.tk
      GROUP BY doc_id ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- dif01
  /** Corpus snapshot diff (dataset versioning / CDC): two releases of
    * the documents table — deterministic membership and content
    * perturbations — full-outer joined on doc_id, emitting
    * added/removed/changed rows with content digests. At scale this is
    * one sort-merge join on the primary key; over key-bucketed releases
    * it is shuffle-free.
    */
  private val dif01 = QueryDef(
    "dif01_snapshot_diff",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val a = docs.filter(col("doc_id") % 97 =!= 3)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h_old"))
      val b = docs.filter(col("doc_id") % 89 =!= 5)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).cast("binary")).as("h_new"))
      a.join(b, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("same"))
        .filter(col("status") =!= "same")
        .select("doc_id", "status", "h_old", "h_new")
        .orderBy("doc_id")
    },
    Some("""WITH a AS (SELECT doc_id, md5(text) AS h_old
        FROM documents WHERE doc_id % 97 <> 3),
      b AS (SELECT doc_id,
          md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS h_new
        FROM documents WHERE doc_id % 89 <> 5)
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        CASE WHEN a.doc_id IS NULL THEN 'added'
             WHEN b.doc_id IS NULL THEN 'removed'
             ELSE 'changed' END AS status,
        h_old, h_new
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h_old <> b.h_new
      ORDER BY doc_id"""),
  )

  /** Apply a CDC change feed to a snapshot: rows whose key appears in
    * `changes` are replaced by the change's new values (insert/update)
    * or dropped (`_op = 'delete'`). One keyed anti-join plus a union —
    * no driver-side row handling; over key-bucketed snapshots the
    * anti-join is shuffle-free. The delete path is what the
    * insert-only [[graft.sink.Sinks.upsertTable]] cannot express.
    */
  def applyDiff(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyDiff needs at least one key column")
    val touched = changes.select(keys.map(col): _*)
    val upserts = changes.filter(col("_op") =!= "delete").drop("_op")
    snapshot.join(touched, keys, "left_anti").unionByName(upserts)
  }

  // -------------------------------------------------------------- dif02
  // CDC round-trip: derive the change feed between two snapshot
  // versions (dif01's membership/content perturbations), apply it to
  // the old snapshot with [[applyDiff]], and the result must equal the
  // new snapshot — which is exactly what the oracle computes directly.
  private val dif02 = QueryDef(
    "dif02_apply_diff",
    (s, dir) => {
      val base = Tables(s, dir).documents.select("doc_id", "text", "lang", "source")
      val a = base.filter(col("doc_id") % 97 =!= 3)
      val b = base.filter(col("doc_id") % 89 =!= 5)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      val changes = a
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h_old"))
        .join(b.withColumn("h_new", md5(col("text").cast("binary"))),
          Seq("doc_id"), "full_outer")
        .withColumn("_op",
          when(col("h_old").isNull, "insert")
            .when(col("h_new").isNull, "delete")
            .when(col("h_old") =!= col("h_new"), "update")
            .otherwise("none"))
        .filter(col("_op") =!= "none")
        .select("doc_id", "_op", "text", "lang", "source")
      applyDiff(a, changes, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"),
          md5(col("text").cast("binary")).as("content_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, source,
        md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS content_md5
      FROM documents WHERE doc_id % 89 <> 5 ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- card01
  /** Dataset card: per-language corpus statistics (docs, tokens, mean
    * doc length, exact-duplicate ratio) — the summary table a corpus
    * release ships with. One aggregation pass; integer-exact sums with
    * ratios derived only at the end.
    */
  private val card01 = QueryDef(
    "card01_dataset_card",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("lang"), size(toks).cast("bigint").as("n_tokens"),
          md5(col("text").cast("binary")).as("h"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"),
          countDistinct(col("h")).cast("bigint").as("n_unique"))
        .withColumn("avg_doc_tokens",
          col("total_tokens").cast("double") / col("n_docs"))
        .withColumn("dup_ratio",
          lit(1.0) - col("n_unique").cast("double") / col("n_docs"))
        .orderBy("lang"),
    Some(s"""$TokCte
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
        CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avg_doc_tokens,
        CAST(1 AS DOUBLE) - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) AS dup_ratio
      FROM t GROUP BY lang ORDER BY lang"""),
  )

  // -------------------------------------------------------------- bp01
  /** Boilerplate coverage: per-document fraction of distinct 3-shingles
    * that are corpus-wide heavy hitters (document frequency ≥ 4) — the
    * headers/footers/navigation-chrome detector a web-corpus pipeline
    * runs before near-dedup (a doc that is MOSTLY boilerplate isn't
    * worth fuzzy-matching). Unlike dc01 there is no external eval set:
    * the heavy-hitter table is derived from the corpus itself by one
    * (shingle)-keyed aggregation, and because heavy hitters are by
    * definition few (DF threshold prunes the long tail), the set
    * broadcasts — the per-doc coverage join shuffles nothing.
    * Ratios leave integer space only in the final projection.
    */
  private val bp01 = QueryDef(
    "bp01_boilerplate",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val sh = docs.select(col("doc_id"),
        explode(graft.functions.TextExpressions.word_shingles(col("text"), 3)).as("sh"))
      // (doc_id, sh) pairs are distinct (word_shingles dedups per doc),
      // so plain count == document frequency
      val boiler = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 4).select("sh")
      val hits = sh.join(broadcast(boiler), "sh")
        .groupBy("doc_id").agg(count(lit(1)).cast("bigint").as("n_boiler"))
      docs.select(col("doc_id"),
          size(graft.functions.TextExpressions.word_shingles(col("text"), 3))
            .cast("bigint").as("n_shingles"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
          (coalesce(col("n_boiler"), lit(0L)).cast("double") /
            col("n_shingles").cast("double")).as("boiler_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""$TokCte,
      g AS (SELECT doc_id, $ShinglesSql AS shingles FROM t),
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      df AS (SELECT sh, COUNT(*) AS df FROM e GROUP BY sh),
      b AS (SELECT sh FROM df WHERE df >= 4),
      h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
        FROM e JOIN b USING (sh) GROUP BY doc_id)
      SELECT g.doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
        COALESCE(h.n_boiler, CAST(0 AS BIGINT)) AS n_boiler,
        CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / CAST(len(shingles) AS DOUBLE) AS boiler_ratio
      FROM g LEFT JOIN h USING (doc_id) ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- smp03
  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each document draws a deterministic uniform u from a salted md5 of
    * its key and competes on key = ln(u)/w with weight w = n_chars —
    * the top-10 per language are EXACTLY a w-weighted sample without
    * replacement of that stratum. The standard way a pipeline samples
    * "more from longer documents" reproducibly.
    *
    * 100 TB shape: one narrow scan + one shuffle by stratum;
    * row_number + filter lets WindowGroupLimit keep per-task partial
    * top-10s, so the shuffle carries ~10 rows per map task per
    * stratum, not the corpus. u is a dyadic rational ((h+1)/2^32 with
    * h the md5 prefix — exact in binary), so ln() is the only
    * transcendental and DuckDB's ln matches bit-for-bit (the txt06
    * precedent).
    */
  private val smp03 = QueryDef(
    "smp03_weighted_sample",
    (s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(desc("es_key"), col("doc_id"))
      Tables(s, dir).documents
        .withColumn("h",
          expr("cast(conv(substr(md5(cast(concat('es:', cast(doc_id as string)) as binary)), 1, 8), 16, 10) as bigint)"))
        .withColumn("es_key",
          log((col("h") + 1L).cast("double") / lit(4294967296.0)) / col("n_chars"))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 10)
        .select("doc_id", "lang", "n_chars", "es_key", "rn")
        .orderBy("lang", "rn")
    },
    Some("""WITH k AS (SELECT doc_id, lang, n_chars,
          ln((('0x' || substr(md5('es:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
             / 4294967296.0) / n_chars AS es_key
        FROM documents),
      r AS (SELECT doc_id, lang, n_chars, es_key,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS BIGINT) AS rn
        FROM k)
      SELECT doc_id, lang, n_chars, es_key, rn FROM r
      WHERE rn <= 10 ORDER BY lang, rn"""),
  )

  // -------------------------------------------------------------- dm02
  /** Equi-width value histogram — the distribution-profiling companion
    * to dq02's cardinality profile and q31's percentiles: o_totalprice
    * binned into 20 equal-width buckets between the observed min/max,
    * with exact counts and computed edges. Determinism: bin index is
    * floor((v - min) / width), one IEEE subtract + divide + floor per
    * row with min/width identical in both engines (min/max are exact
    * doubles from the data; width = (max-min)/20.0 is one division);
    * the max value clamps into the last bin. Scale shape: one min/max
    * aggregation broadcast back over the scan, one 20-group hash
    * aggregation — two passes, no sort, no collect.
    */
  private val dm02 = QueryDef(
    "dm02_value_histogram",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val mm = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
        .withColumn("width", (col("hi") - col("lo")) / lit(20.0))
      o.crossJoin(broadcast(mm))
        .withColumn("bin",
          least(floor((col("o_totalprice") - col("lo")) / col("width")), lit(19L))
            .cast("bigint"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          max(col("lo") + col("bin") * col("width")).as("bin_lo"),
          max(col("lo") + (col("bin") + 1L) * col("width")).as("bin_hi"))
        .orderBy("bin")
    },
    Some("""WITH mm AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
          (MAX(o_totalprice) - MIN(o_totalprice)) / 20.0 AS width
        FROM orders),
      b AS (SELECT LEAST(FLOOR((o_totalprice - lo) / width), 19) AS bin,
          lo, width
        FROM orders CROSS JOIN mm)
      SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
        MAX(lo + bin * width) AS bin_lo,
        MAX(lo + (bin + 1) * width) AS bin_hi
      FROM b GROUP BY bin ORDER BY bin"""),
  )

  // -------------------------------------------------------------- dm03
  /** Join-key skew report — the pre-flight health check run on a key
    * BEFORE shuffling 100 TB on it (skw01 is the mitigation; this is
    * the detector that tells you whether you need it). For o_custkey
    * over orders: key cardinality, total rows, the hottest key's
    * count, its corpus share in exact ppm, and the exact MEDIAN and
    * P99 of the per-key count distribution.
    *
    * Scale shape: one groupBy(key) count (map-side combined), then the
    * stats run over the COUNT DISTRIBUTION (cnt → how many keys have
    * that count — Zipf-compact, far smaller than the key table):
    * median/p99 come from the [[Sharded]] ECDF over count order
    * (never a global sort), thresholds in pure integer ceil
    * arithmetic; the hottest-key share is max·10^6 div total. One
    * output row, everything BIGINT-exact.
    */
  private val dm03 = QueryDef(
    "dm03_skew_report",
    (s, dir) => {
      val perKey = Tables(s, dir).orders
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val dist = perKey.groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
        .withColumn("shard", expr("cnt div 16"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("cnt"))
      val withCum = dist.withColumn("p", sum(col("freq")).over(wIn))
      val bases = Sharded.prefixSumBases(
        dist.groupBy(col("shard")).agg(sum(col("freq")).as("t")),
        "shard", Seq("t" -> "b"))
      val cum = withCum.join(broadcast(bases), "shard")
        .select(col("cnt"), (col("p") + col("b")).as("cum"))
      val tot = perKey.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"), max(col("cnt")).as("max_cnt"))
      // one pass probes both quantiles: min(cnt) over the rows whose
      // cumulative count clears each threshold (two filtered mins in
      // one aggregation, not two copies of the ECDF lineage)
      val quantiles = cum.crossJoin(broadcast(tot))
        .agg(
          min(when(col("cum") >= expr("(n_keys + 1) div 2"), col("cnt")))
            .as("median_cnt"),
          min(when(col("cum") >= expr("(99 * n_keys + 99) div 100"), col("cnt")))
            .as("p99_cnt"))
      tot.crossJoin(broadcast(quantiles))
        .select(col("n_keys"), col("total_rows"), col("max_cnt"),
          expr("(max_cnt * 1000000) div total_rows").as("top_share_ppm"),
          col("median_cnt"), col("p99_cnt"))
    },
    Some("""WITH k AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1),
      d AS (SELECT cnt, COUNT(*) AS freq FROM k GROUP BY cnt),
      c AS (SELECT cnt, SUM(freq) OVER (ORDER BY cnt) AS cum FROM d),
      t AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total_rows,
          CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM k)
      SELECT t.n_keys, t.total_rows, t.max_cnt,
        (t.max_cnt * 1000000) // t.total_rows AS top_share_ppm,
        (SELECT CAST(MIN(cnt) AS BIGINT) FROM c, t
          WHERE cum >= (t.n_keys + 1) // 2) AS median_cnt,
        (SELECT CAST(MIN(cnt) AS BIGINT) FROM c, t
          WHERE cum >= (99 * t.n_keys + 99) // 100) AS p99_cnt
      FROM t"""),
  )

  // -------------------------------------------------------------- dm05
  /** Equi-join cardinality estimation from per-side degree tables — the
    * optimizer-statistics primitive run BEFORE shuffling 100 TB through
    * a join. For keys shared by both sides, |A ⋈ B| = Σ_k d_A(k)·d_B(k)
    * EXACTLY; the degree tables are one map-side-combined groupBy per
    * side and their join is key-cardinality-sized — so the estimate
    * costs two scans and a tiny shuffle where materializing the join
    * (self-join on l_partkey here is ~30× fan-out) costs the real
    * thing. The `actual` column — the materialized join's COUNT — is
    * the test certificate, not part of the operator's scale story;
    * predicted == actual on every row is what the oracle pins.
    * Self-join cardinality includes the diagonal (each row pairs with
    * itself), i.e. it is the raw equi-join count.
    */
  /** The production estimator: one row — side row counts, shared-key
    * count, and the exact predicted equi-join cardinality Σ d_A·d_B —
    * at two-scan cost, no join materialization. dm05 wraps this with
    * the materialized-count certificate; at 100 TB a pipeline calls
    * THIS before deciding whether the join is affordable.
    */
  def estimateJoinCardinality(a: DataFrame, ka: String,
      b: DataFrame, kb: String): DataFrame = {
    val da = a.filter(col(ka).isNotNull).groupBy(col(ka).as("k"))
      .agg(count(lit(1)).as("da"))
    val db = b.filter(col(kb).isNotNull).groupBy(col(kb).as("k"))
      .agg(count(lit(1)).as("db"))
    val sides = da.agg(sum(col("da")).as("n_left"))
      .crossJoin(db.agg(sum(col("db")).as("n_right")))
    // coalesce: disjoint key sets sum over an EMPTY join — the caller
    // is deciding whether the join is affordable, and the correct
    // answer there is 0 predicted rows, not NULL
    val est = da.join(db, "k")
      .agg(count(lit(1)).as("n_keys_both"),
        coalesce(sum(col("da") * col("db")), lit(0L)).as("predicted"))
    sides.crossJoin(broadcast(est))
      .select(col("n_left").cast("bigint").as("n_left"),
        col("n_right").cast("bigint").as("n_right"),
        col("n_keys_both"),
        col("predicted").cast("bigint").as("predicted"))
  }

  private def joinCardRow(label: String, a: DataFrame, ka: String,
      b: DataFrame, kb: String): DataFrame = {
    val actual = a.select(col(ka).as("k")).filter(col("k").isNotNull)
      .join(b.select(col(kb).as("k")), "k")
      .agg(count(lit(1)).as("actual"))
    estimateJoinCardinality(a, ka, b, kb)
      .crossJoin(broadcast(actual))
      .select(lit(label).as("join_label"), col("n_left"), col("n_right"),
        col("n_keys_both"), col("predicted"), col("actual"))
  }

  private val dm05 = QueryDef(
    "dm05_join_cardinality",
    (s, dir) => {
      val t = Tables(s, dir)
      joinCardRow("customer-orders", t.customer, "c_custkey", t.orders, "o_custkey")
        .unionByName(joinCardRow("orders-lineitem", t.orders, "o_orderkey",
          t.lineitem, "l_orderkey"))
        .unionByName(joinCardRow("lineitem-self-partkey", t.lineitem, "l_partkey",
          t.lineitem, "l_partkey"))
        .orderBy("join_label")
    },
    Some("""WITH
      ca AS (SELECT c_custkey AS k, COUNT(*) AS d FROM customer GROUP BY 1),
      cb AS (SELECT o_custkey AS k, COUNT(*) AS d FROM orders GROUP BY 1),
      oa AS (SELECT o_orderkey AS k, COUNT(*) AS d FROM orders GROUP BY 1),
      ob AS (SELECT l_orderkey AS k, COUNT(*) AS d FROM lineitem GROUP BY 1),
      pa AS (SELECT l_partkey AS k, COUNT(*) AS d FROM lineitem GROUP BY 1)
      SELECT 'customer-orders' AS join_label,
        (SELECT CAST(SUM(d) AS BIGINT) FROM ca) AS n_left,
        (SELECT CAST(SUM(d) AS BIGINT) FROM cb) AS n_right,
        (SELECT COUNT(*) FROM ca JOIN cb USING (k)) AS n_keys_both,
        (SELECT CAST(SUM(ca.d * cb.d) AS BIGINT)
          FROM ca JOIN cb USING (k)) AS predicted,
        (SELECT COUNT(*) FROM customer JOIN orders
          ON c_custkey = o_custkey) AS actual
      UNION ALL
      SELECT 'orders-lineitem',
        (SELECT CAST(SUM(d) AS BIGINT) FROM oa),
        (SELECT CAST(SUM(d) AS BIGINT) FROM ob),
        (SELECT COUNT(*) FROM oa JOIN ob USING (k)),
        (SELECT CAST(SUM(oa.d * ob.d) AS BIGINT) FROM oa JOIN ob USING (k)),
        (SELECT COUNT(*) FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      UNION ALL
      SELECT 'lineitem-self-partkey',
        (SELECT CAST(SUM(d) AS BIGINT) FROM pa),
        (SELECT CAST(SUM(d) AS BIGINT) FROM pa),
        (SELECT COUNT(*) FROM pa),
        (SELECT CAST(SUM(a.d * b.d) AS BIGINT)
          FROM pa a JOIN pa b USING (k)),
        (SELECT COUNT(*) FROM lineitem a JOIN lineitem b
          ON a.l_partkey = b.l_partkey)
      ORDER BY join_label"""),
  )

  // -------------------------------------------------------------- dm01
  /** Per-source (domain) curation report: document/token volume, exact
    * duplicate rate, and language spread per provenance bucket — the
    * "which domains are worth what" table every corpus release ships
    * with (cf. card01 for the per-language cut).
    *
    * 100 TB shape: one scan, one groupBy(source) with map-side combine;
    * the two distincts (content hash, lang) are per-group exact —
    * count_distinct inside a group-by, not a global distinct.
    */
  private val dm01 = QueryDef(
    "dm01_source_stats",
    (s, dir) =>
      Tables(s, dir).documents
        .withColumn("n_toks", size(toks).cast("bigint"))
        .withColumn("ch", md5(col("text").cast("binary")))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          countDistinct(col("ch")).as("n_uniq"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("mean_tokens", col("n_tokens").cast("double") / col("n_docs"))
        .withColumn("n_exact_dup", (col("n_docs") - col("n_uniq")).cast("bigint"))
        .select("source", "n_docs", "n_tokens", "mean_tokens", "n_exact_dup", "n_langs")
        .orderBy(desc("n_tokens"), col("source")),
    Some(s"""WITH t AS (SELECT source, lang, text, md5(text) AS ch,
          CAST(len(${OracleSql.Toks}) AS BIGINT) AS n_toks
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS mean_tokens,
        CAST(COUNT(*) - COUNT(DISTINCT ch) AS BIGINT) AS n_exact_dup,
        CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM t GROUP BY source ORDER BY n_tokens DESC, source"""),
  )

  // -------------------------------------------------------------- mix02
  /** Token-budget mixture allocation: given per-source token volume and
    * a quality signal (here: the exact-duplicate-free fraction), assign
    * each source a share of a fixed training-token budget proportional
    * to quality-weighted volume, capped at what the source actually has
    * (one round of water-filling; unmet budget is reported per row so a
    * driver can rerun with the residue). This is the planning step a
    * data-mixing pipeline runs before sampling (cf. smp01/smp03 for the
    * sampling itself).
    *
    * All weights are exact integers (tokens × unique docs), so the
    * allocation `budget * w // W` is bit-deterministic; the only double
    * is the final sampling rate. 100 TB shape: one groupBy(source) with
    * map-side combine; the grand total joins back as a broadcast scalar
    * (txt06 pattern), never a single-partition window.
    */
  private val mix02 = QueryDef(
    "mix02_token_budget",
    (s, dir) => {
      val budget = 100000L
      val perSource = Tables(s, dir).documents
        .withColumn("n_toks", size(toks).cast("bigint"))
        .withColumn("ch", md5(col("text").cast("binary")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          countDistinct(col("ch")).as("n_uniq"))
        .withColumn("w", col("n_tokens") * col("n_uniq"))
      val totalW = perSource.agg(sum(col("w")).as("total_w"))
      perSource.crossJoin(broadcast(totalW))
        .withColumn("alloc_tokens",
          least(col("n_tokens"), expr(s"($budget * w) div total_w")))
        .withColumn("sample_rate",
          col("alloc_tokens").cast("double") / col("n_tokens"))
        .select("source", "n_tokens", "w", "alloc_tokens", "sample_rate")
        .orderBy("source")
    },
    Some(s"""WITH t AS (SELECT source, md5(text) AS ch,
          CAST(len(${OracleSql.Toks}) AS BIGINT) AS n_toks
        FROM documents),
      p AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
          COUNT(DISTINCT ch) AS n_uniq
        FROM t GROUP BY source),
      w AS (SELECT source, n_tokens, n_tokens * n_uniq AS w FROM p),
      tw AS (SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM w)
      SELECT source, n_tokens, CAST(w AS BIGINT) AS w,
        CAST(least(n_tokens, (100000 * w) // total_w) AS BIGINT) AS alloc_tokens,
        CAST(least(n_tokens, (100000 * w) // total_w) AS DOUBLE) / n_tokens AS sample_rate
      FROM w, tw ORDER BY source"""),
  )

  // -------------------------------------------------------------- ord01
  /** Deterministic training-order shuffle: every epoch-0 data pipeline
    * must hand the trainer a reproducible random permutation of the
    * corpus, sharded for parallel readers. Each document draws a salted
    * md5 shuffle key; the key's hash prefix picks one of 8 shards and
    * the key order within the shard is the read order. Retry-stable
    * (no RNG state — same property as smp01) and verifiable: the
    * oracle replays the exact permutation.
    *
    * 100 TB shape: ONE hash-partition exchange by shard + a
    * within-shard sort — never a global total-order sort; shard count
    * scales with reader parallelism and each shard sorts independently.
    * (The final ORDER BY here is the oracle-determinism harness, not
    * part of the operator.)
    */
  private val ord01 = QueryDef(
    "ord01_corpus_shuffle",
    (s, dir) => {
      val keyed = Tables(s, dir).documents
        .withColumn("sk", md5(concat(lit("shuf:42:"), col("doc_id").cast("string")).cast("binary")))
        .withColumn("shard",
          expr("cast(conv(substr(sk, 1, 8), 16, 10) as bigint) % 8"))
      val w = Window.partitionBy(col("shard")).orderBy(col("sk"), col("doc_id"))
      keyed
        .withColumn("pos", row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    },
    Some("""WITH k AS (SELECT doc_id,
          md5('shuf:42:' || CAST(doc_id AS VARCHAR)) AS sk
        FROM documents),
      sh AS (SELECT doc_id, sk,
          ('0x' || substr(sk, 1, 8))::BIGINT % 8 AS shard
        FROM k)
      SELECT doc_id, shard,
        CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sk, doc_id) AS BIGINT) AS pos
      FROM sh ORDER BY shard, pos"""),
  )

  // -------------------------------------------------------------- ord04
  /** Multi-epoch reshuffle audit: ord01 gives ONE epoch's deterministic
    * permutation; multi-epoch training needs a DIFFERENT deterministic
    * permutation per epoch (same corpus, fresh order, replayable after
    * a crash mid-epoch-3). Each epoch salts the shuffle key with its
    * epoch number; this row set proves, per epoch: the full corpus is
    * present (n_docs), the order is the pinned one (sum over docs of
    * pos·doc_id — a position-sensitive checksum the oracle replays
    * exactly), and the epoch genuinely reshuffled (moved_vs_prev =
    * docs whose (shard, pos) changed from the previous epoch; null for
    * epoch 1).
    *
    * 100 TB shape: per epoch, ord01's one hash-exchange + within-shard
    * sort; the cross-epoch comparison joins doc-count-sized position
    * tables on doc_id. Nothing global, nothing driver-side.
    */
  private def epochPositions(docs: org.apache.spark.sql.DataFrame, epoch: Int) = {
    val keyed = docs
      .withColumn("sk", md5(concat(lit(s"shuf:$epoch:"), col("doc_id").cast("string")).cast("binary")))
      .withColumn("shard",
        expr("cast(conv(substr(sk, 1, 8), 16, 10) as bigint) % 8"))
    val w = Window.partitionBy(col("shard")).orderBy(col("sk"), col("doc_id"))
    keyed.withColumn("pos", row_number().over(w).cast("bigint"))
      .select("doc_id", "shard", "pos")
  }

  private val ord04 = QueryDef(
    "ord04_epoch_reshuffle",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select("doc_id")
      val eps = (1 to 3).map(e => epochPositions(docs, e))
      val rows = (1 to 3).map { e =>
        val cur = eps(e - 1)
        val stats = cur.agg(count(lit(1)).as("n_docs"),
          sum(col("pos") * col("doc_id")).cast("bigint").as("order_checksum"))
        val moved =
          if (e == 1) stats.select(lit(null).cast("bigint").as("moved_vs_prev"))
          else {
            val prev = eps(e - 2)
              .select(col("doc_id"), col("shard").as("p_shard"), col("pos").as("p_pos"))
            cur.join(prev, "doc_id")
              .agg(sum(when(col("shard") =!= col("p_shard") ||
                col("pos") =!= col("p_pos"), 1L).otherwise(0L))
                .cast("bigint").as("moved_vs_prev"))
          }
        stats.crossJoin(broadcast(moved))
          .select(lit(e.toLong).as("epoch"), col("n_docs"),
            col("order_checksum"), col("moved_vs_prev"))
      }
      rows.reduce(_.unionByName(_)).orderBy("epoch")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents),
      e1 AS (SELECT doc_id,
          ('0x' || substr(md5('shuf:1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
          ROW_NUMBER() OVER (
            PARTITION BY ('0x' || substr(md5('shuf:1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
            ORDER BY md5('shuf:1:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
        FROM d),
      e2 AS (SELECT doc_id,
          ('0x' || substr(md5('shuf:2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
          ROW_NUMBER() OVER (
            PARTITION BY ('0x' || substr(md5('shuf:2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
            ORDER BY md5('shuf:2:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
        FROM d),
      e3 AS (SELECT doc_id,
          ('0x' || substr(md5('shuf:3:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
          ROW_NUMBER() OVER (
            PARTITION BY ('0x' || substr(md5('shuf:3:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
            ORDER BY md5('shuf:3:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
        FROM d)
      SELECT 1::BIGINT AS epoch, (SELECT COUNT(*) FROM e1) AS n_docs,
        (SELECT CAST(SUM(pos * doc_id) AS BIGINT) FROM e1) AS order_checksum,
        CAST(NULL AS BIGINT) AS moved_vs_prev
      UNION ALL
      SELECT 2, (SELECT COUNT(*) FROM e2),
        (SELECT CAST(SUM(pos * doc_id) AS BIGINT) FROM e2),
        (SELECT CAST(SUM(CASE WHEN a.shard <> b.shard OR a.pos <> b.pos
            THEN 1 ELSE 0 END) AS BIGINT)
          FROM e2 a JOIN e1 b USING (doc_id))
      UNION ALL
      SELECT 3, (SELECT COUNT(*) FROM e3),
        (SELECT CAST(SUM(pos * doc_id) AS BIGINT) FROM e3),
        (SELECT CAST(SUM(CASE WHEN a.shard <> b.shard OR a.pos <> b.pos
            THEN 1 ELSE 0 END) AS BIGINT)
          FROM e3 a JOIN e2 b USING (doc_id))
      ORDER BY epoch"""),
  )

  // -------------------------------------------------------------- ord02
  /** Curriculum training order: documents staged easy→hard by length
    * decile (the classic curriculum-learning schedule), with a
    * deterministic md5 shuffle WITHIN each decile — the trainer reads
    * deciles in order but sees no systematic ordering inside one.
    * NTILE deciles over (n_tokens, doc_id) are exact and identical in
    * both engines (standard SQL semantics, total tie-break); the
    * within-decile position reuses ord01's salted-md5 retry-stable
    * shuffle key.
    *
    * Scale note: a literal NTILE would be a single-partition window
    * over the whole corpus. Instead the GLOBAL rank under
    * (n_tokens, doc_id) comes from the pack01 hierarchical prefix-sum
    * idiom — within-shard row_number (shard = n_tokens div 32, so
    * shard order IS length order), tiny shard-count prefix scan,
    * rank = shard base + within-shard position — and the decile is
    * NTILE's exact integer formula applied to that rank: with n rows,
    * the first n%10 buckets hold n/10+1 rows, the rest n/10. Same
    * output bit-for-bit as the oracle's NTILE, no global sort. The
    * within-decile stage partitions by decile and never sorts
    * globally.
    */
  private val ord02 = QueryDef(
    "ord02_curriculum",
    (s, dir) => {
      val t = Tables(s, dir).documents
        .select(col("doc_id"), size(toks).cast("bigint").as("n_tokens"))
        .withColumn("shard", expr("n_tokens div 32"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("n_tokens"), col("doc_id"))
      val withPos = t.withColumn("rn_in", row_number().over(wIn).cast("bigint"))
      // shard totals: one row per 32-token length band — tiny at any SF
      val bases = Sharded.prefixSumBases(
        t.groupBy(col("shard")).agg(count(lit(1)).as("tot")),
        "shard", Seq("tot" -> "base"))
      val tot = t.agg(count(lit(1)).as("n"))
      val deciled = withPos.join(broadcast(bases), "shard")
        .crossJoin(broadcast(tot))
        .withColumn("rn", col("base") + col("rn_in"))
        // NTILE(10) closed form over the exact rank: q = n div 10,
        // r = n % 10; buckets 1..r have q+1 rows, buckets r+1..10 have q
        .withColumn("decile", expr("""CASE
            WHEN rn <= (n div 10 + 1) * (n % 10)
              THEN (rn - 1) div (n div 10 + 1) + 1
            ELSE (n % 10) + (rn - (n div 10 + 1) * (n % 10) - 1) div (n div 10) + 1
          END""").cast("bigint"))
        .drop("shard", "rn_in", "base", "n", "rn")
        .withColumn("sk", md5(concat(lit("cur:42:"), col("doc_id").cast("string")).cast("binary")))
      deciled
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("decile")).orderBy(col("sk"), col("doc_id"))).cast("bigint"))
        .select("doc_id", "n_tokens", "decile", "pos")
        .orderBy("decile", "pos")
    },
    Some(s"""WITH t AS (SELECT doc_id, CAST(len(${OracleSql.Toks}) AS BIGINT) AS n_tokens
        FROM documents),
      d AS (SELECT doc_id, n_tokens,
          CAST(NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS decile,
          md5('cur:42:' || CAST(doc_id AS VARCHAR)) AS sk
        FROM t)
      SELECT doc_id, n_tokens, decile,
        CAST(ROW_NUMBER() OVER (PARTITION BY decile ORDER BY sk, doc_id) AS BIGINT) AS pos
      FROM d ORDER BY decile, pos"""),
  )

  // -------------------------------------------------------------- mix03
  /** Temperature-based multilingual sampling weights (the mT5/XLM-R
    * mixing rule): language l is sampled with p_l ∝ (n_l/N)^α, α=0.5 —
    * upweighting low-resource languages relative to their token share
    * without flattening the mixture entirely (α=1 is proportional,
    * α=0 is uniform). Complements mix01 (fixed per-language factors)
    * and mix02 (quality-weighted budget water-filling).
    *
    * Determinism: per-language token totals are exact integers; the
    * normalizer Z = Σ sqrt(n_l/N) is a SORTED-ORDER fold (txt11's
    * pinned-accumulation idiom) and sqrt/division are single IEEE ops,
    * so both engines produce bit-identical weights before the final
    * 6-decimal round.
    *
    * Scale shape: one map-side-combined aggregation to |languages|
    * rows; everything after lives on that sketch-sized table.
    */
  private val mix03 = QueryDef(
    "mix03_temperature_weights",
    (s, dir) => {
      val perLang = Tables(s, dir).documents
        .groupBy(col("lang"))
        .agg(sum(size(toks)).cast("bigint").as("n_tokens"))
      val z = perLang
        .agg(sum(col("n_tokens")).as("n_total"),
          sort_array(collect_list(struct(col("lang"), col("n_tokens")))).as("terms"))
        .select(col("n_total"),
          expr("aggregate(terms, 0.0D, (acc, t) -> acc + sqrt(t.n_tokens / CAST(n_total AS DOUBLE)))")
            .as("z"))
      perLang.crossJoin(broadcast(z))
        .select(col("lang"), col("n_tokens"),
          round(col("n_tokens") / col("n_total").cast("double"), 6).as("p_prop"),
          round(sqrt(col("n_tokens") / col("n_total").cast("double")) / col("z"), 6)
            .as("p_sampled"))
        .orderBy("lang")
    },
    Some(s"""WITH t AS (SELECT doc_id, lang, text, ${OracleSql.Toks} AS toks
        FROM documents),
      pl AS (SELECT lang, CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
        FROM t GROUP BY lang),
      tot AS (SELECT SUM(n_tokens) AS n_total FROM pl),
      z AS (SELECT n_total,
          list_sum(list_transform(list(n_tokens ORDER BY lang),
            x -> sqrt(x / CAST(n_total AS DOUBLE)))) AS z
        FROM pl CROSS JOIN tot GROUP BY n_total)
      SELECT lang, n_tokens,
        ROUND(n_tokens / CAST(n_total AS DOUBLE), 6) AS p_prop,
        ROUND(sqrt(n_tokens / CAST(n_total AS DOUBLE)) / z, 6) AS p_sampled
      FROM pl CROSS JOIN z ORDER BY lang"""),
  )

  // -------------------------------------------------------------- dc03
  /** Span-level eval-set decontamination (the GPT-3 appendix-C rule):
    * a training document is contaminated if it shares ANY exact k-token
    * span with a held-out eval document (doc_id ≡ 0 mod 97 — dc01's
    * eval split). dc01 flags fuzzy 3-shingle overlap mass; this catches
    * verbatim quotation of eval items, the failure mode that actually
    * inflates benchmark scores. k=4 here (GPT-3 used 13) because the
    * synthetic corpus shares no longer verbatim runs — the declared
    * query must exercise a non-empty match set.
    *
    * Scale shape: distinct 8-gram fingerprints per doc (linear), eval
    * side is 1/97 of the corpus and joins broadcast; one aggregation
    * per contaminated doc. No pair expansion — gram frequency never
    * multiplies.
    */
  /** Contaminated training docs: any doc sharing ≥1 exact k-token span
    * with a doc the predicate marks as eval. See dc03.
    */
  def evalSpanContamination(docs: DataFrame, k: Int = 4,
      isEval: org.apache.spark.sql.Column = col("doc_id") % 97 === 0): DataFrame = {
    val grams = docs
      .select(col("doc_id"), isEval.as("is_eval"),
        graft.functions.TextExpressions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), col("is_eval"), explode(array_distinct(expr(
        s"""transform(sequence(0, size(toks) - $k),
           i -> md5(array_join(slice(toks, i + 1, $k), ' ')))"""))).as("g"))
    val eval_ = grams.filter(col("is_eval"))
      .select(col("doc_id").as("eval_id"), col("g"))
    val train = grams.filter(!col("is_eval"))
    train.join(broadcast(eval_), Seq("g"))
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_spans"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  private val dc03 = QueryDef(
    "dc03_eval_span_contam",
    (s, dir) => evalSpanContamination(Tables(s, dir).documents),
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.Toks} AS toks FROM documents),
      g0 AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 3)) AS pos
        FROM t WHERE len(toks) >= 4),
      g AS (SELECT DISTINCT doc_id,
          md5(array_to_string(toks[pos + 1:pos + 4], ' ')) AS g
        FROM g0),
      ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0)
      SELECT tr.doc_id,
        CAST(COUNT(DISTINCT tr.g) AS BIGINT) AS n_spans,
        CAST(COUNT(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
      FROM tr JOIN ev USING (g)
      GROUP BY tr.doc_id ORDER BY tr.doc_id"""),
  )

  // -------------------------------------------------------------- chk02
  /** Sentence-boundary-aware chunking — chk01's fixed 48-token stride
    * splits mid-sentence, which degrades both training windows and RAG
    * retrieval units; this variant packs WHOLE sentences greedily into
    * ~64-token chunks: a sentence starts a new chunk when the tokens
    * accumulated before it cross the budget (budget-crossing packing —
    * the prefix-sum-expressible form of greedy packing; a sentence
    * longer than the budget gets a chunk of its own). Sentences split
    * on terminal-punctuation runs with a lookaround-free regex
    * ('[^.!?]+[.!?]*' — Java regex and DuckDB's RE2 agree on plain
    * character classes, the txt07/txt12 lesson).
    *
    * Scale shape: linear explode to sentence rows, one per-doc window
    * (prefix sum of token counts), one (doc, chunk) aggregation — all
    * map-side combinable, no shuffle beyond the doc key and the
    * presentation sort. The chunk fingerprint md5's the sentences in
    * index order via the sorted-fold idiom, so dedup can run on chunks
    * downstream (mm03 pattern).
    */
  private val chk02 = QueryDef(
    "chk02_sentence_chunks",
    (s, dir) => {
      val sents = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(
          expr("regexp_extract_all(text, '[^.!?]+[.!?]*', 0)"))
          .as(Seq("sidx", "sentence")))
        .withColumn("n_tok",
          size(graft.functions.TextExpressions.tokens(col("sentence"))).cast("bigint"))
      val w = Window.partitionBy("doc_id").orderBy("sidx")
        .rowsBetween(Window.unboundedPreceding, -1)
      sents
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("chunk_id", floor(col("cum_before") / 64).cast("bigint"))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("n_sentences"),
          sum(col("n_tok")).as("n_chunk_tokens"),
          md5(concat_ws("", sort_array(collect_list(struct(col("sidx"), col("sentence"))))
            .getField("sentence")).cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    },
    Some(s"""WITH s0 AS (SELECT doc_id,
          regexp_extract_all(text, '[^.!?]+[.!?]*') AS ss
        FROM documents),
      s1 AS (SELECT doc_id, ss, unnest(range(len(ss))) AS sidx FROM s0),
      t AS (SELECT doc_id, sidx, ss[sidx + 1] AS sentence,
          CAST(len(${OracleSql.Toks.replace("text", "ss[sidx + 1]")}) AS BIGINT) AS n_tok
        FROM s1),
      c AS (SELECT doc_id, sidx, sentence, n_tok,
          CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY sidx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_before
        FROM t)
      SELECT doc_id, CAST(cum_before // 64 AS BIGINT) AS chunk_id,
        COUNT(*) AS n_sentences,
        CAST(SUM(n_tok) AS BIGINT) AS n_chunk_tokens,
        md5(string_agg(sentence, '' ORDER BY sidx)) AS chunk_md5
      FROM c GROUP BY doc_id, cum_before // 64
      ORDER BY doc_id, chunk_id"""),
  )

  // -------------------------------------------------------------- smp05
  /** RENDEZVOUS (highest-random-weight) sharding — the consistent
    * placement scheme whose property modulo sharding lacks: growing
    * the cluster from N to N+1 shards moves ONLY the keys whose
    * top-weight shard IS the new one (expected 1/(N+1) of keys);
    * `pmod(key, N)` reshuffles nearly everything. The audit emits one
    * row per new-cluster shard with its key count (balance evidence)
    * and how many keys moved INTO it across the resize — the HRW
    * theorem says that number must be ZERO for every pre-existing
    * shard, which the oracle and spec both pin.
    *
    * 100 TB shape: pure map — N+1 md5 weights per key folded through
    * greatest() over (weight, shard) structs (no join, no shuffle
    * beyond the output aggregation). Weights are 60-bit md5 prefixes
    * (winnowing's signed-safe width); ties break to the larger shard
    * id in BOTH engines (struct max ↔ ORDER BY h DESC, j DESC).
    */
  private def hrwShard(key: org.apache.spark.sql.Column, n: Int) =
    greatest((0 until n).map { j =>
      struct(
        conv(substring(md5(concat(lit(s"shard:$j:"), key.cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("bigint").as("h"),
        lit(j).as("j"))
    }: _*).getField("j")

  private val smp05 = QueryDef(
    "smp05_rendezvous_sharding",
    (s, dir) =>
      Tables(s, dir).part
        .select(col("p_partkey").as("key"))
        .withColumn("s8", hrwShard(col("key"), 8))
        .withColumn("s9", hrwShard(col("key"), 9))
        .groupBy(col("s9").as("shard"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("n_moved_in"))
        .orderBy("shard"),
    Some("""WITH c9 AS (SELECT p_partkey AS key, j,
          ('0x' || substr(md5('shard:' || j || ':' || CAST(p_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM part, range(9) r(j)),
      a9 AS (SELECT key, j AS s9 FROM c9
        QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY h DESC, j DESC) = 1),
      a8 AS (SELECT key, j AS s8 FROM c9 WHERE j < 8
        QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY h DESC, j DESC) = 1)
      SELECT s9 AS shard, COUNT(*) AS n_keys,
        CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in
      FROM a9 JOIN a8 USING (key)
      GROUP BY 1 ORDER BY shard"""),
  )

  // -------------------------------------------------------------- smp04
  /** Deterministic Poisson bootstrap (the distributed bootstrap: Poisson(1)
    * weights approximate multinomial resampling without coordinating a
    * global sample — Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", 2012): R=20 replicates of the corpus-mean
    * document length, each row weighted by an inverse-CDF Poisson draw
    * from an md5-derived uniform. The replicate spread is the standard
    * error a release pipeline reports next to every corpus statistic.
    *
    * Determinism: u = 24-bit md5 prefix / 2^24 (exact), compared
    * against double literals of the Poisson(1) CDF; weights and
    * weighted sums are exact integers; one IEEE division per replicate.
    * Task retries cannot change a draw — `rand()` bootstraps break
    * under Spark's recompute semantics.
    *
    * Scale shape: R-way row explode (map-only) into a per-replicate
    * aggregation with map-side combine — R·|partitions| partials, no
    * other shuffle. R is a constant; the corpus is streamed once.
    */
  private val smp04 = QueryDef(
    "smp04_poisson_bootstrap",
    (s, dir) => {
      // Poisson(1) CDF: P(X<=k) for k=0..5; u beyond the tail gets w=6
      val cdf = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238463, 0.9963401531726563, 0.9994058151824183)
      val u = conv(substring(md5(concat(lit("bs:"), col("rep").cast("string"),
        lit(":"), col("doc_id").cast("string")).cast("binary")), 1, 6), 16, 10)
        .cast("bigint") / lit(16777216.0)
      // w = smallest k whose CDF bound exceeds u (checked ascending)
      val weight = cdf.zipWithIndex.reverse.foldLeft(lit(6): org.apache.spark.sql.Column) {
        case (acc, (p, k)) => when(u < p, k).otherwise(acc)
      }
      Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          // BIGINT on both sides (header rule in Relational.scala):
          // the oracle's generate_series yields BIGINT natively
          explode(sequence(lit(0L), lit(19L))).as("rep"))
        .withColumn("w", weight)
        .groupBy("rep")
        .agg(sum(col("w")).cast("bigint").as("n_eff"),
          (sum(col("w") * col("n_chars")).cast("double") / sum(col("w")))
            .as("boot_mean"))
        .orderBy("rep")
    },
    Some("""WITH r AS (SELECT doc_id, n_chars, g.rep
        FROM documents CROSS JOIN generate_series(0, 19) g(rep)),
      u AS (SELECT rep, n_chars,
          ('0x' || substr(md5('bs:' || CAST(rep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
            / 16777216.0 AS u
        FROM r),
      w AS (SELECT rep, n_chars,
          CASE WHEN u < 0.36787944117144233 THEN 0
               WHEN u < 0.7357588823428847 THEN 1
               WHEN u < 0.9196986029286058 THEN 2
               WHEN u < 0.9810118431238463 THEN 3
               WHEN u < 0.9963401531726563 THEN 4
               WHEN u < 0.9994058151824183 THEN 5
               ELSE 6 END AS w
        FROM u)
      SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
        CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w) AS boot_mean
      FROM w GROUP BY rep ORDER BY rep"""),
  )

  // ------------------------------------------------------------- ord03
  /** Length-grouped training batches (dynamic batching): documents are
    * ranked by token count DESCENDING (doc_id tie-break) and chunked
    * into fixed batches of 16, so each batch holds similar-length docs
    * and padding waste (n·max − Σlen per batch) is minimized — the
    * standard alternative to ord01's uniform shuffle when step-time
    * variance matters more than ordering randomness.
    *
    * 100 TB shape: the global descending rank is the pack01/ks01
    * hierarchical prefix-sum again — shard by length bucket, rank
    * within shards in parallel, broadcast shard bases — never a
    * single-partition row_number over the corpus. The oracle replays
    * the flat ROW_NUMBER.
    */
  private val ord03 = QueryDef(
    "ord03_length_batches",
    (s, dir) => {
      val B = 16L
      val d = Tables(s, dir).documents
        .select(col("doc_id"), size(toks).cast("bigint").as("n_tokens"))
        .withColumn("key1", -col("n_tokens"))
        .withColumn("shard", floor(col("key1") / lit(64.0)).cast("long"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("key1"), col("doc_id"))
      val withRank = d.withColumn("r_in", count(lit(1)).over(wIn))
      val bases = Sharded.prefixSumBases(
        d.groupBy(col("shard")).agg(count(lit(1)).as("t")),
        "shard", Seq("t" -> "b"))
      withRank.join(broadcast(bases), "shard")
        .withColumn("batch_id", expr(s"(r_in + b - 1) div $B"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_tokens"),
          sum(col("n_tokens")).as("sum_tokens"))
        .select(col("batch_id").cast("bigint").as("batch_id"),
          col("n_docs").cast("bigint").as("n_docs"),
          col("max_tokens").cast("bigint").as("max_tokens"),
          col("sum_tokens").cast("bigint").as("sum_tokens"),
          (col("n_docs") * col("max_tokens") - col("sum_tokens"))
            .cast("bigint").as("pad_waste"))
        .orderBy("batch_id")
    },
    Some(s"""$TokCte,
      n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
      r AS (SELECT doc_id, n_tokens,
          ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn FROM n)
      SELECT (rn - 1) // 16 AS batch_id,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
        CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_waste
      FROM r GROUP BY 1 ORDER BY batch_id"""),
  )

  // ------------------------------------------------------------- scd01
  /** Type-2 slowly-changing-dimension merge: two snapshot versions of
    * a dimension become the warehouse-standard SCD2 history table —
    * every key carries its full attribute timeline as
    * (valid_from, valid_to, is_current) rows. Versions are INTEGER
    * release numbers (not wall-clock timestamps) so the history is
    * bit-deterministic and replayable.
    *
    * Row rules per key: unchanged → one open row [v_from, null];
    * changed → closed old row [v_from, v_to] + open new row
    * [v_to, null]; deleted → closed old row; inserted → open new row.
    *
    * 100 TB shape: ONE full-outer equi-join on the dimension key plus
    * a conditional 1-or-2-row explode — the same single-shuffle cost
    * as dif01's snapshot diff; over key-bucketed snapshots it is
    * shuffle-free. Attribute comparison is null-safe (`<=>`) so NULL
    * attribute transitions are tracked, not swallowed.
    */
  def scd2History(v1: DataFrame, v2: DataFrame, key: String, attrs: Seq[String],
      fromVersion: Long = 1L, toVersion: Long = 2L): DataFrame = {
    require(attrs.nonEmpty, "scd2History needs at least one tracked attribute")
    val a = v1.select((key +: attrs).map(c => col(c).as(s"a_$c")): _*)
    val b = v2.select((key +: attrs).map(c => col(c).as(s"b_$c")): _*)
    val j = a.join(b, col(s"a_$key") === col(s"b_$key"), "full_outer")
    val same = attrs.map(c => col(s"a_$c") <=> col(s"b_$c")).reduce(_ && _)
    def row(side: String, from: Long, to: org.apache.spark.sql.Column,
        current: org.apache.spark.sql.Column) =
      struct((Seq(col(s"${side}_$key").as(key)) ++
        attrs.map(c => col(s"${side}_$c").as(c)) ++
        Seq(lit(from).as("valid_from"), to.cast("bigint").as("valid_to"),
          current.as("is_current"))): _*)
    val oldClosed = row("a", fromVersion, lit(toVersion), lit(false))
    val oldOpen = row("a", fromVersion, lit(null), lit(true))
    val newOpen = row("b", toVersion, lit(null), lit(true))
    j.select(explode(
        when(col(s"a_$key").isNull, array(newOpen))          // inserted
          .when(col(s"b_$key").isNull, array(oldClosed))     // deleted
          .when(same, array(oldOpen))                        // unchanged
          .otherwise(array(oldClosed, newOpen))).as("r"))    // changed
      .select(col("r.*"))
  }

  /** scd01 over the customer dimension with deterministic v2
    * perturbations: segment updated for custkey ≡ 0 (mod 7), rows
    * deleted for custkey ≡ 0 (mod 13), new keys inserted at
    * −custkey for custkey ≡ 0 (mod 11) — NEGATED, not offset: real
    * custkeys are positive at every scale factor, so the synthetic
    * inserts can never collide with a real key (a fixed +1000000
    * offset would, once the key range outgrows the offset, silently
    * break the key-unique snapshot assumption scd2History requires).
    * The oracle replays the row rules as three legs of a UNION.
    */
  private val scd01 = QueryDef(
    "scd01_scd2_history",
    (s, dir) => {
      val c = Tables(s, dir).customer.select("c_custkey", "c_mktsegment", "c_acctbal")
      val v2 = c.filter(col("c_custkey") % 13 =!= 0)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("*")))
            .otherwise(col("c_mktsegment")))
        .unionByName(c.filter(col("c_custkey") % 11 === 0)
          .select((-col("c_custkey")).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal")))
      scd2History(c, v2, "c_custkey", Seq("c_mktsegment", "c_acctbal"))
        .orderBy("c_custkey", "valid_from")
    },
    Some("""WITH c AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
      v2 AS (SELECT c_custkey,
          CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || '*' ELSE c_mktsegment END AS c_mktsegment,
          c_acctbal
        FROM c WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT -c_custkey, c_mktsegment, c_acctbal
        FROM c WHERE c_custkey % 11 = 0),
      j AS (SELECT a.c_custkey AS ak, b.c_custkey AS bk,
          a.c_mktsegment AS am, a.c_acctbal AS ab,
          b.c_mktsegment AS bm, b.c_acctbal AS bb,
          (a.c_mktsegment IS NOT DISTINCT FROM b.c_mktsegment
            AND a.c_acctbal IS NOT DISTINCT FROM b.c_acctbal) AS same
        FROM c a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
      SELECT * FROM (
        SELECT bk AS c_custkey, bm AS c_mktsegment, bb AS c_acctbal,
          CAST(2 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
          TRUE AS is_current
        FROM j WHERE ak IS NULL OR (bk IS NOT NULL AND NOT same)
        UNION ALL
        SELECT ak, am, ab, CAST(1 AS BIGINT),
          CASE WHEN bk IS NULL OR NOT same THEN CAST(2 AS BIGINT) END,
          bk IS NOT NULL AND same
        FROM j WHERE ak IS NOT NULL)
      ORDER BY c_custkey, valid_from"""),
  )

  // ------------------------------------------------------------- scd02
  /** POINT-IN-TIME join against the SCD2 dimension — the query scd01's
    * history exists to serve: each fact joins the dimension VERSION
    * that was valid when the fact occurred (valid_from ≤ v <
    * valid_to), never the current row. The demo pins all three
    * temporal semantics on one result: customers whose segment changed
    * between versions contribute v1 facts under the OLD label and v2
    * facts under the new starred one; customers deleted in v2
    * (valid_to = 2) keep their v1 facts but their v2 facts drop
    * (no row was valid); v2-inserted keys never match v1 facts.
    *
    * 100 TB shape: the dimension history is dimension-sized —
    * broadcast, so the validity-window predicate rides the broadcast
    * hash join on the key with zero extra shuffle; a history too big
    * to broadcast uses q42's binned range join on (key, version bin).
    * Fact versions derive from o_orderkey parity (deterministic in
    * both engines); money sums use the exact decimal idiom.
    */
  private val scd02 = QueryDef(
    "scd02_pit_join",
    (s, dir) => {
      val c = Tables(s, dir).customer.select("c_custkey", "c_mktsegment", "c_acctbal")
      val v2 = c.filter(col("c_custkey") % 13 =!= 0)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("*")))
            .otherwise(col("c_mktsegment")))
        .unionByName(c.filter(col("c_custkey") % 11 === 0)
          .select((-col("c_custkey")).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal")))
      val hist = scd2History(c, v2, "c_custkey", Seq("c_mktsegment", "c_acctbal"))
      val facts = Tables(s, dir).orders
        .select(col("o_custkey"), col("o_totalprice"),
          (lit(1L) + col("o_orderkey") % 2).as("v"))
      facts.join(broadcast(hist),
          col("o_custkey") === col("c_custkey") &&
            col("valid_from") <= col("v") &&
            (col("valid_to").isNull || col("v") < col("valid_to")))
        .groupBy("v", "c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .orderBy("v", "c_mktsegment")
    },
    Some("""WITH c AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
      v2 AS (SELECT c_custkey,
          CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || '*' ELSE c_mktsegment END AS c_mktsegment,
          c_acctbal
        FROM c WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT -c_custkey, c_mktsegment, c_acctbal
        FROM c WHERE c_custkey % 11 = 0),
      j AS (SELECT a.c_custkey AS ak, b.c_custkey AS bk,
          a.c_mktsegment AS am, a.c_acctbal AS ab,
          b.c_mktsegment AS bm, b.c_acctbal AS bb,
          (a.c_mktsegment IS NOT DISTINCT FROM b.c_mktsegment
            AND a.c_acctbal IS NOT DISTINCT FROM b.c_acctbal) AS same
        FROM c a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey),
      hist AS (
        SELECT bk AS c_custkey, bm AS c_mktsegment,
          CAST(2 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
        FROM j WHERE ak IS NULL OR (bk IS NOT NULL AND NOT same)
        UNION ALL
        SELECT ak, am, CAST(1 AS BIGINT),
          CASE WHEN bk IS NULL OR NOT same THEN CAST(2 AS BIGINT) END
        FROM j WHERE ak IS NOT NULL),
      f AS (SELECT o_custkey, o_totalprice, 1 + o_orderkey % 2 AS v FROM orders)
      SELECT f.v, h.c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(f.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM f JOIN hist h ON h.c_custkey = f.o_custkey
        AND h.valid_from <= f.v AND (h.valid_to IS NULL OR f.v < h.valid_to)
      GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  // ------------------------------------------------------------- spl02
  /** Stratified train/val/test split with exact per-stratum quotas:
    * within every language, documents are ranked by a salted md5 (the
    * smp01/ord01 deterministic-shuffle idiom) and the first 80% land in
    * train, the next 10% in val, the rest in test — so EVERY stratum
    * hits its quota exactly (a plain hash split only hits proportions
    * in expectation, and small strata can miss entire splits). The
    * complement of spl01: spl01 guarantees cluster-coherent assignment
    * for leakage safety; spl02 guarantees stratum-exact proportions.
    *
    * 100 TB shape: one window partitioned BY STRATUM (parallel across
    * languages — never a global sort) computing rank and stratum size
    * in the same pass; quota boundaries are exact integer arithmetic
    * ((8·n) div 10), so the assignment is reproducible anywhere.
    */
  private val spl02 = QueryDef(
    "spl02_stratified_split",
    (s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"), col("lang"))
        .withColumn("hx",
          md5(concat(lit("spl2:"), col("doc_id").cast("string")).cast("binary")))
      val w = Window.partitionBy(col("lang")).orderBy(col("hx"), col("doc_id"))
      d.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .withColumn("split",
          when(expr("rn <= (8 * n_s) div 10"), "train")
            .when(expr("rn <= (9 * n_s) div 10"), "val")
            .otherwise("test"))
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, lang,
          md5('spl2:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents),
      r AS (SELECT doc_id, lang,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY lang) AS n_s FROM d)
      SELECT doc_id, lang,
        CASE WHEN rn <= (8 * n_s) // 10 THEN 'train'
             WHEN rn <= (9 * n_s) // 10 THEN 'val'
             ELSE 'test' END AS split
      FROM r ORDER BY doc_id"""),
  )

  def defs: Seq[QueryDef] =
    Seq(dc01, dc02, rep01, smp01, smp02, smp03, chk01, chk02, mix01, mix02, mix03, pii01, pii02, pii03,
      pack01, vcb01, dif01, dif02, card01, bp01, dm01, dm02, dm03, dm05, ord01, ord02, ord04, dc03, smp04, smp05, spl02,
      scd01, scd02, ord03)
}
