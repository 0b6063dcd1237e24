package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer
  * step a training-data pipeline runs over the corpus it just curated
  * (SURVEY.md §2C north-star extension; the reference has no text
  * processing at all beyond json.dumps, json_processor.py:87-90).
  *
  * Shape per merge round (the standard BPE trainer loop):
  *   1. adjacent-pair counts over the word-frequency table, weighted
  *      by word frequency — one explode + hash aggregation (map-side
  *      combined; the word table, not the corpus, is re-scanned);
  *   2. argmax pair (count desc, pair asc tie-break) — a bounded
  *      1-row collect per round (same contract as the IVF/PQ
  *      codebook pulls);
  *   3. apply the merge to every word — a pure map (string replace).
  *
  * Merge semantics: symbols are space-joined with sentinel spaces and
  * a merge applies LEFTMOST NON-OVERLAPPING via SQL replace() — for a
  * run of k identical pairs this merges ceil-alternate occurrences
  * (replace semantics), which both engines implement identically;
  * classic greedy BPE differs only on degenerate repeated-symbol runs.
  *
  * 100 TB shape: the word-frequency table is Zipf-compact (vocab not
  * corpus sized); each round is one aggregation + one map over it.
  * Rounds are inherently sequential (each merge changes the next
  * round's counts) — the per-round work is fully distributed.
  */
object Tokenizer {

  /** (round, pair, merged, cnt) for `rounds` BPE merges trained on the
    * token-frequency table of `docs`.
    */
  def bpeMerges(spark: SparkSession, docs: DataFrame, rounds: Int = 4): DataFrame = {
    val (merges, wf0) = trainMerges(spark, docs, rounds)
    wf0.unpersist(blocking = false)
    merges
  }

  /** Training core: returns (merges as a literal DataFrame, the
    * PERSISTED base word-frequency table (w, freq, s)). The word table
    * is Zipf-compact (vocab-, not corpus-sized), and every round's
    * pair-count aggregation re-reads it — without the persist, round
    * r's lineage recomputes the corpus explode + groupBy from scratch
    * (rounds+1 corpus scans per training run; with it, exactly one).
    * The caller owns the unpersist.
    */
  private def trainMerges(spark: SparkSession, docs: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val toks = graft.functions.TextExpressions.tokens(col("text"))
    // Zipf-compact word-frequency table; symbols start as characters,
    // space-joined with sentinel spaces so a merge is a pure replace
    val wf0 = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("s", concat(lit(" "),
        array_join(expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"), " "),
        lit(" ")))
      .select("w", "freq", "s")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var wf = wf0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      // pair counts: adjacent symbol pairs weighted by word frequency
      val top = wf
        .withColumn("syms", split(trim(col("s")), " "))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> concat(syms[i-1], ' ', syms[i]))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect() // bounded: exactly one row per round
      if (top.nonEmpty) {
        val pair = top.head.getString(0)
        val cnt = top.head.getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((r, pair, merged, cnt))
        // literal (non-regex) replace — byte-identical semantics to the
        // oracle's replace(); tokens are lowercased word chars, quote
        // escaping is pure defense
        val q = (x: String) => x.replace("'", "''")
        wf = wf.withColumn("s",
          expr(s"replace(s, ' ${q(pair)} ', ' ${q(merged)} ')"))
      }
    }
    (merges.result().toDF("round", "pair", "merged", "cnt")
      .withColumn("round", col("round").cast("bigint"))
      .orderBy("round"), wf0)
  }

  // The oracle unrolls the same four rounds as a CTE chain: pair
  // counts -> top-1 (count desc, pair asc) -> replace applied to every
  // word, each round reading the previous round's word table.
  private def roundSql(i: Int): String = {
    val prev = if (i == 1) "w0" else s"w${i - 1}"
    s"""c$i AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT freq, unnest(list_transform(range(len(syms) - 1),
          j -> syms[j+1] || ' ' || syms[j+2])) AS pair
        FROM (SELECT freq, string_split(trim(s), ' ') AS syms FROM $prev)
        WHERE len(syms) >= 2) GROUP BY pair),
      t$i AS (SELECT pair, replace(pair, ' ', '') AS merged, cnt
        FROM c$i ORDER BY cnt DESC, pair LIMIT 1),
      w$i AS (SELECT w, freq,
          replace(s, ' ' || pair || ' ', ' ' || merged || ' ') AS s
        FROM $prev CROSS JOIN t$i)"""
  }

  private val bpe01 = QueryDef(
    "bpe01_bpe_merges",
    (s, dir) => bpeMerges(s, Tables(s, dir).documents),
    Some(s"""WITH tok AS (SELECT unnest(${OracleSql.Toks}) AS w FROM documents),
      w0 AS (SELECT w, COUNT(*) AS freq,
          ' ' || array_to_string(list_transform(range(len(w)), i -> w[i+1]), ' ') || ' ' AS s
        FROM tok GROUP BY w),
      ${(1 to 4).map(roundSql).mkString(",\n      ")}
      SELECT * FROM (
        SELECT 1::BIGINT AS round, pair, merged, cnt FROM t1
        UNION ALL SELECT 2, pair, merged, cnt FROM t2
        UNION ALL SELECT 3, pair, merged, cnt FROM t3
        UNION ALL SELECT 4, pair, merged, cnt FROM t4)
      ORDER BY round"""),
  )

  /** Encode the corpus with the merges [[bpeMerges]] trained — the
    * tokenize-with-learned-vocab pass that follows trainer rounds in a
    * real pipeline. Per document: BPE token count, whitespace token
    * count, and the compression ratio the learned merges achieve.
    *
    * 100 TB shape: merges apply to the DISTINCT-WORD table (Zipf-
    * compact, vocab-sized — never the corpus), which then broadcasts
    * back onto the per-doc token counts; the corpus-side cost is one
    * explode + hash aggregation + broadcast join, all linear.
    */
  def bpeEncode(spark: SparkSession, docs: DataFrame, rounds: Int = 4): DataFrame = {
    val (mergesDf, wf0) = trainMerges(spark, docs, rounds)
    val trained = mergesDf
      .select("pair", "merged").collect() // bounded: `rounds` rows
    val toks = graft.functions.TextExpressions.tokens(col("text"))
    val q = (x: String) => x.replace("'", "''")
    // The persisted training word table IS the distinct-word table with
    // the fresh sentinel spelling (groupBy("w") == distinct on the
    // exploded words; `s` is built by the same expression) — replay the
    // merge chain over it instead of re-deriving the vocabulary from
    // the corpus, and materialize the vocab-sized result eagerly so the
    // persist can be released before the corpus-side aggregation runs.
    val words = trained.foldLeft(wf0.select(col("w"), col("s"))) { (df, m) =>
      df.withColumn("s",
        expr(s"replace(s, ' ${q(m.getString(0))} ', ' ${q(m.getString(1))} ')"))
    }.select(col("w"), size(split(trim(col("s")), " ")).cast("bigint").as("n_syms"))
      .localCheckpoint(eager = true)
    wf0.unpersist(blocking = false)
    docs.select(col("doc_id"), explode(toks).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .join(broadcast(words), "w")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("n_syms")).as("n_bpe_tokens"))
      // fertility = BPE tokens emitted per whitespace word (the
      // tokenizer-quality metric); exact longs, one IEEE division
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_tokens"))
      .orderBy("doc_id")
  }

  private val bpe02 = QueryDef(
    "bpe02_bpe_encode",
    (s, dir) => bpeEncode(s, Tables(s, dir).documents),
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${OracleSql.Toks}) AS w FROM documents),
      w0 AS (SELECT w, COUNT(*) AS freq,
          ' ' || array_to_string(list_transform(range(len(w)), i -> w[i+1]), ' ') || ' ' AS s
        FROM (SELECT w FROM tok) GROUP BY w),
      ${(1 to 4).map(roundSql).mkString(",\n      ")},
      wl AS (SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_syms FROM w4),
      dc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM tok GROUP BY doc_id, w)
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        CAST(SUM(cnt * n_syms) AS BIGINT) AS n_bpe_tokens,
        CAST(SUM(cnt * n_syms) AS DOUBLE) / SUM(cnt) AS fertility
      FROM dc JOIN wl USING (w)
      GROUP BY doc_id ORDER BY doc_id"""),
  )

  val defs: Seq[QueryDef] = Seq(bpe01, bpe02)
}
