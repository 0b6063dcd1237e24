package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.TextExpressions
import graft.sources.Tables

/** End-to-end training-data curation: the composition every LLM data
  * pipeline runs, built from this library's operators —
  *
  *   quality filter → language filter → exact dedup → near-dup
  *   removal (MinHash LSH pairs → connected components → canonical
  *   retention) → optional benchmark decontamination (bloom prefilter
  *   + exact shingle-overlap verify) → per-stage accounting.
  *
  * Everything stays a lazy DataFrame graph until the caller acts; the
  * per-stage accounting is computed at the end. Each stage is the
  * already-scale-shaped operator (bucket-keyed candidate generation,
  * one-traversal expressions), so the composition inherits linear
  * scaling.
  */
object CurationPipeline {

  final case class Config(
      minTokens: Int = 20,
      maxTokens: Int = 100000,
      minDistinctRatio: Double = 0.3,
      langs: Set[String] = Set("en"),
      nearDupThreshold: Double = 0.8,
      minSharedShingles: Int = 3,
  )

  final case class StageCounts(input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, afterNearDup: Long, afterDecontam: Long)

  /** `release()` unpersists the cached exact-dedup survivors once the
    * caller has materialized (or abandoned) `corpus` — the corpus plan
    * remains valid afterwards, it just recomputes if re-used.
    *
    * `splits` (when requested) carries (doc_id, cluster_id, split) for
    * the final corpus, keyed on near-dup CLUSTER hashes
    * ([[Dedup.leakageSafeSplit]]): hashing the cluster id (not the doc
    * id) guarantees two near-duplicates never straddle a split within
    * ONE run, and keeps assignment stable across reruns for docs whose
    * component (hence its minimum id) is unchanged. It is NOT invariant
    * to arbitrary dedup reconfiguration: changing the near-dup
    * threshold can change component membership, which moves a doc's
    * cluster_id and hence its split — canonical docs (cluster_id ==
    * own id) are the stable ones.
    */
  final case class Result(corpus: DataFrame, counts: StageCounts,
      release: () => Unit = () => (),
      splits: Option[DataFrame] = None)

  /** Stopword-profile argmax (same heuristic as txt03); a doc passes
    * if its best-scoring language is in the accepted set.
    */
  private def langPred(toks: Column, langs: Set[String]): Column = {
    val scores = Map(
      "en" -> TextExpressions.stopword_count(toks, Seq("the", "a", "and", "of", "to", "in", "is")),
      "de" -> TextExpressions.stopword_count(toks, Seq("der", "die", "das", "und", "ist", "nicht")),
      "fr" -> TextExpressions.stopword_count(toks, Seq("le", "la", "les", "et", "est", "une")),
      "es" -> TextExpressions.stopword_count(toks, Seq("el", "los", "las", "y", "es", "una")))
    val pred =
      when(scores("en") >= scores("de") && scores("en") >= scores("fr") &&
        scores("en") >= scores("es") && scores("en") > 0, "en")
        .when(scores("de") >= scores("fr") && scores("de") >= scores("es") &&
          scores("de") > 0, "de")
        .when(scores("fr") >= scores("es") && scores("fr") > 0, "fr")
        .when(scores("es") > 0, "es")
        .otherwise("unknown")
    pred.isin(langs.toSeq: _*)
  }

  /** The per-doc quality signals both pipeline shapes share — one copy
    * so the incremental path cannot drift from curate()'s stages.
    */
  private def withSignals(docs: DataFrame): DataFrame = docs
    .withColumn("toks", TextExpressions.tokens(col("text")))
    .withColumn("n_tokens", size(col("toks")))
    .withColumn("distinct_ratio",
      size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))

  private def qualityPred(cfg: Config): Column =
    col("n_tokens") >= cfg.minTokens && col("n_tokens") <= cfg.maxTokens &&
      col("distinct_ratio") >= cfg.minDistinctRatio

  /** Run the full curation pass over a (doc_id, text) corpus.
    *
    * `benchmark`, when given, appends a decontamination stage: any
    * surviving document sharing ≥ `cfg.minSharedShingles` distinct word
    * 3-shingles with a benchmark document is removed (bloom prefilter
    * sized to the eval set, exact broadcast-join verify — the dc02
    * shape). Without it, `afterDecontam == afterNearDup`.
    *
    * Stage accounting is single-pass: the pass-through stage counts
    * (input / quality / language) are `observe()` metrics collected as
    * a side effect of computing `exactKeep`, which is cached — so the
    * corpus is read and filtered ONCE, the near-dup stage and final
    * retention reuse the cached survivors, and no `count()` action
    * re-runs an upstream stage (the round-1 version recomputed the
    * lineage up to 5x). The cache stays alive for `corpus` reuse;
    * call `Result.release()` when done with it.
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
      benchmark: Option[DataFrame] = None, assignSplits: Boolean = false): Result = {
    val obsInput = org.apache.spark.sql.Observation()
    val obsQuality = org.apache.spark.sql.Observation()
    val obsLang = org.apache.spark.sql.Observation()

    val base = withSignals(docs.select(col("doc_id"), col("text"))
      .observe(obsInput, count(lit(1)).as("n")))

    val quality = base.filter(qualityPred(cfg))
      .observe(obsQuality, count(lit(1)).as("n"))

    val lang = quality.filter(langPred(col("toks"), cfg.langs))
      .observe(obsLang, count(lit(1)).as("n"))

    // exact dedup: keep the smallest doc_id per content hash
    val exactKeep = lang
      .withColumn("_h", md5(col("text").cast("binary")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_h")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
      .drop("_h", "_rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ONE action computes the whole filter chain, fills the three
    // observations, and populates the cache
    val afterExact = exactKeep.count()

    // near-dup removal over the (cached) survivors. The cluster map is
    // computed ONCE and shared by retention and (optional) split
    // assignment — two independently-clustered maps could disagree on
    // a slow-converging component and silently break the same-cluster-
    // same-split guarantee.
    val pairs = Dedup.minhashPairs(
      exactKeep.select("doc_id", "text"), threshold = cfg.nearDupThreshold)
    val clusters = Dedup.clusterPairs(pairs, maxIters = 50)
    val retained = Dedup.retainCanonicalFromClusters(exactKeep, clusters)
      .select("doc_id", "text")

    // optional decontamination (dc02 shape). The retained corpus is
    // cached when the stage runs — it is read twice (shingle pass +
    // anti-join), and the near-dup chain above it must not recompute.
    val (finalCorpus, afterNearDup, afterDecontam, releaseRetained) = benchmark match {
      case None =>
        val c = retained.count()
        (retained, c, c, () => ())
      case Some(bench) =>
        val cached = retained.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val c = cached.count()
        val benchSh = bench
          .select(explode(TextExpressions.word_shingles(col("text"), 3)).as("sh"))
          .distinct()
        val bloom = benchSh.stat.bloomFilter("sh", 100000L, 0.01)
        val contaminatedIds = cached
          .select(col("doc_id"), explode(TextExpressions.word_shingles(col("text"), 3)).as("sh"))
          .filter(TextExpressions.bloom_might_contain(col("sh"), bloom))
          .join(broadcast(benchSh), "sh")
          .groupBy("doc_id")
          .agg(countDistinct(col("sh")).as("n_shared"))
          .filter(col("n_shared") >= cfg.minSharedShingles)
          .select("doc_id")
        val clean = cached.join(contaminatedIds, Seq("doc_id"), "left_anti")
        (clean, c, clean.count(), () => { cached.unpersist(blocking = false); () })
    }

    def n(o: org.apache.spark.sql.Observation): Long =
      o.get("n").asInstanceOf[Long]
    val counts = StageCounts(
      input = n(obsInput),
      afterQuality = n(obsQuality),
      afterLang = n(obsLang),
      afterExact = afterExact,
      afterNearDup = afterNearDup,
      afterDecontam = afterDecontam)
    val splits =
      if (assignSplits) Some(Dedup.splitFromClusters(finalCorpus.select("doc_id"), clusters))
      else None
    Result(finalCorpus, counts,
      () => { exactKeep.unpersist(blocking = false); releaseRetained() },
      splits)
  }

  /** INCREMENTAL curation — the way a 100 TB pipeline actually runs:
    * batches arrive, previously-landed work is NEVER recomputed, and
    * the maintained corpus must equal what a from-scratch run over
    * everything would produce. Stages per batch: quality + language
    * gate (per-row, trivially incremental) → exact dedup against the
    * landed digest state (bloom-prefiltered anti-join, dd12) and
    * within the batch → near-dup drop against the PERSISTED LSH index
    * (dd16's probe — history is never re-shingled) and within the
    * batch → append the batch's survivors... with retention policy
    * chosen for PREFIX-STABILITY: a doc is dropped iff it near-dups
    * ANY smaller-id exact-survivor ("smallest-id-neighbor" retention).
    * Component-minimum retention (curate()'s policy) is NOT online-
    * maintainable — a later batch can bridge two components and
    * retro-change the minimum, forcing a rewrite of landed data;
    * dropping against smaller ids only needs history + batch pairs,
    * both of which the index gives per batch. The contract that makes
    * this sound is APPEND-ONLY ids (a later batch never introduces a
    * smaller id) — exactly the monotone-key contract of real ingestion.
    *
    * Equality caveat (documented, spec-asserted at test scale): the
    * LSH maxBucket degenerate-bucket cap counts per-run bucket sizes,
    * so a bucket saturating only in the COMBINED corpus could differ
    * between the split and from-scratch runs — at the declared scale
    * no bucket approaches the cap, and the cap exists to bound
    * boilerplate blowup, not semantics.
    *
    * The cp02 oracle replays the FROM-SCRATCH run relationally; a hash
    * match therefore proves the incremental machinery (digest state,
    * persisted index, per-batch probes) changes nothing.
    */
  def curateIncremental(docs: DataFrame, cfg: Config = Config(),
      splitAt: Option[Long] = None): DataFrame = {
    val s = docs.sparkSession
    val W = org.apache.spark.sql.expressions.Window
    // arrival split at the id-space midpoint (or the caller's boundary
    // — the output must be split-invariant) — bounded collect: 1 row
    val k = splitAt.getOrElse(
      docs.select((count(lit(1)) / 2).cast("bigint").as("k")).head.getLong(0))
    def ql(b: DataFrame): DataFrame =
      withSignals(b.select(col("doc_id"), col("text")))
        .filter(qualityPred(cfg))
        .filter(langPred(col("toks"), cfg.langs))
        .select(col("doc_id"), col("text"), col("n_tokens"))
    def keepMin(b: DataFrame): DataFrame = b
      .withColumn("_h", md5(col("text").cast("binary")))
      .withColumn("_rn", row_number().over(
        W.partitionBy(col("_h")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_h", "_rn")
    // Per-batch drop set in ONE index probe with ZERO recomputation:
    // after the batch's rows are appended, probing the NEWEST committed
    // batch (its stored bands + shingles — probeNewestIndexBatch)
    // against the index yields every pair (batch doc, smaller indexed
    // doc) — cross-batch pairs (history ids are all smaller under the
    // append-only contract) AND within-batch pairs (both orders come
    // back; batch_id > hist_id keeps each once). The batch is
    // tokenized/shingled exactly ONCE per batch — at append — and the
    // history side is only ever READ from the stored tables. maxBucket
    // counts history-side buckets over everything appended so far,
    // matching the oracle's whole-corpus bucket cap.
    def dropSet(path: String): DataFrame =
      Dedup.probeNewestIndexBatch(s, path, cfg.nearDupThreshold)
        .filter(col("batch_id") > col("hist_id"))
        .select(col("batch_id").as("doc_id")).distinct()
    // ---- batch 1 lands: filter, exact-dedup, persist the index state
    val e1 = keepMin(ql(docs.filter(col("doc_id") < k)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val path = java.nio.file.Files.createTempDirectory("graft_cp02_index").toString
    Dedup.saveNearDupIndex(e1.select("doc_id", "text"), path)
    val r1 = e1.join(dropSet(path), Seq("doc_id"), "left_anti")
    // ---- batch 2 arrives: history is only ever PROBED, never rebuilt
    val ql2 = ql(docs.filter(col("doc_id") >= k))
    val exactSurv = Dedup.incrementalExactSurvivors(
      e1.select("doc_id", "text"), ql2.select("doc_id", "text")).select("doc_id")
    val e2 = keepMin(ql2.join(exactSurv, "doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.appendNearDupIndex(e2.select("doc_id", "text"), path)
    val r2 = e2.join(dropSet(path), Seq("doc_id"), "left_anti")
    // materialize before releasing the caches and the on-disk index
    val out = r1.unionByName(r2)
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"))
      .orderBy("doc_id")
      .localCheckpoint(eager = true)
    e1.unpersist(blocking = false); e2.unpersist(blocking = false)
    try graft.ingest.FileUtils.delete(path, recursive = true): Unit
    catch { case _: Throwable => () }
    out
  }

  // -------------------------------------------------------------- cp02
  // Incremental-equals-from-scratch CORRECTNESS row: curateIncremental
  // runs the two-batch incremental pipeline (digest state, persisted
  // LSH index probe, per-batch local dedup) and the oracle replays the
  // ONE-SHOT pipeline over the whole corpus — quality gate, exact
  // keep-min, the full dd02 signature/band/verify pair set, and
  // smallest-id-neighbor retention (drop every doc_b of a qualifying
  // pair). Threshold 0.5 as in cp01 so near-dup stages are non-vacuous.
  private lazy val cp02 = QueryDef(
    "cp02_incremental_curation",
    (s, dir) => curateIncremental(
      Tables(s, dir).documents.select(col("doc_id"), col("text")),
      Config(nearDupThreshold = 0.5)),
    Some(s"""WITH
      t AS (SELECT doc_id, text, ${OracleSql.Toks} AS toks FROM documents),
      q AS (SELECT doc_id, text, toks FROM t
        WHERE len(toks) >= 20 AND len(toks) <= 100000
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3),
      lg AS (SELECT doc_id, text, toks,
          len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS s_en,
          len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist', 'nicht'))) AS s_de,
          len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et', 'est', 'une'))) AS s_fr,
          len(list_filter(toks, x -> x IN ('el', 'los', 'las', 'y', 'es', 'una'))) AS s_es
        FROM q),
      l AS (SELECT doc_id, text, toks FROM lg
        WHERE s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0),
      x AS (SELECT doc_id, text, toks FROM l
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      g AS (SELECT doc_id, ${OracleSql.Shingles3} AS shingles FROM x),
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      hh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM e),
      sig AS (SELECT doc_id, j,
          MIN(((1337 * j + 17) * h + 7919 * j + 31) % 2147483647) AS m
        FROM hh, range(32) r(j) GROUP BY doc_id, j),
      band AS (SELECT doc_id, j // 2 AS band,
          ((MAX(CASE WHEN j % 2 = 0 THEN m END) % 2147483629) * 1000003
            + MAX(CASE WHEN j % 2 = 1 THEN m END)) % 2147483629 AS bh
        FROM sig GROUP BY doc_id, j // 2),
      bc AS (SELECT band, bh, COUNT(*) AS n FROM band GROUP BY band, bh),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM band a
        JOIN band b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        JOIN bc ON bc.band = a.band AND bc.bh = a.bh
        WHERE bc.n <= 1000),
      p AS (SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN g ga ON ga.doc_id = c.doc_a
        JOIN g gb ON gb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(ga.shingles, gb.shingles)) AS DOUBLE) /
            len(list_distinct(list_concat(ga.shingles, gb.shingles))) >= 0.5),
      drops AS (SELECT DISTINCT doc_b FROM p)
      SELECT x.doc_id, CAST(len(x.toks) AS BIGINT) AS n_tokens
      FROM x LEFT JOIN drops d ON d.doc_b = x.doc_id
      WHERE d.doc_b IS NULL
      ORDER BY x.doc_id"""),
  )

  // -------------------------------------------------------------- cp01
  // End-to-end curation CORRECTNESS row: the full composed pipeline —
  // quality filter → language filter → exact dedup → MinHash-LSH
  // near-dup clustering → canonical retention → leakage-safe split —
  // run as ONE curate() call, hash-matched against DuckDB replaying
  // every stage relationally. Each fragment is individually proven
  // (qf01's token arithmetic, dd01's md5 keep-min, dd02's full
  // signature/band/verify pipeline, dd07's recursive closure, spl01's
  // cluster-hash split); this row certifies their COMPOSITION — stage
  // ordering, the shared cluster map, and retention-vs-split
  // consistency. Threshold 0.5 (not the 0.8 default) so the near-dup
  // stage is exercised by the synthetic corpus (non-vacuous clusters).
  private val cp01 = QueryDef(
    "cp01_full_curation",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val r = curate(docs, Config(nearDupThreshold = 0.5), benchmark = None,
        assignSplits = true)
      // splits is (doc_id, cluster_id, split) for the final corpus,
      // already totally ordered; the persisted survivors stay cached
      // for the result's lifetime (LRU — next curate() replaces them)
      r.splits.get
    },
    Some(s"""WITH RECURSIVE
      t AS (SELECT doc_id, text, ${OracleSql.Toks} AS toks FROM documents),
      q AS (SELECT doc_id, text, toks FROM t
        WHERE len(toks) >= 20 AND len(toks) <= 100000
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3),
      lg AS (SELECT doc_id, text, toks,
          len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS s_en,
          len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist', 'nicht'))) AS s_de,
          len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et', 'est', 'une'))) AS s_fr,
          len(list_filter(toks, x -> x IN ('el', 'los', 'las', 'y', 'es', 'una'))) AS s_es
        FROM q),
      l AS (SELECT doc_id, text, toks FROM lg
        WHERE s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0),
      x AS (SELECT doc_id, toks FROM l
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      g AS (SELECT doc_id, ${OracleSql.Shingles3} AS shingles FROM x),
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      hh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM e),
      sig AS (SELECT doc_id, j,
          MIN(((1337 * j + 17) * h + 7919 * j + 31) % 2147483647) AS m
        FROM hh, range(32) r(j) GROUP BY doc_id, j),
      band AS (SELECT doc_id, j // 2 AS band,
          ((MAX(CASE WHEN j % 2 = 0 THEN m END) % 2147483629) * 1000003
            + MAX(CASE WHEN j % 2 = 1 THEN m END)) % 2147483629 AS bh
        FROM sig GROUP BY doc_id, j // 2),
      bc AS (SELECT band, bh, COUNT(*) AS n FROM band GROUP BY band, bh),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM band a
        JOIN band b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        JOIN bc ON bc.band = a.band AND bc.bh = a.bh
        WHERE bc.n <= 1000),
      p AS (SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN g ga ON ga.doc_id = c.doc_a
        JOIN g gb ON gb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(ga.shingles, gb.shingles)) AS DOUBLE) /
            len(list_distinct(list_concat(ga.shingles, gb.shingles))) >= 0.5),
      ed AS (SELECT doc_a AS a, doc_b AS b FROM p
        UNION SELECT doc_b, doc_a FROM p),
      reach(a, b) AS (
        SELECT a, a FROM ed
        UNION
        SELECT r.a, ed.b FROM reach r JOIN ed ON ed.a = r.b),
      cl AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
      retained AS (SELECT x.doc_id FROM x LEFT JOIN cl USING (doc_id)
        WHERE cl.cluster_id IS NULL OR cl.cluster_id = x.doc_id),
      sp AS (SELECT r.doc_id,
          COALESCE(cl.cluster_id, r.doc_id) AS cluster_id,
          substring(md5('spl:' || CAST(COALESCE(cl.cluster_id, r.doc_id) AS VARCHAR)), 1, 2) AS hx
        FROM retained r LEFT JOIN cl USING (doc_id))
      SELECT doc_id, cluster_id,
        CASE WHEN hx < '1a' THEN 'test'
             WHEN hx < '34' THEN 'val'
             ELSE 'train' END AS split
      FROM sp ORDER BY doc_id"""),
  )

  val defs: Seq[QueryDef] = Seq(cp01, cp02)
}
