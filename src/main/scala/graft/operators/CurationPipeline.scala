package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

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

    val base = docs.select(col("doc_id"), col("text"))
      .observe(obsInput, count(lit(1)).as("n"))
      .withColumn("toks", TextExpressions.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))

    val quality = base.filter(
      col("n_tokens") >= cfg.minTokens && col("n_tokens") <= cfg.maxTokens &&
        col("distinct_ratio") >= cfg.minDistinctRatio)
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
}
