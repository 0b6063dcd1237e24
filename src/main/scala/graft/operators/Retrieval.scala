package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.VectorFunctions.{asDouble, cosine}
import graft.sources.Tables

/** Retrieval composition — the operators a training-data pipeline runs
  * ON TOP of its lexical (BM25, txt10) and dense (cosine, sim01)
  * rankers to pick what actually enters a curated set or a RAG
  * context:
  *
  *  - hybrid reciprocal-rank fusion (hyb01) — Cormack et al. 2009's
  *    RRF, the standard way to combine a keyword leg and a vector leg
  *    without score calibration: fused = Σ_legs 1/(K + rank), K = 60.
  *  - maximal marginal relevance (mmr01) — Carbonell & Goldstein 1998:
  *    greedy selection maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s),
  *    the diversity re-rank that keeps near-duplicate passages from
  *    crowding a context window (the retrieval-time cousin of the
  *    dedup family's corpus-time guarantees).
  *
  * Scale shape: both operators consume the top-k OUTPUT of the
  * rankers, never the corpus — the legs do the heavy work with their
  * proven plans (BM25's TakeOrderedAndProject; the dense leg's
  * broadcast-query scan, or the persisted IVF-PQ index at deployment
  * scale), and fusion/diversification touch ≤ k + k rows. MMR is
  * inherently sequential-greedy, so its step loop runs on the driver
  * over the BOUNDED pool (≤ pool rel rows + pool² pair sims collected,
  * both annotated) — exactly how a production reranker treats its
  * candidate window.
  */
object Retrieval {

  /** Hybrid retrieval by reciprocal-rank fusion: the BM25 top-kLeg for
    * `terms` fused with the cosine top-kLeg for the query vector
    * (vec_id = `queryVec`), fused score = Σ 1/(rrfK + rank) with a
    * missing leg contributing 0 — rank-only fusion, so the two legs'
    * incomparable score scales never need calibration. Output keeps
    * each leg's rank for attribution (NULL = not in that leg's top-k).
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVec: Long = 0L, kLeg: Int = 20, kOut: Int = 10,
      rrfK: Int = 60): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVec)
      .select(asDouble(col("embedding")).as("qv"))
    val den = emb.filter(col("vec_id") =!= queryVec)
      .select(col("vec_id").cast("long").as("doc_id"),
        asDouble(col("embedding")).as("cv"))
      .crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .orderBy(col("sim").desc, col("doc_id")).limit(kLeg)
      // rank over the already-LIMITed kLeg rows — bounded window
      .withColumn("vec_rn", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id"))).cast("bigint"))
      .select("doc_id", "vec_rn")
    rrfFuse(lexLeg(docs, terms, kLeg), den, kOut, rrfK)
  }

  /** [[hybridRrf]] with the dense leg served from a PERSISTED vector
    * index (VectorIndex.probeVectorIndexRefined: stored-code ADC
    * candidate nomination + exact cosine refine) instead of a raw
    * corpus rescan — the build-once-probe-forever shape a deployed
    * retrieval stack runs. At nProbe = nCells the refined leg IS the
    * brute cosine ranking, so the fused output exactly matches
    * [[hybridRrf]] (hyb02 shares hyb01's oracle — the sim10 endpoint
    * pattern); at deployment nProbe the leg touches only probed cells.
    */
  def hybridRrfIndexed(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      indexPath: String, queryVec: Long = 0L, kLeg: Int = 20,
      kOut: Int = 10, rrfK: Int = 60, nProbe: Int = 16): DataFrame = {
    val den = VectorIndex.probeVectorIndexRefined(docs.sparkSession,
        indexPath, emb.filter(col("vec_id") === queryVec), emb,
        k = kLeg, nProbe = nProbe)
      .select(col("cid").as("doc_id"), col("rn").as("vec_rn"))
    rrfFuse(lexLeg(docs, terms, kLeg), den, kOut, rrfK)
  }

  private def lexLeg(docs: DataFrame, terms: Seq[String], kLeg: Int): DataFrame =
    Text.bm25TopK(docs, terms, kLeg)
      .select(col("doc_id"), col("rn").as("lex_rn"))

  // shared fusion tail: both hybrids run the SAME full-outer union and
  // 1/(K + rank) arithmetic, so swapping the dense leg's source cannot
  // change the fusion semantics
  private def rrfFuse(lex: DataFrame, den: DataFrame, kOut: Int,
      rrfK: Int): DataFrame = {
    val fused = lex.join(den, Seq("doc_id"), "full_outer")
      // fixed add order (lex + dense): bit-deterministic cross-engine
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rn")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rn")), lit(0.0)))
    fused.orderBy(col("rrf").desc, col("doc_id")).limit(kOut)
      // bounded window again: kOut rows
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))).cast("bigint"))
      .select("doc_id", "rrf", "lex_rn", "vec_rn", "rn")
      .orderBy("rn")
  }

  /** MMR diversification of the dense top-`pool` for query vector
    * `queryVec`: k greedy steps, each picking the candidate maximizing
    * λ·rel(c) − μ·max_{s∈selected} sim(c, s) (ties to the smaller
    * id; an empty selection contributes 0 diversity penalty). The
    * relevance scan and the pool's pairwise sims are computed
    * DISTRIBUTED; only the bounded pool (≤ pool rel rows, ≤ pool²
    * pair-sim rows) reaches the driver for the inherently sequential
    * greedy loop.
    */
  def mmrDiversify(emb: DataFrame, queryVec: Long = 0L,
      lambda: Double = 0.7, mu: Double = 0.3, pool: Int = 20,
      k: Int = 5): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val q = emb.filter(col("vec_id") === queryVec)
      .select(asDouble(col("embedding")).as("qv"))
    val cand = emb.filter(col("vec_id") =!= queryVec)
      .select(col("vec_id").cast("long").as("cid"),
        asDouble(col("embedding")).as("cv"))
    val poolDf = cand.crossJoin(broadcast(q))
      .withColumn("rel", cosine(col("qv"), col("cv")))
      .orderBy(col("rel").desc, col("cid")).limit(pool)
      .select("cid", "rel", "cv")
      .localCheckpoint(eager = true) // pin the pool before reuse x3
    // bounded collects: ≤ pool rel rows, ≤ pool·(pool−1) pair sims
    val rel = poolDf.select("cid", "rel").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = poolDf.select(col("cid").as("a"), col("cv").as("av"))
    val b = poolDf.select(col("cid").as("b"), col("cv").as("bv"))
    val simOf = a.join(b, col("a") =!= col("b"))
      .withColumn("sim", cosine(col("av"), col("bv")))
      .select("a", "b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    var selected = Vector.empty[(Int, Long, Double)] // (step, cid, mmr)
    var remaining = rel.keySet.toVector.sorted
    for (step <- 1 to math.min(k, remaining.size)) {
      val scored = remaining.map { c =>
        val ms = if (selected.isEmpty) 0.0
          else selected.map(t => simOf((c, t._2))).max
        // the exact double sequence the oracle replays: λ·rel − μ·ms.
        // μ is an EXPLICIT weight, not computed as 1−λ: 1.0−0.7 is one
        // ulp above the 0.3 literal the oracle multiplies by, and an
        // argmax decided inside that ulp would silently diverge
        (c, lambda * rel(c) - mu * ms)
      }
      val (bestC, bestS) = scored.reduceLeft { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x
      }
      selected :+= ((step, bestC, bestS))
      remaining = remaining.filterNot(_ == bestC)
    }
    selected.map { case (st, c, m) => (st.toLong, c, m) }
      .toDF("step", "doc_id", "mmr")
      .orderBy("step")
  }

  /** Retrieval-quality EVALUATION — MRR, nDCG@k, recall@k of a ranked
    * run against binary relevance judgments: the measurement loop every
    * retrieval deployment closes before it trusts a ranker (and the
    * gate a training-data pipeline puts on its retrieval-augmented
    * curation). Run = the dense cosine top-k (Similarity.bruteTopK);
    * qrels = label match (a candidate is relevant iff it shares the
    * query's label — the same pseudo-judgment sim08/sim15 filter on).
    *
    * Determinism: MRR is max(1/rn) over relevant rows (order-free);
    * DCG folds rel/log2(rn+1) in rank order via a sorted-array
    * aggregate (collect_list order is not deterministic, the
    * array_sort is), mirroring the oracle's list(... ORDER BY rn);
    * IDCG folds 1/log2(i+1) over i = 1..min(n_rel, k); log2 is spelled
    * ln(x)/ln(2) in BOTH engines (the hllSql linear-counting ln parity
    * precedent). Scale shape: the run is k·nQueries rows, qrels sizes
    * come from one label-count aggregation — evaluation never rescans
    * the corpus beyond the ranker itself.
    */
  def retrievalMetrics(emb: DataFrame, nQueries: Int = 3, k: Int = 10): DataFrame =
    runMetrics(
      Similarity.bruteTopK(emb, nQueries, k)
        .select(col("qid").cast("long").as("qid"),
          col("cid").cast("long").as("cid"), col("rn")),
      emb, nQueries, k)
      .orderBy("qid")

  /** The metric kernel over an ARBITRARY ranked run (qid, cid, rn ≤ k)
    * — shared by ir01 (the dense run) and ir02 (ranker comparison), so
    * two rankers can never be scored by subtly different arithmetic.
    * A run row whose cid has no embedding (possible for fused runs
    * mixing id spaces) is dropped by the inner label join — exactly
    * equivalent to rel = 0 for every metric here (it contributes 0 to
    * DCG/MRR/rel_ret, and recall's denominator comes from the qrels).
    */
  private def runMetrics(run: DataFrame, emb: DataFrame,
      nQueries: Int, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long").as("qid"), col("label").as("qlabel"))
    val others = emb.select(col("vec_id").cast("long").as("oid"),
      col("label").as("olabel"))
    // LEFT join + count(non-null): a query whose label is unique in
    // the corpus must land an n_rel = 0 row (and the 0.0-metric
    // output), not silently vanish from the table
    val nRel = q.join(others,
        col("olabel") === col("qlabel") && col("oid") =!= col("qid"), "left")
      .groupBy("qid").agg(count(col("oid")).as("n_rel"))
    val judged = run
      .join(broadcast(q), "qid")
      .join(others, col("cid") === col("oid"))
      .withColumn("rel", (col("olabel") === col("qlabel")).cast("int"))
    val term = col("rel").cast("double") /
      (log(col("rn").cast("double") + 1) / log(lit(2.0)))
    val agg = judged.withColumn("term", term)
      .groupBy("qid")
      .agg(
        coalesce(max(when(col("rel") === 1,
          lit(1.0) / col("rn").cast("double"))), lit(0.0)).as("mrr"),
        // rank-ascending fold — deterministic despite collect_list
        expr("aggregate(transform(array_sort(collect_list(struct(rn, term)))," +
          " x -> x.term), 0D, (a, x) -> a + x)").as("dcg"),
        sum(col("rel")).cast("bigint").as("rel_ret"))
    nRel.join(agg, "qid")
      .withColumn("m", least(col("n_rel"), lit(k.toLong)))
      .withColumn("idcg", expr(
        "aggregate(transform(sequence(1L, m)," +
          " i -> 1.0D / (ln(cast(i + 1 as double)) / ln(2.0D)))," +
          " 0D, (a, x) -> a + x)"))
      .select(col("qid"), col("n_rel").cast("bigint").as("n_rel"), col("mrr"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("dcg") / col("idcg")).as("ndcg_at_k"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("rel_ret").cast("double") / col("n_rel"))
          .as("recall_at_k"))
  }

  /** Ranker COMPARISON under the shared metric kernel — the A/B every
    * retrieval deployment runs before switching rankers: the hybrid
    * RRF run and the dense-only run for the same query, scored on the
    * same label qrels, one row per ranker. No winner is presumed —
    * the value is the measurement (here the qrels are embedding-label
    * match, which the lexical leg doesn't target, so dense usually
    * leads; swap in task qrels and the same query decides the ranker).
    */
  def fusionGain(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      k: Int = 10): DataFrame = {
    val dense = Similarity.bruteTopK(emb, 1, k)
      .select(col("qid").cast("long").as("qid"),
        col("cid").cast("long").as("cid"), col("rn"))
    val hybrid = hybridRrf(docs, emb, terms, kOut = k)
      .select(lit(0L).as("qid"), col("doc_id").cast("long").as("cid"),
        col("rn"))
    runMetrics(dense, emb, 1, k).withColumn("ranker", lit("dense"))
      .unionByName(
        runMetrics(hybrid, emb, 1, k).withColumn("ranker", lit("hybrid")))
      .select("ranker", "n_rel", "mrr", "ndcg_at_k", "recall_at_k")
      .orderBy("ranker")
  }

  // The oracle replays the run (sim01's cosine CTE shape), the label
  // qrels, and every metric's exact arithmetic — rank-ordered DCG fold,
  // min(n_rel, k)-term ideal, reciprocal-rank max — so a hash match
  // certifies the measurement, not just the ranking under it.
  private val ir01 = QueryDef(
    "ir01_retrieval_metrics",
    (s, dir) => retrievalMetrics(Tables(s, dir).embeddings),
    Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS qlabel
        FROM embeddings WHERE vec_id < 3),
      c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv, label AS clabel
        FROM embeddings),
      s AS (SELECT qid, qlabel, cid, clabel,
        list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2])) /
          (sqrt(list_sum(list_transform(qv, x -> x * x))) *
           sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
        FROM c, q WHERE qid <> cid),
      r AS (SELECT qid, qlabel, cid, clabel,
        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
        FROM s),
      run AS (SELECT qid, rn,
          CASE WHEN clabel = qlabel THEN 1 ELSE 0 END AS rel
        FROM r WHERE rn <= 10),
      nr AS (SELECT q.qid, CAST(COUNT(c.cid) AS BIGINT) AS n_rel
        FROM q LEFT JOIN c ON c.clabel = q.qlabel AND c.cid <> q.qid
        GROUP BY q.qid),
      agg AS (SELECT qid,
          COALESCE(MAX(CASE WHEN rel = 1
            THEN CAST(1 AS DOUBLE) / CAST(rn AS DOUBLE) END), CAST(0 AS DOUBLE)) AS mrr,
          list_sum(list(CAST(rel AS DOUBLE) /
            (ln(CAST(rn + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) ORDER BY rn)) AS dcg,
          CAST(SUM(rel) AS BIGINT) AS rel_ret
        FROM run GROUP BY qid)
      SELECT nr.qid, nr.n_rel, agg.mrr,
        CASE WHEN nr.n_rel = 0 THEN CAST(0 AS DOUBLE)
          ELSE agg.dcg / list_sum(list_transform(
            range(CASE WHEN nr.n_rel < 10 THEN nr.n_rel ELSE 10 END),
            i -> CAST(1 AS DOUBLE) / (ln(CAST(i + 2 AS DOUBLE)) / ln(CAST(2 AS DOUBLE)))))
          END AS ndcg_at_k,
        CASE WHEN nr.n_rel = 0 THEN CAST(0 AS DOUBLE)
          ELSE CAST(agg.rel_ret AS DOUBLE) / nr.n_rel END AS recall_at_k
      FROM nr JOIN agg USING (qid) ORDER BY qid"""),
  )

  private val HybTerms = Seq("table", "scan", "stream")

  // The oracle extends hyb01's full replay (BM25 chain + dense leg +
  // fusion) with the metric arithmetic applied to BOTH runs — same
  // rank-ordered DCG fold, reciprocal-rank max, and min(n_rel, k)
  // ideal as ir01 — so a hash match certifies the comparison itself.
  private lazy val ir02 = QueryDef(
    "ir02_fusion_gain",
    (s, dir) =>
      fusionGain(Tables(s, dir).documents, Tables(s, dir).embeddings, HybTerms),
    hyb01.oracle.map { o =>
      val anchored =
        "SELECT doc_id, rrf, lex_rn, vec_rn, rn FROM fr WHERE rn <= 10 ORDER BY rn"
      require(o.contains(anchored), "hyb01 oracle final select moved")
      o.replace(anchored, """,
      qr AS (SELECT label AS qlabel FROM embeddings WHERE vec_id = 0),
      lbl AS (SELECT vec_id AS cid, label FROM embeddings),
      nrx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM lbl, qr
        WHERE lbl.label = qr.qlabel AND lbl.cid <> 0),
      bruns AS (
        SELECT 'dense' AS ranker, d.vec_rn AS rn,
          CASE WHEN l.label = qr.qlabel THEN 1 ELSE 0 END AS rel
        FROM den d JOIN lbl l ON l.cid = d.doc_id, qr
        WHERE d.vec_rn <= 10
        UNION ALL
        SELECT 'hybrid' AS ranker, fr.rn,
          CASE WHEN l.label = qr.qlabel THEN 1 ELSE 0 END AS rel
        FROM fr JOIN lbl l ON l.cid = fr.doc_id, qr
        WHERE fr.rn <= 10),
      bagg AS (SELECT ranker,
          COALESCE(MAX(CASE WHEN rel = 1
            THEN CAST(1 AS DOUBLE) / CAST(rn AS DOUBLE) END),
            CAST(0 AS DOUBLE)) AS mrr,
          list_sum(list(CAST(rel AS DOUBLE) /
            (ln(CAST(rn + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) ORDER BY rn)) AS dcg,
          CAST(SUM(rel) AS BIGINT) AS rel_ret
        FROM bruns GROUP BY ranker)
      SELECT bagg.ranker, nrx.n_rel, bagg.mrr,
        CASE WHEN nrx.n_rel = 0 THEN CAST(0 AS DOUBLE)
          ELSE bagg.dcg / list_sum(list_transform(
            range(CASE WHEN nrx.n_rel < 10 THEN nrx.n_rel ELSE 10 END),
            i -> CAST(1 AS DOUBLE) / (ln(CAST(i + 2 AS DOUBLE)) / ln(CAST(2 AS DOUBLE)))))
          END AS ndcg_at_k,
        CASE WHEN nrx.n_rel = 0 THEN CAST(0 AS DOUBLE)
          ELSE CAST(bagg.rel_ret AS DOUBLE) / nrx.n_rel END AS recall_at_k
      FROM bagg, nrx ORDER BY ranker""")
    },
  )

  // Fuses txt10's exact lexical ranking (shared oracle CTE chain) with
  // the dense cosine ranking; the oracle replays both legs and the
  // 1/(60+rank) fusion, so a hash match certifies leg ranks, the
  // full-outer union, and the fused ordering together.
  private val hyb01 = QueryDef(
    "hyb01_rrf_fusion",
    (s, dir) =>
      hybridRrf(Tables(s, dir).documents, Tables(s, dir).embeddings, HybTerms),
    Text.bm25Oracle.map { o =>
      val anchored = "SELECT doc_id, score_micro, rn FROM r WHERE rn <= 20 ORDER BY rn"
      require(o.contains(anchored), "txt10 oracle final select moved")
      o.replace(anchored, """,
      lex AS (SELECT doc_id, rn AS lex_rn FROM r WHERE rn <= 20),
      q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
        WHERE vec_id <> 0),
      ds AS (SELECT cid,
          list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2])) /
            (sqrt(list_sum(list_transform(qv, x -> x * x))) *
             sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
        FROM c, q),
      den AS (SELECT cid AS doc_id, vec_rn FROM (SELECT cid,
          CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, cid) AS BIGINT) AS vec_rn
        FROM ds) WHERE vec_rn <= 20),
      fused AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
          COALESCE(1.0 / (60 + l.lex_rn), 0.0)
            + COALESCE(1.0 / (60 + d.vec_rn), 0.0) AS rrf,
          l.lex_rn AS lex_rn, d.vec_rn AS vec_rn
        FROM lex l FULL OUTER JOIN den d ON d.doc_id = l.doc_id),
      fr AS (SELECT doc_id, rrf, lex_rn, vec_rn,
          CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rn
        FROM fused)
      SELECT doc_id, rrf, lex_rn, vec_rn, rn FROM fr WHERE rn <= 10 ORDER BY rn""")
    },
  )

  // The dense leg sourced from the persisted index at FULL nProbe:
  // candidate set = every non-self vector, refine = exact cosine, so
  // the fused ordering must be byte-identical to hyb01's — it shares
  // hyb01's oracle, proving the build-once index serves the hybrid
  // stack end to end (RetrievalSpec pins the reduced-nProbe behavior).
  private val hyb02 = QueryDef(
    "hyb02_rrf_index_fused",
    (s, dir) => {
      val t = Tables(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft_hyb02_vindex").toString
      try {
        VectorIndex.saveVectorIndex(t.embeddings, path)
        hybridRrfIndexed(t.documents, t.embeddings, HybTerms, path)
          .localCheckpoint(eager = true)
      } finally graft.ingest.FileUtils.rmr(path,
        s.sparkContext.hadoopConfiguration)
    },
    hyb01.oracle,
  )

  private def mmrStep(i: Int): String = {
    val prev = s"sel${i - 1}"
    s"""
      m$i AS (SELECT p.cid, p.rel, MAX(ps.sim) AS ms
        FROM pool p JOIN psim ps ON ps.a = p.cid JOIN $prev t ON ps.b = t.cid
        WHERE p.cid NOT IN (SELECT cid FROM $prev)
        GROUP BY p.cid, p.rel),
      s$i AS MATERIALIZED (SELECT cid, 0.7 * rel - 0.3 * ms AS mmr
        FROM m$i ORDER BY mmr DESC, cid LIMIT 1),
      sel$i AS MATERIALIZED (SELECT * FROM $prev
        UNION ALL SELECT cid, $i AS step, mmr FROM s$i)"""
  }

  // The oracle replays the greedy unrolled (5 steps, each CTE
  // MATERIALIZED — the gr04 lesson — and referenced a constant number
  // of times): pool = dense top-20, psim = its pairwise cosines, step
  // i = argmax of 0.7·rel − 0.3·max-sim-to-selected with ties to the
  // smaller id. Doubles match bit-for-bit because both engines run the
  // same cosine folds and the same two-multiply-one-subtract sequence.
  private val mmr01 = QueryDef(
    "mmr01_mmr_diversify",
    (s, dir) => mmrDiversify(Tables(s, dir).embeddings),
    Some(s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
        WHERE vec_id <> 0),
      ds AS (SELECT cid, cv,
          list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2])) /
            (sqrt(list_sum(list_transform(qv, x -> x * x))) *
             sqrt(list_sum(list_transform(cv, x -> x * x)))) AS rel
        FROM c, q),
      pool AS MATERIALIZED (SELECT cid, cv, rel FROM (SELECT cid, cv, rel,
          ROW_NUMBER() OVER (ORDER BY rel DESC, cid) AS rn FROM ds)
        WHERE rn <= 20),
      psim AS MATERIALIZED (SELECT pa.cid AS a, pb.cid AS b,
          list_sum(list_transform(list_zip(pa.cv, pb.cv), x -> x[1] * x[2])) /
            (sqrt(list_sum(list_transform(pa.cv, x -> x * x))) *
             sqrt(list_sum(list_transform(pb.cv, x -> x * x)))) AS sim
        FROM pool pa JOIN pool pb ON pa.cid <> pb.cid),
      s1 AS MATERIALIZED (SELECT cid, 0.7 * rel - 0.3 * 0.0 AS mmr
        FROM pool ORDER BY mmr DESC, cid LIMIT 1),
      sel1 AS MATERIALIZED (SELECT cid, 1 AS step, mmr FROM s1),
      ${(2 to 5).map(mmrStep).mkString(",")}
      SELECT CAST(step AS BIGINT) AS step, cid AS doc_id, mmr
      FROM sel5 ORDER BY step"""),
  )

  val defs: Seq[QueryDef] = Seq(hyb01, hyb02, mmr01, ir01, ir02)
}
