package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def docs = graft.sources.Tables(spark, sf0001).documents
  private def emb = graft.sources.Tables(spark, sf0001).embeddings

  test("hyb01: fused score is exactly the sum of the legs' reciprocal ranks") {
    val rows = Retrieval.hybridRrf(docs, emb, Seq("table", "scan", "stream"))
      .collect()
    assert(rows.length == 10 && rows.map(_.getLong(4)).toSeq == (1L to 10L))
    rows.foreach { r =>
      val lex = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getLong(2))
      val vec = if (r.isNullAt(3)) 0.0 else 1.0 / (60 + r.getLong(3))
      assert(r.getDouble(1) == lex + vec,
        s"rrf must be the reciprocal-rank sum: $r")
      assert(!(r.isNullAt(2) && r.isNullAt(3)),
        "a fused doc must come from at least one leg")
    }
    // rank-only fusion: the output is ordered by fused score then id
    val rrfs = rows.map(_.getDouble(1)).toSeq
    assert(rrfs == rrfs.sorted.reverse, "output must be rrf-descending")
  }

  test("hyb02: index-served dense leg == from-raw hybrid at full nProbe; reduced nProbe stays well-formed") {
    val path = tmpDir("hyb02_vindex").toString
    val conf = spark.sparkContext.hadoopConfiguration
    try {
      VectorIndex.saveVectorIndex(emb, path)
      val terms = Seq("table", "scan", "stream")
      // endpoint parity: full probe ⇒ candidate set is every non-self
      // vector and the refine is exact cosine, so the fused table must
      // be IDENTICAL to the from-raw hybrid (hyb01's oracle contract)
      val fromIndex = Retrieval.hybridRrfIndexed(docs, emb, terms, path)
        .collect().toSeq
      val fromRaw = Retrieval.hybridRrf(docs, emb, terms).collect().toSeq
      assert(fromIndex == fromRaw,
        "index-served hybrid diverged from the from-raw hybrid at full nProbe")
      // deployment shape: a reduced probe still fuses a full top-k —
      // the lexical leg is untouched and the dense leg fills from the
      // probed cells only
      val reduced = Retrieval.hybridRrfIndexed(docs, emb, terms, path,
        nProbe = 4).collect()
      assert(reduced.length == 10 && reduced.map(_.getLong(4)).toSeq == (1L to 10L))
      assert(reduced.exists(!_.isNullAt(3)),
        "reduced-probe dense leg contributed nothing")
    } finally graft.ingest.FileUtils.rmr(path, conf)
  }

  test("ir01: metrics bounded and consistent with a hand-checked run") {
    val rows = Retrieval.retrievalMetrics(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    rows.foreach { case (qid, nRel, mrr, ndcg, recall) =>
      assert(nRel > 0, s"query $qid has no relevant candidates")
      assert(mrr >= 0.0 && mrr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0 &&
        recall >= 0.0 && recall <= 1.0, s"metric out of [0,1] for $qid")
    }
    // hand-check one query end to end against the run itself
    val labelOf = emb.select(col("vec_id").cast("long"), col("label"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val run0 = Similarity.bruteTopK(emb, 3, 10).collect()
      .filter(_.getAs[Number]("qid").longValue == 0L)
      .sortBy(_.getLong(3))
      .map(r => (r.getLong(3), labelOf(r.getAs[Number]("cid").longValue) == labelOf(0L)))
    // StrictMath, not math.log: Spark's ln codegen is StrictMath.log,
    // which can differ from Math.log by 1 ulp on some arguments
    def log2(x: Double) = StrictMath.log(x) / StrictMath.log(2.0)
    val expMrr = run0.collectFirst { case (rn, true) => 1.0 / rn }.getOrElse(0.0)
    val dcg = run0.foldLeft(0.0) { case (a, (rn, rel)) =>
      a + (if (rel) 1.0 else 0.0) / log2(rn + 1.0) }
    val nRel0 = rows.find(_._1 == 0L).get._2
    val idcg = (1L to math.min(nRel0, 10L)).foldLeft(0.0)((a, i) => a + 1.0 / log2(i + 1.0))
    val got = rows.find(_._1 == 0L).get
    assert(got._3 == expMrr, s"mrr: ${got._3} != $expMrr")
    assert(got._4 == dcg / idcg, s"ndcg: ${got._4} != ${dcg / idcg}")
    assert(got._5 == run0.count(_._2).toDouble / nRel0)
  }

  test("ir02: shared metric kernel — the dense row equals ir01's query-0 metrics") {
    val cmp = Retrieval.fusionGain(docs, emb, Seq("table", "scan", "stream"))
      .collect()
    assert(cmp.map(_.getString(0)).toSeq == Seq("dense", "hybrid"))
    val dense = cmp.head
    val q0 = Retrieval.retrievalMetrics(emb).collect()
      .find(_.getLong(0) == 0L).get
    // same run, same qrels, same kernel ⇒ byte-identical metrics
    assert((dense.getLong(1), dense.getDouble(2), dense.getDouble(3),
        dense.getDouble(4)) ==
      ((q0.getLong(1), q0.getDouble(2), q0.getDouble(3), q0.getDouble(4))),
      "ir02's dense row diverged from ir01's query-0 row")
  }

  test("mmr01: greedy picks the top-rel first, then trades relevance for diversity") {
    val sel = Retrieval.mmrDiversify(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sel.map(_._1).toSeq == (1L to 5L))
    assert(sel.map(_._2).distinct.length == 5, "selections must be distinct")
    // step 1 has no diversity penalty: it IS the relevance argmax
    val q = emb.filter(col("vec_id") === 0)
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("qv"))
    val topRel = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id").cast("long").as("cid"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("cv"))
      .crossJoin(broadcast(q))
      .withColumn("rel", graft.functions.VectorFunctions.cosine(col("qv"), col("cv")))
      .orderBy(col("rel").desc, col("cid")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(sel.head._2 == topRel.head, "step 1 must be the top-rel candidate")
    // the point of MMR: the selected set is strictly more diverse than
    // plain top-5-by-relevance (lower mean pairwise cosine)
    def meanPairSim(ids: Seq[Long]): Double = {
      val vs = emb.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").cast("long"),
          graft.functions.VectorFunctions.asDouble(col("embedding")))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      def cos(x: Array[Double], y: Array[Double]): Double = {
        val dot = x.indices.map(i => x(i) * y(i)).sum
        dot / (math.sqrt(x.map(a => a * a).sum) * math.sqrt(y.map(a => a * a).sum))
      }
      val pairs = for { i <- ids.indices; j <- ids.indices if i < j }
        yield cos(vs(ids(i)), vs(ids(j)))
      pairs.sum / pairs.size
    }
    val mmrIds = sel.map(_._2).toSeq
    assert(meanPairSim(mmrIds) < meanPairSim(topRel),
      s"MMR selection must be more diverse than plain top-5: " +
        s"${meanPairSim(mmrIds)} vs ${meanPairSim(topRel)}")
  }
}
