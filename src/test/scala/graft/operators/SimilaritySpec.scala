package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("brute-force top-k: k rows per query, sims sorted desc, self excluded") {
    val out = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
    assert(out.length == 15)
    for (q <- 0 until 3) {
      val rows = out.filter(_.getLong(0) == q)
      assert(rows.length == 5)
      assert(rows.forall(_.getLong(1) != q))
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("LSH top-k hits are a subset of plausible neighbors with decent recall") {
    val brute = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // multi-table sign-bit LSH on random data: expect non-trivial overlap
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall too low")
    assert(lsh.nonEmpty)
  }

  test("IVF top-k: decent recall vs brute force, planted twin found") {
    val brute = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 3, k = 5, nCells = 16, nProbe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
    // a vector's own cell always probes first: an exact twin is found
    import spark.implicits._
    val v = emb.filter(col("vec_id") === 7).select("embedding")
      .collect().head.getSeq[Float](0)
    val withTwin = emb.select("vec_id", "embedding")
      .union(Seq((9999L, v)).toDF("vec_id", "embedding"))
    val twinHits = Similarity.ivfTopK(withTwin, nQueries = 8, k = 3).collect()
      .filter(r => r.getLong(0) == 7L)
    assert(twinHits.exists(_.getLong(1) == 9999L), "twin not found by IVF")
  }

  test("fixed-quantizer IVF: same shape as trained IVF, exact twin found") {
    val out = Similarity.ivfFixedTopK(emb, nQueries = 3, k = 5).collect()
    assert(out.length == 15)
    for (q <- 0 until 3) {
      val rows = out.filter(_.getLong(0) == q)
      assert(rows.length == 5 && rows.forall(_.getLong(1) != q))
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // recall vs brute force with the quantizer pinned
    val brute = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((brute intersect fixed).size.toDouble / brute.size >= 0.3)
  }

  test("sim07 IVF-PQ: k rows per query, candidates confined to probed cells, twin scores ~zero") {
    val out = Similarity.ivfPqTopK(emb, nQueries = 3, k = 5).collect()
    assert(out.length == 15)
    for (q <- 0 until 3) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getLong(3))
      assert(rows.length == 5 && rows.forall(_.getLong(1) != q))
      val ds = rows.map(_.getDouble(2))
      assert(ds.forall(_ >= 0.0), "ADC distances are sums of squares")
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, "ranked ascending")
    }
    // exactness: hand-replay the whole pinned pipeline for the top hit
    // of query 0 — assignment, residual codes, LUT — and assert the ADC
    // distance is bit-identical (the same property the DuckDB oracle
    // certifies corpus-wide)
    val vecs = emb.orderBy(col("vec_id")).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cen = (0L until 16L).map(vecs(_)).toArray
    def cellOf(v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue
      for (c <- 0 until 16) {
        var d = 0.0; var i = 0
        while (i < 64) { val x = v(i) - cen(c)(i); d += x * x; i += 1 }
        if (d < bd) { bd = d; best = c }
      }
      best
    }
    val rcb = (16L until 32L).map { id =>
      val b = vecs(id); val cc = cen(cellOf(b))
      Array.tabulate(64)(i => b(i) - cc(i))
    }.toArray
    val hit = out.filter(_.getLong(0) == 0L).minBy(_.getLong(3))
    val cv = vecs(hit.getLong(1)); val qv = vecs(0L)
    val ccell = cellOf(cv)
    val cres = Array.tabulate(64)(i => cv(i) - cen(ccell)(i))
    val expected = (0 until 8).map { m =>
      // code: nearest sub-codebook entry (strict <, index tie-break)
      var code = 0; var bd = Double.MaxValue
      for (kk <- 0 until 16) {
        var d = 0.0; var i = 0
        while (i < 8) { val x = cres(m * 8 + i) - rcb(kk)(m * 8 + i); d += x * x; i += 1 }
        if (d < bd) { bd = d; code = kk }
      }
      var d = 0.0; var i = 0
      while (i < 8) {
        val x = (qv(m * 8 + i) - cen(ccell)(m * 8 + i)) - rcb(code)(m * 8 + i)
        d += x * x; i += 1
      }
      d
    }.reduce(_ + _)
    assert(hit.getDouble(2) == expected,
      s"ADC distance diverged from the hand replay: ${hit.getDouble(2)} vs $expected")
  }

  test("sim08: filtered kNN returns only same-label neighbors; post-filter would under-fill") {
    val out = Similarity.filteredTopK(emb, nQueries = 3, k = 5).collect()
    assert(out.length == 15)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(r.getInt(1) == labels(r.getLong(0)), "result label must be the query's")
      assert(labels(r.getLong(2)) == labels(r.getLong(0)), "neighbor label must match")
    }
    // pre-filter vs post-filter: filtering the UNfiltered top-5 by label
    // keeps fewer than 5 for at least one query (the under-fill bug)
    val unfiltered = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
    val postFilter = unfiltered.count(r => labels(r.getLong(1)) == labels(r.getLong(0)))
    assert(postFilter < 15, s"post-filtering kept $postFilter of 15 - the demo needs scarcity")
  }

  test("sim09: imputation is 1 row per masked vector; a planted twin wins its vote") {
    import spark.implicits._
    val out = Similarity.knnImpute(emb).collect()
    val nMasked = emb.filter(col("vec_id") % 10 === 0).count()
    assert(out.length.toLong == nMasked, "one verdict per masked vector")
    assert(out.forall(r => r.getLong(0) % 10 == 0))
    // planted check: give masked vector 0 five exact copies with label 77
    // in the pool - the vote must be unanimous for 77
    val v0 = emb.filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val twins = (1 to 5).map(i => (1000L + i, v0, 77)).toDF("vec_id", "embedding", "label")
    val out2 = Similarity.knnImpute(
      emb.select("vec_id", "embedding", "label").unionByName(twins)).collect()
      .filter(_.getLong(0) == 0L)
    assert(out2.head.getInt(2) == 77, s"planted twins must win: ${out2.head}")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    val fact = (Seq.fill(5000)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
    val dim = (1L to 50L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "row_id", "name")
    val salted = graft.operators.Skew.saltedJoin(fact, dim, Seq("k"), 8)
      .select("k", "row_id", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("multimodal frame sampling and feature resize") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 100)).toDF("doc_id", "text") // 100 bytes -> 7 frames of 16
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(docs),
      frameBytes = 16, stride = 4).collect()
    // frames 0 and 4 survive the stride
    assert(frames.length == 2)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1))
    assert(frames(0).getAs[Array[Byte]]("frame").length == 16)
    val feats = Multimodal.extractFeatures(Multimodal.syntheticPpm(docs))
    val wideRow = Multimodal.resizeFeature(feats, 12).collect().head
    val wide = wideRow.getSeq[Float](wideRow.fieldIndex("feature"))
    assert(wide.length == 12 && wide(8) == 0f && wide(11) == 0f)
    val narrowRow = Multimodal.resizeFeature(feats, 2).collect().head
    val narrow = narrowRow.getSeq[Float](narrowRow.fieldIndex("feature"))
    assert(narrow.length == 2)
  }

  test("PpmCodec: parses a hand-built P6 and rejects malformed payloads") {
    // 2x1 image, channel bytes chosen distinct per channel
    val payload = "P6\n2 1\n255\n".getBytes("UTF-8") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val d = Multimodal.PpmCodec.decode(payload)
    assert(d == Multimodal.PpmCodec.Decoded(2, 1, 255, 50L, 70L, 90L), d.toString)
    // high-bit raster bytes must read unsigned
    val hb = "P6\n1 1\n255\n".getBytes("UTF-8") ++ Array[Byte](-1, 0, -128)
    assert(Multimodal.PpmCodec.decode(hb) ==
      Multimodal.PpmCodec.Decoded(1, 1, 255, 255L, 0L, 128L))
    intercept[IllegalArgumentException](
      Multimodal.PpmCodec.decode("P5\n1 1\n255\nxxx".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      Multimodal.PpmCodec.decode("P6\n2 2\n255\nshort".getBytes("UTF-8")))
  }

  test("multimodal decode: synthesized PPMs round-trip through the real codec") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(Multimodal.syntheticPpm(docs))
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_bytes") == 59L)) // 11 header + 48 raster
    assert(out.forall(r => r.getAs[Int]("width") == 4 &&
      r.getAs[Int]("height") == 4 && r.getAs[Int]("maxval") == 255))
    // raster = first 48 chars of md5("abc") || md5("x:abc")
    val px = (org.apache.commons.codec.digest.DigestUtils.md5Hex("abc") +
      org.apache.commons.codec.digest.DigestUtils.md5Hex("x:abc")).take(48)
    val expR = (0 until 16).map(i => px(3 * i).toLong).sum
    assert(out(0).getAs[Long]("sum_r") == expR, s"sum_r ${out(0)} vs $expR")
    val f = out(0).getSeq[Float](out(0).fieldIndex("feature"))
    assert(f.length == 3 && f.head == expR.toFloat / 4080f)
  }

  test("sq01: int8 codes in range, reconstruction error bounded by the grid") {
    val out = Similarity.quantizeScalar(emb).collect()
    assert(out.length == emb.count())
    out.foreach { r =>
      val qsum = r.getLong(1)
      assert(qsum >= 0 && qsum <= 255L * 64, s"qsum $qsum outside [0, 255*64]")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 255)
      assert(r.getDouble(3) >= 0.0)
    }
    // grid bound: per-dim |err| <= cellWidth/2 + float slack, so mse is
    // bounded by max over dims of (span/256)^2 / 4 — compute the loose
    // version from the data
    val spans = emb.selectExpr("explode(transform(embedding, x -> cast(x as double))) as x")
      .agg(max("x"), min("x")).collect().head
    val worst = (spans.getDouble(0) - spans.getDouble(1)) / 256.0
    val bound = worst * worst // no /4: floor (not round) can err a full cell
    out.foreach(r => assert(r.getDouble(3) <= bound * 1.01,
      s"mse ${r.getDouble(3)} above grid bound $bound"))
  }

  test("pq01: codebook vectors quantize to themselves with zero error; PQ coarser than SQ") {
    val pq = Similarity.productQuantize(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // a pinned codebook vector k < 16 is its own nearest code in every
    // subspace: codesum = 8k, reconstruction exact
    for (k <- 0L until 16L if pq.contains(k)) {
      assert(pq(k)._1 == 8 * k, s"vec $k codesum ${pq(k)._1} != ${8 * k}")
      assert(pq(k)._2 == 0.0, s"vec $k mse ${pq(k)._2} != 0")
    }
    pq.values.foreach { case (cs, mse) =>
      assert(cs >= 0 && cs <= 8 * 15)
      assert(mse >= 0.0)
    }
    // 8-nibble PQ must reconstruct worse on average than 64-byte SQ —
    // the compression/error trade-off both operators exist to expose
    val sq = Similarity.quantizeScalar(emb).collect().map(_.getDouble(3))
    val meanPq = pq.values.map(_._2).sum / pq.size
    val meanSq = sq.sum / sq.length
    assert(meanPq > meanSq, s"PQ mse $meanPq should exceed SQ mse $meanSq")
  }

  test("sd01: semantic near-dup pairs are real (recomputed cosine >= threshold, same cell)") {
    val pairs = Similarity.semDedupPairs(emb, nCells = 16, threshold = 0.45).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    // every reported pair must verify against a direct cosine computation
    val vecs = emb.selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    pairs.foreach { r =>
      val c = cos(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(c - r.getDouble(3)) < 1e-9)
      assert(c >= 0.45)
    }
  }

  test("semDedup cell cap bounds pair counts on a pathologically skewed cell") {
    import spark.implicits._
    // 2 centroid vectors + 120 vectors all nearest centroid 0: one cell
    // holds ~98% of the corpus — the skew a fixed quantizer produces on
    // clustered data
    def vec(seed: Int, near: Int): Seq[Float] =
      Seq.tabulate(64)(i => (if (i == near) 10f else 0f) + (seed % 7) * 0.01f * (i % 3))
    val rows = Seq((0L, vec(0, 0)), (1L, vec(0, 1))) ++
      (2L to 121L).map(i => (i, vec(i.toInt, 0)))
    val emb = rows.toDF("vec_id", "embedding")
    val uncapped = Similarity.semDedupPairs(emb, nCells = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val capped = Similarity.semDedupPairs(emb, nCells = 2, threshold = 0.5, maxCellSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // the skewed cell (~121 members) pairs quadratically uncapped...
    assert(uncapped.size > 5000, s"expected ~n²/2 uncapped pairs, got ${uncapped.size}")
    // ...and sub-cell splitting (ceil(121/10)=13 sub-cells) bounds the
    // expansion: expected pairs ≈ Σ nᵢ²/2 ≈ n·maxCellSize/2, an order
    // of magnitude down
    assert(capped.size < uncapped.size / 5,
      s"cap did not bound pair count: ${capped.size} vs ${uncapped.size}")
    assert(capped.nonEmpty)
    // capped pairs are a SUBSET with identical scores (the cap only
    // prunes candidates, never changes scoring)
    capped.foreach { case (k, sim) => assert(uncapped(k) == sim) }
  }

  test("semDedupAuto derives k from corpus size; sd01's pinned config is unchanged by the guard") {
    // low threshold: the synthetic embeddings are near-orthogonal, so
    // 0.45 could yield zero rows and a vacuous cell-range check
    val auto = Similarity.semDedupAuto(emb, threshold = 0.1, targetCellSize = 50)
    // 500 vectors / target 50 => k = 10 cells: every assigned cell id < 10
    val cells = auto.select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.nonEmpty)
    assert(cells.forall(c => c >= 0 && c < 10), s"cell ids out of range: ${cells.mkString(",")}")
    // the guard defaults leave sd01's declared output untouched
    val pinned = Similarity.semDedupPairs(emb, nCells = 16, threshold = 0.45).collect()
    val viaMax = Similarity.semDedupPairs(emb, nCells = 16, threshold = 0.45,
      maxCellSize = Int.MaxValue).collect()
    assert(pinned.map(_.toString).toSeq == viaMax.map(_.toString).toSeq)
  }

  test("annRecall agrees with a hand computation from the two top-k sets") {
    val out = Similarity.annRecall(emb, nQueries = 3, k = 5).collect()
    assert(out.length == 3)
    val brute = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val qid = r.getLong(0)
      val expected = brute.filter(_._1 == qid).intersect(lsh.filter(_._1 == qid)).size
      assert(r.getLong(1) == expected.toLong)
      assert(math.abs(r.getDouble(2) - expected / 5.0) < 1e-12)
    }
  }

  test("sim05 PQ-ADC: k rows per query ranked by nonneg distance, self excluded, codebook vectors score zero-ish") {
    val out = Similarity.pqAdcTopK(emb, nQueries = 3, k = 5).collect()
    assert(out.length == 15)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length == 5)
      assert(rows.forall(_.getLong(1) != qid), "self must be excluded")
      val ds = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ds.forall(_ >= 0.0))
      assert(ds.sameElements(ds.sorted), "rn must follow adist asc")
    }
    // a query IS a codebook vector (qid < 3 < 16): its own codes
    // reconstruct it exactly, so ADC distance to itself would be 0 —
    // and to its brute-force nearest neighbors, small. Sanity-check
    // recall against brute force (ADC is approximate: coarse 16-entry
    // codebooks, so demand overlap, not equality).
    val brute = Similarity.bruteTopK(emb, nQueries = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adc.intersect(brute).size >= 5,
      s"ADC should recover a good share of true neighbors, got ${adc.intersect(brute).size}/15")
  }

  test("mipsTopK ranks by inner product, diverging from cosine where norms differ") {
    import spark.implicits._
    // candidate 10 points the same direction as the query but with a
    // huge norm; candidate 11 is the unit vector closest in angle.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(5.0f, 0.1f, 0.0f)),   // top by dot (5.0) AND similar angle
      (11L, Array(0.99f, 0.14f, 0.0f)), // near-unit: best cosine after 10
      (12L, Array(0.0f, 3.0f, 0.0f)),   // orthogonal-ish: dot 0
    ).toDF("vec_id", "embedding")
    val mips = Similarity.mipsTopK(emb, nQueries = 1, k = 3).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(mips.head._1 == 10L && mips.head._2 == 5.0,
      s"largest inner product must rank first: ${mips.toSeq}")
    assert(mips.map(_._1).toSeq == Seq(10L, 11L, 12L), mips.toSeq.toString)
  }

  test("rp01: JL norm-preservation ratios concentrate around 1") {
    val rows = graft.Registry.byName("rp01_random_projection")
      .run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("norm2_orig") > 0.0))
    val ratios = rows.map(_.getAs[Double]("ratio"))
    val mean = ratios.sum / ratios.length
    // E[ratio] = 1 under Rademacher signs; k=16 concentrates the mean
    // of 500 draws tightly even though single-vector spread is wide
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.5) >= (ratios.length * 9) / 10,
      "at least 90% of vectors inside the loose JL envelope")
  }

  test("neg01: 4 negatives per anchor, reproducible, never a near-duplicate of the anchor") {
    val out = graft.Registry.byName("neg01_negative_mining").run(spark, sf0001).collect()
    val byAnchor = out.groupBy(_.getLong(0))
    assert(byAnchor.size == 500 && byAnchor.values.forall(_.length == 4),
      "every anchor draws exactly 4 negatives")
    assert(out.forall(r => r.getLong(0) != r.getLong(2)), "anchor never its own negative")
    // reproducible: a second run is identical
    val again = graft.Registry.byName("neg01_negative_mining").run(spark, sf0001).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // the exclusion guarantee, checked against the EXACT pair set
    val dup = Dedup.prefixFilterPairs(
      spark.read.parquet(s"$sf0001/documents.parquet"))
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    assert(out.forall(r => !dup.contains((r.getLong(0), r.getLong(2)))),
      "no negative may be a near-duplicate of its anchor")
  }

  test("sim10: recall is non-decreasing in nProbe and exactly 1.0 at full probing") {
    val rows = Similarity.ivfProbeSweep(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4, s"recall must not drop as nProbe grows: $a -> $b")
    }
    // probing every cell makes the candidate set all non-self vectors:
    // the IVF answer IS the brute answer, recall exactly 1
    val full = rows.last
    assert(full._2 == full._3 && full._4 == 1.0,
      s"nProbe = nCells must recover brute-force exactly: $full")
  }

  test("sim14: full-width truncation recovers the brute truth exactly; widths x queries complete") {
    val rows = graft.Registry.byName("sim14_matryoshka_recall").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.map(_._1).distinct.toSeq == Seq(8L, 16L, 32L, 64L))
    assert(rows.count(_ => true) == 12, "4 widths x 3 queries")
    // the endpoint proof: truncating to the FULL dimension is the
    // identity, so its ranking IS the truth — recall exactly 1.0
    rows.filter(_._1 == 64L).foreach { r =>
      assert(r._3 == 1.0, s"full-width recall must be exactly 1: $r")
    }
    rows.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("sim17: refine recall is non-decreasing in R and exactly 1.0 at R = everything") {
    val rows = graft.Registry.byName("sim17_ivfpq_refine").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(5L, 10L, 20L, 1000000L))
    // widening the re-ranked candidate set can only add truth hits
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4, s"recall decreased: $a -> $b")
    }
    // the endpoint proof: exact re-rank of ALL candidates IS the truth
    assert(rows.last._4 == 1.0 && rows.last._2 == rows.last._3,
      s"R=everything must recover truth exactly: ${rows.last}")
  }

  test("sim19: the norm-augmentation reduction reproduces the exact MIPS ranking") {
    val emb = graft.sources.Tables(spark, sf0001).embeddings
    def ranking(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number]("qid").longValue, r.getLong(3),
        r.getAs[Number]("cid").longValue)).toSeq
    // the construction's whole point: cosine over the augmented space
    // ranks EXACTLY as dot product over the original space
    assert(ranking(Similarity.mipsReducedTopK(emb)) ==
      ranking(Similarity.mipsTopK(emb)),
      "augmented-cosine ranking diverged from the exact MIPS scan")
    // the reduction must hold under GENUINE norm skew, where MIPS and
    // cosine disagree — cosine is scale-invariant, MIPS is not, so
    // scaling vectors by 1 + (vec_id % 5) forces the disagreement
    val skewed = emb.withColumn("embedding",
      transform(col("embedding"),
        x => x * (lit(1) + pmod(col("vec_id"), lit(5))).cast("float")))
    assert(ranking(Similarity.mipsReducedTopK(skewed)) ==
      ranking(Similarity.mipsTopK(skewed)),
      "reduction broke under norm skew")
    assert(ranking(Similarity.mipsTopK(skewed)) !=
      ranking(Similarity.bruteTopK(skewed)),
      "skewed corpus failed to separate MIPS from cosine")
  }
}
