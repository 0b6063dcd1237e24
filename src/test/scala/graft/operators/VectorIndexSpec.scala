package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {

  private def emb = graft.sources.Tables(spark, sf0001).embeddings

  test("sim11: probing the saved index equals the from-scratch IVF-PQ search") {
    val path = tmpDir("graft_vindex_save").toString
    VectorIndex.saveVectorIndex(emb, path)
    val probed = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect().toSeq
    val scratch = Similarity.ivfPqTopK(emb).collect().toSeq
    assert(probed == scratch,
      s"loaded-index probe diverged from from-scratch search")
  }

  test("bulk probes equal the LUT probes row for row, both objectives") {
    val path = tmpDir("graft_vindex_bulk").toString
    try {
      VectorIndex.saveVectorIndex(emb, path)
      val qs = emb.filter(col("vec_id") < 3)
      // same queries through the driver-LUT path and the distributed
      // join path: identical candidates, scores, and tie-breaks — the
      // bulk path must be a pure topology change, never a semantics one
      assert(VectorIndex.probeVectorIndexBulk(spark, path, qs).collect().toSeq ==
        VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq,
        "bulk L2 probe diverged from the LUT probe")
      assert(VectorIndex.probeVectorIndexBulkMips(spark, path, qs).collect().toSeq ==
        VectorIndex.probeVectorIndexMips(spark, path, qs).collect().toSeq,
        "bulk MIPS probe diverged from the LUT probe")
    } finally graft.ingest.FileUtils.rmr(path,
      spark.sparkContext.hadoopConfiguration)
  }

  test("bulk filtered probe == LUT filtered probe; pre-filter fills k, post-filter under-fills") {
    val path = tmpDir("graft_vindex_bulkfilt").toString
    try {
      VectorIndex.saveVectorIndex(emb, path)
      val qs = emb.filter(col("vec_id") < 3)
      val meta = emb.select("vec_id", "label")
      // the distributed filtered plan must be a pure topology change
      // against the LUT filtered path — candidates, scores, tie-breaks
      val bulk = VectorIndex.probeVectorIndexBulkFiltered(
        spark, path, qs, meta).collect().toSeq
      assert(bulk == VectorIndex.probeVectorIndexFiltered(
        spark, path, qs, meta).collect().toSeq,
        "bulk filtered probe diverged from the LUT filtered probe")
      // same pre-filter semantics at full width: every ranked candidate
      // carries its query's label, and post-filtering the UNFILTERED
      // bulk top-k under-fills (the classic vector-DB bug, contrasted)
      val labelOf = emb.select(col("vec_id").cast("long"), col("label"))
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap
      val wide = VectorIndex.probeVectorIndexBulkFiltered(
        spark, path, emb, meta).collect()
      assert(wide.forall(r => labelOf(r.getLong(1)) == labelOf(r.getLong(0))),
        "every ranked candidate must carry the query's label")
      val post = VectorIndex.probeVectorIndexBulk(spark, path, emb).collect()
        .filter(r => labelOf(r.getLong(1)) == labelOf(r.getLong(0)))
      assert(post.length < wide.length,
        s"post-filter kept ${post.length} of ${wide.length} — expected under-fill")
      // the MIPS objective composes with the same pre-filter: every
      // candidate shares its query's label, and post-filtering the
      // unfiltered MIPS top-k under-fills the same way
      val wideM = VectorIndex.probeVectorIndexBulkFiltered(
        spark, path, emb, meta, mips = true).collect()
      assert(wideM.forall(r => labelOf(r.getLong(1)) == labelOf(r.getLong(0))),
        "every MIPS-ranked candidate must carry the query's label")
      val postM = VectorIndex.probeVectorIndexBulkMips(spark, path, emb)
        .collect().filter(r => labelOf(r.getLong(1)) == labelOf(r.getLong(0)))
      assert(postM.length < wideM.length,
        s"MIPS post-filter kept ${postM.length} of ${wideM.length} — expected under-fill")
      // and the two objectives genuinely rank differently under the
      // same filter (corpus norms vary — the reason MIPS exists)
      val wideL2 = VectorIndex.probeVectorIndexBulkFiltered(
        spark, path, emb, meta).collect()
      assert(wideM.map(r => (r.getLong(0), r.getLong(1))).toSeq !=
        wideL2.map(r => (r.getLong(0), r.getLong(1))).toSeq,
        "filtered MIPS and L2 rankings should diverge on this corpus")
      // a NULL query label fails fast on the bulk path too
      val nullQ = qs.withColumn("label",
        when(col("vec_id") === 1, lit(null).cast("string"))
          .otherwise(col("label")))
      val e = intercept[IllegalArgumentException] {
        VectorIndex.probeVectorIndexBulkFiltered(spark, path, nullQ, meta)
          .collect()
      }
      assert(e.getMessage.contains("non-NULL label"))
    } finally graft.ingest.FileUtils.rmr(path,
      spark.sparkContext.hadoopConfiguration)
  }

  test("bulk refined probe: LUT-nominated parity and both topR endpoints") {
    val path = tmpDir("graft_vindex_bulkref").toString
    try {
      VectorIndex.saveVectorIndex(emb, path)
      val qs = emb.filter(col("vec_id") < 3)
      // reference refine built on the PROVEN LUT nomination (bulk==LUT
      // is pinned above): same join back to raw, same exact fold, same
      // rank — the bulk refined pipeline must match row for row
      def refRefined(topR: Int, k: Int) = {
        val cand = VectorIndex.probeVectorIndex(spark, path, qs, k = topR)
          .select("qid", "cid")
        val qdf = qs.select(col("vec_id").cast("long").as("qid"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("qv"))
        val raw = emb.select(col("vec_id").cast("long").as("cid"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("cv"))
        val diff = zip_with(col("qv"), col("cv"), (a, b) => a - b)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("exd"), col("cid"))
        cand.join(raw, "cid").join(qdf, "qid")
          .withColumn("exd", graft.functions.VectorFunctions.dotD(diff, diff))
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .filter(col("rn") <= k)
          .select("qid", "cid", "exd", "rn").orderBy("qid", "rn")
      }
      assert(VectorIndex.probeVectorIndexBulkRefined(spark, path, qs, emb,
          k = 5, topR = 10).collect().toSeq ==
        refRefined(10, 5).collect().toSeq,
        "bulk refined diverged from the LUT-nominated refine")
      // endpoint topR = k: the refine can only REORDER the ADC top-k —
      // same cid set per query, ranked by exact distance
      val adcTop = VectorIndex.probeVectorIndexBulk(spark, path, qs, k = 5)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val refTop = VectorIndex.probeVectorIndexBulkRefined(spark, path, qs,
          emb, k = 5, topR = 5).collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      assert(refTop == adcTop,
        "topR = k must re-rank exactly the ADC top-k set")
      // endpoint topR = everything: the exact re-rank of ALL
      // probed-cell candidates (sim17's truth)
      assert(VectorIndex.probeVectorIndexBulkRefined(spark, path, qs, emb,
          k = 5, topR = Int.MaxValue).collect().toSeq ==
        refRefined(Int.MaxValue, 5).collect().toSeq,
        "topR = everything must equal the exact re-rank of all candidates")
      // nominating fewer than k is a contract error, not a silent
      // under-fill
      intercept[IllegalArgumentException](
        VectorIndex.probeVectorIndexBulkRefined(spark, path, qs, emb,
          k = 5, topR = 3))
    } finally graft.ingest.FileUtils.rmr(path,
      spark.sparkContext.hadoopConfiguration)
  }

  test("oversized query sets route to the bulk plan; only the cosine refine still caps") {
    val path = tmpDir("graft_vindex_route").toString
    try {
      VectorIndex.saveVectorIndex(emb, path)
      val qs = emb.filter(col("vec_id") < 10)
      val meta = emb.select("vec_id", "label")
      // cap below the query count: what used to fail loudly now routes
      // to the bulk plan — and the routed result is byte-identical to
      // the LUT plan's (both already proven equal to each other)
      assert(VectorIndex.probeVectorIndex(spark, path, qs,
          maxDriverQueries = 3).collect().toSeq ==
        VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq,
        "routed L2 probe diverged from the LUT probe")
      assert(VectorIndex.probeVectorIndexMips(spark, path, qs,
          maxDriverQueries = 3).collect().toSeq ==
        VectorIndex.probeVectorIndexMips(spark, path, qs).collect().toSeq,
        "routed MIPS probe diverged from the LUT probe")
      assert(VectorIndex.probeVectorIndexFiltered(spark, path, qs, meta,
          maxDriverQueries = 3).collect().toSeq ==
        VectorIndex.probeVectorIndexFiltered(spark, path, qs, meta)
          .collect().toSeq,
        "routed filtered probe diverged from the LUT filtered probe")
      // the cosine refine has no bulk twin (its distributed twin
      // re-scores in L2 — different semantics), so IT keeps the loud
      // cap instead of silently routing into a different ranking
      val many = emb.crossJoin(spark.range(0, 10).select(col("id").as("rep")))
        .select((col("vec_id").cast("long") * 10 + col("rep")).as("vec_id"),
          col("embedding"))
      val e = intercept[IllegalArgumentException](
        VectorIndex.probeVectorIndexRefined(spark, path, many, emb))
      assert(e.getMessage.contains("no") &&
        e.getMessage.contains("bulk twin"),
        s"refined cap message must say why it cannot route: ${e.getMessage}")
    } finally graft.ingest.FileUtils.rmr(path,
      spark.sparkContext.hadoopConfiguration)
  }

  test("geometry resize: rebuild at larger nCells == fresh save at that geometry; width guarded") {
    val conf = spark.sparkContext.hadoopConfiguration
    val resized = tmpDir("graft_vindex_resize").toString
    val fresh = tmpDir("graft_vindex_resize_fresh").toString
    try {
      // grow past a small save-time geometry, then resize via rebuild
      VectorIndex.saveVectorIndex(emb.filter(col("vec_id") < 100), resized,
        nCells = 8, nSub = 8, subDim = 8, nCodes = 8)
      VectorIndex.appendVectorIndex(emb.filter(col("vec_id") >= 100), resized)
      val epoch0 = graft.ingest.Generations.saveEpoch(resized, conf)
      VectorIndex.rebuildVectorIndex(emb, resized,
        emb.select("vec_id").limit(0), nCells = 16, nCodes = 16)
      // the epoch bump is what lets a concurrent appender detect the
      // geometry replacement — and the old-geometry batches are gone
      assert(graft.ingest.Generations.saveEpoch(resized, conf) > epoch0,
        "resize must bump the save epoch")
      val live = graft.ingest.Generations.currentBatchesDir(resized, conf)
      assert(graft.ingest.FileUtils.listSubdirs(live, conf).size == 1,
        "no batch encoded under the old geometry may survive the resize")
      // indistinguishable from an index saved FRESH at the target
      // geometry: same quantizer files, same probe rows
      VectorIndex.saveVectorIndex(emb, fresh, nCells = 16, nSub = 8,
        subDim = 8, nCodes = 16)
      def img(p: String) = (
        spark.read.parquet(s"$p/meta").collect().toSeq,
        spark.read.parquet(s"$p/centroids").orderBy("cell").collect().toSeq,
        spark.read.parquet(s"$p/codebook").orderBy("code").collect().toSeq,
        VectorIndex.probeVectorIndex(spark, p,
          emb.filter(col("vec_id") < 3)).collect().toSeq)
      assert(img(resized) == img(fresh),
        "resized index must be indistinguishable from a fresh save at " +
          "the target geometry")
      // a resize may re-partition subspaces (4x16 keeps width 64) but
      // never change the embedding width — 4x8 fails by name
      VectorIndex.rebuildVectorIndex(emb, resized,
        emb.select("vec_id").limit(0), nSub = 4, subDim = 16)
      val e = intercept[IllegalArgumentException](
        VectorIndex.rebuildVectorIndex(emb, resized,
          emb.select("vec_id").limit(0), nSub = 4, subDim = 8))
      assert(e.getMessage.contains("vector dimension"),
        s"width-changing resize must fail by name: ${e.getMessage}")
    } finally {
      graft.ingest.FileUtils.rmr(resized, conf)
      graft.ingest.FileUtils.rmr(fresh, conf)
    }
  }

  test("the whole lifecycle runs through the Hadoop FileSystem API (file: URI)") {
    // an explicit file:-scheme URI never resolves through java.io —
    // save/append/forget/vacuum/probe must all route Path.getFileSystem,
    // the property that lets the same index live on HDFS/S3A
    val path = "file:" + tmpDir("graft_vindex_fsuri").toString
    VectorIndex.saveVectorIndex(emb.filter(col("vec_id") < 48), path)
    VectorIndex.appendVectorIndex(emb.filter(col("vec_id") >= 48), path)
    VectorIndex.forgetFromVectorIndex(spark, path,
      emb.filter(col("vec_id") === 50).select("vec_id"))
    VectorIndex.vacuumVectorIndex(spark, path)
    val probed = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect()
    assert(probed.nonEmpty)
    assert(!probed.exists(_.getLong(1) == 50L), "vacuumed id must not rank")
    assert(graft.ingest.FileUtils.exists(
      graft.ingest.Generations.currentBatchesDir(path,
        spark.sparkContext.hadoopConfiguration) + "/b0/_COMMITTED",
      spark.sparkContext.hadoopConfiguration))
  }

  test("vacuum with NO tombstones = batch compaction: many b<N> dirs fold to one, probe identical") {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = tmpDir("graft_vindex_compact").toString
    VectorIndex.saveVectorIndex(emb.filter(col("vec_id") < 100), path)
    Seq(100 to 199, 200 to 299, 300 to 10000).foreach(r =>
      VectorIndex.appendVectorIndex(
        emb.filter(col("vec_id") >= r.start && col("vec_id") <= r.end), path))
    // resolve the LIVE generation each time: vacuum flips it
    def batchDirs = graft.ingest.FileUtils.listSubdirs(
        graft.ingest.Generations.currentBatchesDir(path, conf), conf)
      .filterNot(_.endsWith(".claim"))
    assert(batchDirs.size == 4, s"expected 4 append batches, got $batchDirs")
    val qs = emb.filter(col("vec_id") < 3)
    val before = VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
    VectorIndex.vacuumVectorIndex(spark, path)
    assert(batchDirs.map(d => new org.apache.hadoop.fs.Path(d).getName)
      == Seq("b0"), s"compaction left $batchDirs")
    val after = VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
    assert(after == before, "compaction changed probe results")
  }

  test("vector retention: retired batch's vectors leave probes; quantizers untouched") {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = tmpDir("graft_vindex_retain").toString
    VectorIndex.saveVectorIndex(
      emb.filter(col("vec_id") < 32 || col("vec_id") % 3 === 0), path)
    VectorIndex.appendVectorIndex(
      emb.filter(col("vec_id") >= 32 && col("vec_id") % 3 =!= 0), path)
    def model = {
      val m = VectorIndex.loadModel(spark, path)
      (m.cen.map(_.toSeq).toSeq, m.rcb.map(_.toSeq).toSeq)
    }
    val modelBefore = model
    val qs = emb.filter(col("vec_id") < 3)
    val before = VectorIndex.probeVectorIndex(spark, path, qs).collect()
    assert(before.exists(r => r.getLong(1) < 32 || r.getLong(1) % 3 == 0),
      "retired-window cids must rank pre-retirement or the test proves nothing")
    assert(VectorIndex.retireVectorIndexBatches(spark, path, 1) == Seq(0L))
    val after = VectorIndex.probeVectorIndex(spark, path, qs).collect()
    assert(after.forall(r => r.getLong(1) >= 32 && r.getLong(1) % 3 != 0),
      "a retired batch's vectors must not rank")
    // retention expires candidate rows, never the model
    assert(model == modelBefore, "retirement must not touch quantizer state")
    // vacuum drops the bytes and keeps the ranking
    VectorIndex.vacuumVectorIndex(spark, path)
    val live = spark.read.parquet(graft.ingest.Generations
        .currentBatchesDir(path, conf) + "/b0/codes")
      .select("cid").collect().map(_.getLong(0))
    assert(live.forall(c => c >= 32 && c % 3 != 0),
      "retired codes must be physically gone after vacuum")
    assert(VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
      == after.toSeq, "vacuum changed probe results")
  }

  test("sim18: MIPS probe matches from-scratch MIPS ADC; rankings genuinely diverge from L2") {
    val path = tmpDir("graft_vindex_mips").toString
    VectorIndex.saveVectorIndex(emb, path)
    val qs = emb.filter(col("vec_id") < 3)
    val probed = VectorIndex.probeVectorIndexMips(spark, path, qs)
      .collect().toSeq
    // shared-kernel parity: the loaded path must emit the exact doubles
    // the from-scratch MIPS ADC derives under the same pinned model
    val model = Similarity.trainIvfPq(emb, 16, 8, 8, 16)
    val scratch = Similarity.adcRank(Similarity.encodeIvfPq(emb, model),
      Similarity.queryVectors(emb, 3), model, 5, 4, mips = true)
      .collect().toSeq
    assert(probed == scratch, "loaded MIPS probe diverged from from-scratch")
    assert(probed.map(_.getLong(0)).distinct.length == 3 &&
      probed.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // scores rank DESCENDING per query
    probed.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, "MIPS must rank score-descending")
    }
    // the objective matters: on this norm-skewed corpus the MIPS and
    // L2 ADC top-5 differ for at least one query — otherwise sim18
    // would prove nothing sim11 doesn't
    val l2 = VectorIndex.probeVectorIndex(spark, path, qs).collect()
    def ranking(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    assert(ranking(probed) != ranking(l2.toSeq),
      "MIPS and L2 rankings were identical — corpus norms too uniform to test MIPS")
  }

  test("filtered probe refuses a NULL query label instead of silently matching nothing") {
    val path = tmpDir("graft_vindex_nulllabel").toString
    VectorIndex.saveVectorIndex(emb, path)
    val qs = emb.filter(col("vec_id") < 3)
      .withColumn("label",
        when(col("vec_id") === 1, lit(null).cast("string"))
          .otherwise(col("label")))
    val e = intercept[IllegalArgumentException] {
      VectorIndex.probeVectorIndexFiltered(spark, path, qs,
        emb.select("vec_id", "label")).collect()
    }
    assert(e.getMessage.contains("non-NULL label"))
  }

  test("sim15: filtered probe fills k within the predicate; post-filtering under-fills") {
    val path = tmpDir("graft_vindex_filtered").toString
    VectorIndex.saveVectorIndex(emb, path)
    val qs = emb.filter(col("vec_id") < 3)
    val labelOf = emb.select(col("vec_id").cast("long"), col("label"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val filtered = VectorIndex.probeVectorIndexFiltered(spark, path, qs,
      emb.select("vec_id", "label")).collect()
    // pre-filter: every query fills its full k, all from its own label
    assert(filtered.groupBy(_.getLong(0)).forall(_._2.length == 5),
      "filtered probe must fill k within the predicate")
    assert(filtered.forall(r => labelOf(r.getLong(1)) == labelOf(r.getLong(0))),
      "every ranked candidate must carry the query's label")
    // the classic vector-DB bug, demonstrated: filtering the UNFILTERED
    // top-k after the fact keeps only its label-matching subset — fewer
    // than k rows whenever the global neighborhood is label-mixed
    val post = VectorIndex.probeVectorIndex(spark, path, qs).collect()
      .filter(r => labelOf(r.getLong(1)) == labelOf(r.getLong(0)))
    assert(post.length < filtered.length,
      s"post-filter kept ${post.length} of ${filtered.length} — expected under-fill")
  }

  test("sim16: rebuild erases a training vector from quantizer state, codes, and probes") {
    val path = tmpDir("graft_vindex_rebuild").toString
    VectorIndex.saveVectorIndex(emb, path)
    VectorIndex.forgetFromVectorIndex(spark, path,
      emb.filter(col("vec_id") === 40).select("vec_id"))
    intercept[IllegalArgumentException] {
      VectorIndex.forgetFromVectorIndex(spark, path,
        emb.filter(col("vec_id") === 20).select("vec_id"))
    }
    val v20 = emb.filter(col("vec_id") === 20)
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")))
      .head.getSeq[Double](0).toSeq
    VectorIndex.rebuildVectorIndex(emb, path,
      emb.filter(col("vec_id") === 20).select("vec_id"))
    // byte-absence: the erased vector's coordinates appear in NO
    // centroid row and NO codebook residual's reconstruction basis
    val model = VectorIndex.loadModel(spark, path)
    assert(!model.cen.exists(_.toSeq == v20), "erased vector is a centroid")
    val trainIds = spark.read.parquet(s"$path/train_ids")
      .collect().map(_.getLong(0)).toSet
    assert(!trainIds.contains(20L) && !trainIds.contains(40L),
      s"erased ids must not be in the rebuilt training set: $trainIds")
    assert(trainIds == ((0L until 33L).toSet - 20L),
      "training re-pins to the first 32 survivors")
    // codes physically absent for BOTH the erase set and the folded tombstone
    val cids = spark.read.parquet(s"$path/batches/b0/codes")
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(!cids.contains(20L) && !cids.contains(40L))
    // tombstone log cleared by the re-save; probes are clean
    assert(!graft.ingest.FileUtils.exists(s"$path/forgotten",
      spark.sparkContext.hadoopConfiguration))
    val probed = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect()
    assert(probed.nonEmpty && !probed.exists(r =>
      r.getLong(1) == 20L || r.getLong(1) == 40L))
  }

  test("sd02: the appended-batch audit flags BOTH outcomes and matches a one-shot save") {
    val path = tmpDir("graft_sd02a").toString
    val path2 = tmpDir("graft_sd02b").toString
    VectorIndex.saveVectorIndex(emb.filter(col("vec_id") < 400), path)
    VectorIndex.appendVectorIndex(emb.filter(col("vec_id") >= 400), path)
    val qs = emb.filter(col("vec_id") >= 400 && col("vec_id") % 50 === 0)
    val audited = VectorIndex.probeVectorIndex(spark, path, qs, k = 1)
      .withColumn("is_dup", col("adist") <= 1.36).collect()
    assert(audited.map(_.getBoolean(4)).distinct.length == 2,
      "threshold must split the sample: dups AND non-dups")
    // incremental save+append must audit identically to one-shot save
    VectorIndex.saveVectorIndex(emb, path2)
    val oneShot = VectorIndex.probeVectorIndex(spark, path2, qs, k = 1).collect()
    assert(audited.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      oneShot.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("sim12: appended batches are encoded under the STORED quantizers") {
    val path = tmpDir("graft_vindex_append").toString
    VectorIndex.saveVectorIndex(
      emb.filter(col("vec_id") < 32 || col("vec_id") % 3 === 0), path)
    VectorIndex.appendVectorIndex(
      emb.filter(col("vec_id") >= 32 && col("vec_id") % 3 =!= 0), path)
    val probed = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect().toSeq
    val scratch = Similarity.ivfPqTopK(emb).collect().toSeq
    assert(probed == scratch,
      "save+append probe must equal from-scratch over the full corpus")
  }

  test("probe follows the index's stored geometry, not caller defaults") {
    // a save with non-default geometry must produce the matching probe
    // without the caller repeating the parameters — geometry mismatch is
    // structurally impossible
    val path = tmpDir("graft_vindex_geom").toString
    VectorIndex.saveVectorIndex(emb, path, nCells = 8, nSub = 4,
      subDim = 16, nCodes = 8)
    val probed = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect().toSeq
    val scratch = Similarity.ivfPqTopK(emb, nCells = 8, nSub = 4,
      subDim = 16, nCodes = 8).collect().toSeq
    assert(probed == scratch, "probe must replay the stored geometry")
  }

  test("erasure: tombstone probe == vacuum probe; bytes gone; training ids refused") {
    val path = tmpDir("graft_vindex_erase").toString
    VectorIndex.saveVectorIndex(emb, path)
    val forget = emb.filter(col("vec_id") >= 32 && col("vec_id") % 7 === 5)
      .select("vec_id")
    val forgotten = forget.collect().map(_.getLong(0)).toSet
    assert(forgotten.nonEmpty, "fixture must plant a non-empty forget set")
    VectorIndex.forgetFromVectorIndex(spark, path, forget)
    val qs = emb.filter(col("vec_id") < 3)
    val tombstoned = VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
    assert(!tombstoned.exists(r => forgotten(r.getLong(1))),
      "tombstoned vectors must be invisible to probes immediately")
    VectorIndex.vacuumVectorIndex(spark, path)
    val vacuumed = VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
    assert(vacuumed == tombstoned, "vacuum must not change probe results")
    // physical erasure: no forgotten cid survives in the rewritten parquet
    val residual = spark.read.parquet(graft.ingest.Generations
        .currentBatchesDir(path, spark.sparkContext.hadoopConfiguration) +
        "/b0/codes")
      .filter(col("cid").isin(forgotten.toSeq: _*)).count()
    assert(residual == 0L, s"$residual erased rows still resident after vacuum")
    // quantizer-training ids are refused with the rebuild remedy
    val e = intercept[IllegalArgumentException] {
      VectorIndex.forgetFromVectorIndex(spark, path,
        emb.filter(col("vec_id") === 5).select("vec_id"))
    }
    assert(e.getMessage.contains("rebuildVectorIndex"),
      s"training-id erasure must name the remedy: ${e.getMessage}")
  }

  test("re-save wipes stale tombstones: a fresh index must see every vector") {
    val path = tmpDir("graft_vindex_resave").toString
    val qs = emb.filter(col("vec_id") < 3)
    val scratch = Similarity.ivfPqTopK(emb).collect().toSeq
    // forget a NON-TRAINING vector that actually appears in a top-5, so
    // the tombstone observably changes the ranking before the re-save
    val victim = scratch.map(_.getLong(1)).find(_ >= 32)
      .getOrElse(fail("fixture yields no ranked non-training vector"))
    VectorIndex.saveVectorIndex(emb, path)
    VectorIndex.forgetFromVectorIndex(spark, path,
      emb.filter(col("vec_id") === victim).select("vec_id"))
    val hidden = VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
    assert(hidden != scratch, "the tombstone must change the ranking")
    VectorIndex.saveVectorIndex(emb, path) // the documented re-save remedy
    val probed = VectorIndex.probeVectorIndex(spark, path, qs).collect().toSeq
    assert(probed == scratch,
      "a re-saved index must not inherit the previous index's tombstones")
  }

  test("heavy tombstoning: probes filter BEFORE ranking, so k fills from survivors alone") {
    val path = tmpDir("graft_vindex_heavy_tomb").toString
    val clean = tmpDir("graft_vindex_survivors").toString
    // tombstone two thirds of the non-training corpus — the
    // retention-lifecycle shape sim15 contrasts for the label filter:
    // a POST-filtering probe would rank the full corpus, drop the
    // tombstoned majority of its top-k, and silently return < k rows
    VectorIndex.saveVectorIndex(emb, path)
    VectorIndex.forgetFromVectorIndex(spark, path,
      emb.filter(col("vec_id") >= 32 && col("vec_id") % 3 =!= 0)
        .select("vec_id"))
    val qs = emb.filter(col("vec_id") < 3)
    val rows = VectorIndex.probeVectorIndex(spark, path, qs, k = 5).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L) &&
      byQ.values.forall(_.length == 5),
      s"every query must still fill k=5 from survivors: " +
        s"${byQ.view.mapValues(_.length).toMap}")
    assert(rows.forall { r =>
      val c = r.getAs[Long]("cid"); c < 32 || c % 3 == 0
    }, "no tombstoned cid may surface")
    // and the ranking is EXACTLY a fresh index over the survivors
    // (training set 0..31 survives, so the quantizers agree) — the
    // filter ran before scoring, not as a post-rank drop
    VectorIndex.saveVectorIndex(
      emb.filter(col("vec_id") < 32 || col("vec_id") % 3 === 0), clean)
    assert(rows.toSeq ==
      VectorIndex.probeVectorIndex(spark, clean, qs, k = 5).collect().toSeq,
      "tombstone-probe must equal the survivors-only index probe")
    // the drift audit shares the probes' erasure view: tombstoned rows
    // can't steer the rebuild trigger, so its sample counts survivors
    val audit = VectorIndex.auditVectorIndexDrift(spark, path,
      emb.select(col("vec_id").cast("long").as("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding"))
          .as("embedding")),
      threshold = 8.0).collect()
    val survivors = emb.filter(col("vec_id") < 32 || col("vec_id") % 3 === 0)
      .count()
    assert(audit.map(_.getAs[Long]("n_sampled")).sum == survivors,
      s"audit must census exactly the surviving rows: ${audit.toSeq}")
  }

  test("mostly-retired index: probes fill k from the live window alone") {
    val path = tmpDir("graft_vindex_heavy_ret").toString
    VectorIndex.saveVectorIndex(
      emb.filter(col("vec_id") < 32 || col("vec_id") % 3 === 0), path)
    VectorIndex.appendVectorIndex(
      emb.filter(col("vec_id") >= 32 && col("vec_id") % 3 =!= 0), path)
    assert(VectorIndex.retireVectorIndexBatches(spark, path,
      keepLast = 1) == Seq(0L))
    val qs = emb.filter(col("vec_id") < 3)
    val rows = VectorIndex.probeVectorIndex(spark, path, qs, k = 5).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L) &&
      byQ.values.forall(_.length == 5),
      s"every query must still fill k=5 from the live window: " +
        s"${byQ.view.mapValues(_.length).toMap}")
    assert(rows.forall { r =>
      val c = r.getAs[Long]("cid"); c >= 32 && c % 3 != 0
    }, "only live-batch candidates may surface")
  }

  test("sim22: drift audit — shifted batch's error strictly exceeds in-distribution; only it triggers rebuild") {
    val path = tmpDir("graft_vindex_drift").toString
    val asD = graft.functions.VectorFunctions.asDouble(col("embedding"))
    val base = emb.filter(col("vec_id") < 400)
    val shifted = emb.filter(col("vec_id") >= 400)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(asD, x => x * lit(3.0d) + lit(1.0d)).as("embedding"))
    VectorIndex.saveVectorIndex(base, path)
    VectorIndex.appendVectorIndex(shifted, path)
    val raw = base.select(col("vec_id").cast("long").as("vec_id"),
      asD.as("embedding")).unionByName(shifted)
    val rows = VectorIndex.auditVectorIndexDrift(spark, path, raw,
      threshold = 8.0, sampleMod = 2).collect()
    assert(rows.map(_.getAs[Long]("batch_id")).toSeq == Seq(0L, 1L))
    val Array(b0, b1) = rows
    assert(b1.getAs[Double]("mean_err") > b0.getAs[Double]("mean_err"),
      s"shifted batch must audit strictly worse: $b0 vs $b1")
    assert(!b0.getAs[Boolean]("drifted") && b1.getAs[Boolean]("drifted"),
      "only the shifted batch may trigger the rebuild")
    // a SAME-distribution append never trips the trigger: the audit
    // is a drift detector, not an append alarm
    val clean = tmpDir("graft_vindex_nodrift").toString
    VectorIndex.saveVectorIndex(base, clean)
    VectorIndex.appendVectorIndex(emb.filter(col("vec_id") >= 400), clean)
    val cleanRows = VectorIndex.auditVectorIndexDrift(spark, clean,
      emb.select(col("vec_id").cast("long").as("vec_id"),
        asD.as("embedding")),
      threshold = 8.0, sampleMod = 2).collect()
    assert(cleanRows.forall(!_.getAs[Boolean]("drifted")),
      s"in-distribution appends must not be flagged: ${cleanRows.toSeq}")
  }

  test("a crashed (markerless) append is invisible to probes; retry is clean") {
    val path = tmpDir("graft_vindex_crash").toString
    val keep = emb.filter(col("vec_id") < 40)
    VectorIndex.saveVectorIndex(keep, path)
    val before = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect().toSeq
    // simulate a crash mid-append: a batch dir with codes but NO marker
    val model = VectorIndex.loadModel(spark, path)
    Similarity.encodeIvfPq(emb.filter(col("vec_id") >= 40), model)
      .write.parquet(s"$path/batches/b999/codes")
    val after = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect().toSeq
    assert(after == before, "markerless batch must be ignored by readers")
    // the retry lands in a FRESH dir (b1000), never reusing b999
    VectorIndex.appendVectorIndex(emb.filter(col("vec_id") >= 40), path)
    assert(new java.io.File(s"$path/batches/b1000/_COMMITTED").exists(),
      "retry must commit one past the highest existing dir, committed or not")
    val retried = VectorIndex.probeVectorIndex(spark, path,
      emb.filter(col("vec_id") < 3)).collect().toSeq
    val scratch = Similarity.ivfPqTopK(emb).collect().toSeq
    assert(retried == scratch, "post-retry index must equal the full corpus")
  }
}
