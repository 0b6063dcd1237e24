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
