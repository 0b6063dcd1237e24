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

  test("multimodal feature stub: deterministic features from payload bytes") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L) // "abc" = 3 bytes
    val f = out(0).getSeq[Float](2)
    assert(f.length == 8)
    assert(math.abs(f.head - 97f / 255f) < 1e-6) // 'a'
    assert(f(3) == 0f)                           // padded
    assert(out(1).getLong(1) == 0L)
  }
}
