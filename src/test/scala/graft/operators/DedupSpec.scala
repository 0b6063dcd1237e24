package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup operators over corpora with planted duplicates (the synthetic
  * documents table has none, so these suites construct their own).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"
  private val nearDup = base.replace("lazy", "sleepy") // 1-word edit
  private val unrelated =
    "spark executes distributed queries by planning stages and shuffling data between partitions efficiently always"

  private def corpus = Seq(
    (0L, base), (1L, base), // exact pair
    (2L, nearDup),          // near-dup of 0/1
    (3L, unrelated),
    (4L, "tiny doc"),
  ).toDF("doc_id", "text")

  test("minhash LSH finds exact and near pairs, not unrelated ones") {
    val pairs = Dedup.minhashPairs(corpus, threshold = 0.5).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L)))           // exact dup: jaccard 1.0
    assert(keys.contains((0L, 2L)) || keys.contains((1L, 2L))) // near dup
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    val exact = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(exact.getDouble(2) == 1.0)
  }

  test("simhash finds near pairs within hamming budget") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 6).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L)))
    val h01 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getLong(2)
    assert(h01 == 0L) // identical text -> identical signature
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embedding near-dup finds planted high-cosine pair") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val v1 = v0.clone(); v1(0) = v0(0) + 0.01f // near-identical
    val rows = Seq((0L, v0.toSeq), (1L, v1.toSeq)) ++
      (2L until 40L).map(i => (i, vec().toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, threshold = 0.95).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    assert(pairs.forall(r => r.getDouble(2) >= 0.95))
  }

  test("exact dedup groups by content hash (dd01 semantics)") {
    val out = corpus.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    val dup = out.filter(col("n") > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keep") == 0L)
    assert(dup.head.getAs[Long]("n") == 2L)
  }
}
