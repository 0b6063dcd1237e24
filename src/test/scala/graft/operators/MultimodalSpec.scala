package graft.operators

import graft.SparkSpec

/** Perceptual-hash near-dup semantics, incl. the degenerate-bucket cap
  * that keeps the banded pair expansion bounded on collision-heavy
  * corpora (the hottest sf0.1 band bucket holds 340/5,000 docs).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // 32 low / 32 high bytes around the aHash mean: bits alternate 0/1
  private val base = Array.tabulate(64)(i => if (i % 2 == 0) 0.toByte else 200.toByte)
  // flipping byte 0 to high flips ONLY bit 0 -> band 0 differs, bands 1-3 match
  private val near = { val a = base.clone(); a(0) = 200.toByte; a }

  private def corpus = ((0L until 150L).map(i => (i, base)) ++
    Seq((1000L, near), (1001L, near.clone))).toDF("doc_id", "payload")

  test("degenerate buckets are dropped; discriminating buckets still pair") {
    val out = Multimodal.phashPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 150 identical payloads flood every one of their band buckets
    // past maxBucket=100 -> no pairs from them; the two near docs are
    // alone in their band-0 bucket -> exactly one pair, hamming 0
    assert(out.toSeq == Seq((1000L, 1001L, 0L)), out.toSeq.toString)
  }

  test("raising the cap restores the full within-bucket expansion") {
    val out = Multimodal.phashPairs(corpus, maxBucket = 1000).collect()
    // all 152 docs share bands 1-3 -> full pair expansion, all within
    // hamming 1 of each other
    assert(out.length == 152 * 151 / 2, out.length.toString)
    assert(out.forall(_.getLong(2) <= 1L))
  }
}
