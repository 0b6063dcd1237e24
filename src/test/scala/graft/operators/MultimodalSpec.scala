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

  test("mm07: banded pHash recall is high, precision exactly 1, hamming<=3 pairs never missed") {
    val r = graft.Registry.byName("mm07_phash_recall").run(spark, sf0001)
      .collect().head
    val (nExact, nBanded, nHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getBoolean(4), "every banded pair must be a true pair (precision 1)")
    assert(nHits == nBanded && nHits <= nExact)
    assert(r.getDouble(3) >= 0.8, s"recall ${r.getDouble(3)} collapsed")
    // pigeonhole: a pair with hamming <= 3 must share a clean band, so
    // missed pairs (if any) all sit in the 4..6 range — checked by
    // recomputing the exact <=3 subset and requiring full coverage
    import org.apache.spark.sql.functions._
    val media = Multimodal.syntheticMedia(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val tight = Multimodal.phashRecall(media, maxHamming = 3).collect().head
    assert(tight.getLong(0) == tight.getLong(2) || tight.getLong(0) == 0,
      s"hamming<=3 pairs are pigeonhole-guaranteed unless a bucket cap bites: $tight")
  }

  test("mm08: WavCodec parses a hand-built stereo WAV exactly and rejects corruption") {
    def wav(data: Array[Byte], ch: Short): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(ch)
        .putInt(8000).putInt(8000 * ch).putShort(ch).putShort(8.toShort)
        .put("data".getBytes("US-ASCII")).putInt(data.length)
        .put(data)
      b.array()
    }
    // stereo: frames (10, 200), (30, 40) -> ch0 sum 40 peak 30; ch1 sum 240 peak 200
    val st = Multimodal.WavCodec.decode(
      wav(Array(10, 200.toByte, 30, 40).map(_.toByte), 2))
    assert(st == Multimodal.WavCodec.DecodedWav(2, 8000, 8, 2, 40L, 240L, 30, 200))
    // mono: all samples land in channel 0
    val mo = Multimodal.WavCodec.decode(wav(Array[Byte](1, 2, 3), 1))
    assert(mo.channels == 1 && mo.nFrames == 3 && mo.sumCh0 == 6L && mo.sumCh1 == 0L)
    // corrupted magic and truncated data both refuse
    val good = wav(Array[Byte](1, 2), 2)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.WavCodec.decode(badMagic))
    intercept[IllegalArgumentException](
      Multimodal.WavCodec.decode(good.dropRight(1)))
    // a declared u32 data length >= 2^31 must reject, not wrap negative
    val wrap = wav(Array[Byte](1, 2), 2)
    wrap(40) = 0; wrap(41) = 0; wrap(42) = 0; wrap(43) = 0x80.toByte
    intercept[IllegalArgumentException](Multimodal.WavCodec.decode(wrap))
  }

  test("mm02 codec: adversarial PPM headers reject instead of overflowing Int") {
    // 3*w*h overflows Int for 50000x50000 — must still report truncation
    val huge = "P6\n50000 50000\n255\nxx".getBytes("US-ASCII")
    intercept[IllegalArgumentException](Multimodal.PpmCodec.decode(huge))
    // 2-byte maxval (maxval > 255) is unsupported and must refuse
    val wide = "P6\n1 1\n65535\nxxxxxx".getBytes("US-ASCII")
    intercept[IllegalArgumentException](Multimodal.PpmCodec.decode(wide))
  }
}
