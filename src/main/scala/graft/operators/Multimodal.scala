package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column plumbing (north-star LLM-pipeline additions,
  * SURVEY.md §2C): media payloads are opaque `binary` columns with
  * typed metadata; decode/feature-extract runs as a batched
  * per-partition operator.
  *
  * The decoder is [[PpmCodec]] — a REAL parser for binary PPM (P6), the
  * simplest actual image format: magic + ASCII dims/maxval header +
  * raw RGB triples. The container ships no JPEG/audio codecs, so
  * production swaps a heavier decoder (JNI/external process) behind
  * the same batched `mapPartitions` shape; everything here — binary
  * schema, header parse, pixel accumulation, typed feature schema —
  * runs for real and is oracle-checked (mm02). The testdata has no
  * media table, so payloads are synthesized from document text
  * ([[syntheticPpm]]) with a formula DuckDB replays byte-for-byte.
  */
object Multimodal {

  /** Minimal real image codec: binary PPM "P6" (netpbm). Parses the
    * header (magic, whitespace-separated width/height/maxval, one
    * whitespace) and accumulates per-channel pixel sums — exact
    * integers, so the decode is cross-engine hashable.
    */
  object PpmCodec {
    final case class Decoded(width: Int, height: Int, maxval: Int,
        sumR: Long, sumG: Long, sumB: Long)

    def decode(payload: Array[Byte]): Decoded = {
      require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
        "not a binary PPM (P6) payload")
      var pos = 2
      def skipWs(): Unit = {
        while (pos < payload.length && (payload(pos) == ' ' || payload(pos) == '\n' ||
          payload(pos) == '\r' || payload(pos) == '\t')) pos += 1
      }
      def int(): Int = {
        skipWs()
        require(pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9',
          s"malformed PPM header at byte $pos")
        // accumulate in Long: an adversarial digit string that wraps
        // Int back into a small positive value (e.g. 4294967297 -> 1)
        // must reject, not silently re-parse as a tiny dimension
        var v = 0L
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1
          require(v <= Int.MaxValue, s"PPM header value overflows at byte $pos")
        }
        v.toInt
      }
      val w = int(); val h = int(); val mv = int()
      require(w > 0 && h > 0 && mv >= 1 && mv <= 255,
        s"unsupported PPM geometry: ${w}x$h maxval=$mv (1-byte channels only)")
      pos += 1 // exactly one whitespace byte separates header from raster
      // Long arithmetic: 3*w*h overflows Int for adversarial headers,
      // which would turn this guard into a silent-garbage path
      require(payload.length.toLong - pos >= 3L * w * h,
        s"truncated raster: need ${3L * w * h} bytes, have ${payload.length - pos}")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < w * h) {
        sr += payload(pos + 3 * i) & 0xFF
        sg += payload(pos + 3 * i + 1) & 0xFF
        sb += payload(pos + 3 * i + 2) & 0xFF
        i += 1
      }
      Decoded(w, h, mv, sr, sg, sb)
    }
  }

  /** Minimal real AUDIO codec: canonical RIFF/WAVE, PCM unsigned 8-bit.
    * Parses the RIFF container (magics, little-endian sizes), the
    * `fmt ` chunk (PCM format tag, channel count, sample rate, block
    * align, bits per sample) and the `data` chunk, then accumulates
    * per-channel sample sums and peaks over the interleaved frames —
    * exact integers, so the decode is cross-engine hashable (the mm02
    * contract, audio edition).
    */
  object WavCodec {
    final case class DecodedWav(channels: Int, sampleRate: Int, bits: Int,
        nFrames: Int, sumCh0: Long, sumCh1: Long, peakCh0: Int, peakCh1: Int)

    private def u16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], p: Int): String =
      new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(b: Array[Byte]): DecodedWav = {
      require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        "not a RIFF/WAVE payload")
      require(u32(b, 4) == b.length - 8, "RIFF size mismatch")
      require(tag(b, 12) == "fmt " && u32(b, 16) == 16L, "expected 16-byte fmt chunk")
      val fmt = u16(b, 20); val ch = u16(b, 22)
      // range-check as Long BEFORE narrowing (the dataLenL precedent):
      // a declared u32 rate >= 2^31 would wrap to a negative Int and
      // decode the rest of the row normally
      val rateL = u32(b, 24)
      require(rateL <= Int.MaxValue, s"declared sample rate $rateL out of range")
      val rate = rateL.toInt; val blockAlign = u16(b, 32); val bits = u16(b, 34)
      require(fmt == 1 && bits == 8, s"only PCM u8 supported, got fmt=$fmt bits=$bits")
      require(ch >= 1 && ch <= 2 && blockAlign == ch, "mono/stereo u8 frames")
      require(tag(b, 36) == "data", "expected canonical data chunk at offset 36")
      // compare as Long BEFORE narrowing: a declared u32 length >= 2^31
      // would wrap negative as Int and sail through both checks
      val dataLenL = u32(b, 40)
      require(b.length.toLong - 44 >= dataLenL && dataLenL % ch == 0,
        "truncated data chunk")
      val dataLen = dataLenL.toInt
      val nFrames = dataLen / ch
      var (s0, s1) = (0L, 0L); var (p0, p1) = (0, 0)
      var i = 0
      while (i < nFrames) {
        val v0 = b(44 + ch * i) & 0xFF
        s0 += v0; if (v0 > p0) p0 = v0
        if (ch == 2) {
          val v1 = b(44 + ch * i + 1) & 0xFF
          s1 += v1; if (v1 > p1) p1 = v1
        }
        i += 1
      }
      DecodedWav(ch, rate, bits, nFrames, s0, s1, p0, p1)
    }
  }

  final case class WavFeatureRow(doc_id: Long, n_bytes: Long, channels: Int,
      sample_rate: Int, bits: Int, n_frames: Int, sum_ch0: Long, sum_ch1: Long,
      peak_ch0: Int, peak_ch1: Int)

  /** Batched WAV decode (the mapPartitions shape extractFeatures uses). */
  def extractWavFeatures(media: DataFrame): DataFrame = {
    val ds = media.select(col("doc_id"), col("payload"))
      .as[MediaRow](Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.map { r =>
        val d = WavCodec.decode(r.payload)
        WavFeatureRow(r.doc_id, r.payload.length.toLong, d.channels,
          d.sampleRate, d.bits, d.nFrames, d.sumCh0, d.sumCh1, d.peakCh0, d.peakCh1)
      }
    }(Encoders.product[WavFeatureRow]).toDF()
  }

  /** documents.text → a REAL canonical WAV payload: a constant 44-byte
    * RIFF/fmt/data header (stereo PCM u8 @ 8 kHz, 16 frames) built once
    * in Scala, plus 32 sample bytes = the ASCII hex of md5(text) —
    * DuckDB rebuilds the identical interleaved sample stream from the
    * same digest.
    */
  def syntheticWav(docs: DataFrame): DataFrame = {
    val dataLen = 32
    val hdr = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(2.toShort) // PCM, stereo
      .putInt(8000).putInt(16000)              // rate, byte rate
      .putShort(2.toShort).putShort(8.toShort) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    docs.select(col("doc_id"),
      concat(lit(hdr.array()), md5(col("text").cast("binary")).cast("binary"))
        .as("payload"))
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class FeatureRow(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, maxval: Int, sum_r: Long, sum_g: Long, sum_b: Long,
      feature: Array[Float])

  /** Batched decode/feature-extract: one codec instance per partition,
    * rows streamed through it (the Scala analogue of a pandas-batched
    * UDF — `Dataset.mapPartitions`, not a per-row UDF). The feature
    * vector is the per-channel mean scaled to [0,1] in float32: exact
    * integer sums, ONE float division each — deterministic across
    * engines and retries.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val ds = media.select(col("doc_id"), col("payload"))
      .as[MediaRow](Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      // per-partition codec setup would go here (decoder init is the
      // expensive part in real pipelines)
      it.map { r =>
        val d = PpmCodec.decode(r.payload)
        val denom = (d.width * d.height * d.maxval).toFloat
        FeatureRow(r.doc_id, r.payload.length.toLong, d.width, d.height,
          d.maxval, d.sumR, d.sumG, d.sumB,
          Array(d.sumR.toFloat / denom, d.sumG.toFloat / denom, d.sumB.toFloat / denom))
      }
    }(Encoders.product[FeatureRow]).toDF()
  }

  /** documents.text → opaque binary payload column. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** documents.text → a REAL 4×4 binary PPM payload: "P6\n4 4\n255\n"
    * + 48 raster bytes taken from the ASCII hex of two text digests
    * (48 ASCII chars = 48 bytes — no UTF-8 width ambiguity, and DuckDB
    * rebuilds the identical raster from `md5(text) || md5('x:'||text)`).
    */
  def syntheticPpm(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit("P6\n4 4\n255\n"),
        substring(concat(md5(col("text").cast("binary")),
          md5(concat(lit("x:"), col("text")).cast("binary"))), 1, 48))
        .cast("binary").as("payload"))

  /** Frame sampling: keep every `stride`-th fixed-size frame of the
    * payload (the video keyframe-sampling shape). Pure expressions —
    * binary slicing + sequence stepping stay in the plan, the decoder
    * stub never runs on dropped frames.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame =
    media.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, greatest(cast(ceil(length(payload) / $frameBytes.0) as int) - 1, 0), $stride),
            i -> substring(payload, i * $frameBytes + 1, $frameBytes))"""))
        .as(Seq("frame_idx", "frame")))

  /** Resize a feature vector to `dim` (truncate or zero-pad) — the
    * shape-normalization step before batching features into a model.
    */
  def resizeFeature(features: DataFrame, dim: Int): DataFrame =
    features.withColumn("feature", expr(
      s"""transform(sequence(0, ${dim - 1}),
          i -> coalesce(try_element_at(feature, i + 1), cast(0.0 as float)))"""))

  // -------------------------------------------------------------- mm01
  // Metadata over binary columns: byte length + content digest — pure
  // expressions, oracle-checkable.
  private val mm01 = QueryDef(
    "mm01_binary_meta",
    (s, dir) =>
      syntheticMedia(Tables(s, dir).documents)
        .select(col("doc_id"),
          length(col("payload")).cast("bigint").as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS payload_md5 FROM documents ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- mm02
  // REAL decode, oracle-checked end to end (round-7 stub retirement):
  // the P6 payloads synthesized from text digests run through the
  // actual header parser + raster accumulation in mapPartitions, and
  // DuckDB recomputes every integer from the same digest hex — a
  // hash-exact certificate that the codec parses what the synthesizer
  // wrote. The raster chars are ASCII hex digits, so each channel sum
  // is a sum of 16 `ord()`s over known positions (r/g/b interleave at
  // stride 3).
  private val mm02 = QueryDef(
    "mm02_feature_extract",
    (s, dir) =>
      extractFeatures(syntheticPpm(Tables(s, dir).documents))
        .select("doc_id", "n_bytes", "width", "height", "maxval",
          "sum_r", "sum_g", "sum_b")
        .orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id,
          substr(md5(text) || md5('x:' || text), 1, 48) AS px FROM documents)
      SELECT doc_id, CAST(59 AS BIGINT) AS n_bytes,
        4 AS width, 4 AS height, 255 AS maxval,
        CAST(list_sum(list_transform(range(16),
          i -> ord(substr(px, 3 * i + 1, 1)))) AS BIGINT) AS sum_r,
        CAST(list_sum(list_transform(range(16),
          i -> ord(substr(px, 3 * i + 2, 1)))) AS BIGINT) AS sum_g,
        CAST(list_sum(list_transform(range(16),
          i -> ord(substr(px, 3 * i + 3, 1)))) AS BIGINT) AS sum_b
      FROM d ORDER BY doc_id"""),
  )

  // ------------------------------------------------------------- mm02v
  // Float-feature twin: the typed Array[Float] feature column (channel
  // means in [0,1]) is ALSO cross-engine exact — each element is one
  // float32 division of an exact integer sum by 4080, bit-identical
  // in both engines, widened to double for the dump.
  private val mm02v = QueryDef(
    "mm02v_feature_oracle",
    (s, dir) =>
      extractFeatures(syntheticPpm(Tables(s, dir).documents))
        .select((Seq(col("doc_id"), col("n_bytes")) ++
          (0 until 3).map(i =>
            element_at(col("feature"), i + 1).cast("double").as(s"f$i"))): _*)
        .orderBy("doc_id"),
    Some(s"""WITH d AS (SELECT doc_id,
        substr(md5(text) || md5('x:' || text), 1, 48) AS px FROM documents)
      SELECT doc_id, CAST(59 AS BIGINT) AS n_bytes,
        ${(0 until 3).map(c =>
          s"""CAST(CAST(list_sum(list_transform(range(16),
            i -> ord(substr(px, 3 * i + ${c + 1}, 1)))) AS FLOAT)
            / CAST(4080 AS FLOAT) AS DOUBLE) AS f$c""").mkString(",\n        ")}
      FROM d ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- mm08
  // The audio twin of mm02: REAL RIFF/WAVE parsing (magics, LE sizes,
  // fmt chunk, interleaved PCM u8 frames) over payloads whose 32
  // sample bytes are md5(text) hex — channel 0 takes even frame
  // positions, channel 1 odd, and DuckDB recomputes every sum/peak
  // from the same digest. Constants (76 bytes, stereo, 8 kHz, 8-bit,
  // 16 frames) are emitted by the PARSER on the Spark side and as
  // literals in the oracle: a header-parse bug flips the row red.
  private val mm08 = QueryDef(
    "mm08_wav_features",
    (s, dir) =>
      extractWavFeatures(syntheticWav(Tables(s, dir).documents))
        .select("doc_id", "n_bytes", "channels", "sample_rate", "bits",
          "n_frames", "sum_ch0", "sum_ch1", "peak_ch0", "peak_ch1")
        .orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id, md5(text) AS px FROM documents)
      SELECT doc_id, CAST(76 AS BIGINT) AS n_bytes,
        2 AS channels, 8000 AS sample_rate, 8 AS bits, 16 AS n_frames,
        CAST(list_sum(list_transform(range(16),
          i -> ord(substr(px, 2 * i + 1, 1)))) AS BIGINT) AS sum_ch0,
        CAST(list_sum(list_transform(range(16),
          i -> ord(substr(px, 2 * i + 2, 1)))) AS BIGINT) AS sum_ch1,
        CAST(list_max(list_transform(range(16),
          i -> ord(substr(px, 2 * i + 1, 1)))) AS INT) AS peak_ch0,
        CAST(list_max(list_transform(range(16),
          i -> ord(substr(px, 2 * i + 2, 1)))) AS INT) AS peak_ch1
      FROM d ORDER BY doc_id"""),
  )

  // -------------------------------------------------------------- mm03
  // Chunk-level dedup (CDC-lite): fixed 64-char windows hashed and
  // profiled corpus-wide — the payload-chunking shape used for blob
  // dedup/delta storage, oracle-checked cross-engine.
  private val mm03 = QueryDef(
    "mm03_chunk_dedup",
    (s, dir) =>
      Tables(s, dir).documents
        // empty-text guard: Spark's sequence(0, -1) defaults to step -1
        // and would emit 2 phantom chunks where DuckDB's range(0) emits
        // none; filtering zero-length docs keeps the engines aligned
        .filter(length(col("text")) > 0)
        .select(explode(expr(
          """transform(sequence(0, cast(ceil(length(text) / 64.0) as int) - 1),
             i -> md5(cast(substring(text, i * 64 + 1, 64) as binary)))""")).as("h"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("h")).as("n_distinct_chunks")),
    Some("""WITH c AS (SELECT unnest(list_transform(
          range(CAST(ceil(length(text) / 64.0) AS INT)),
          i -> md5(substring(text, i * 64 + 1, 64)))) AS h
        FROM documents WHERE length(text) > 0)
      SELECT COUNT(*) AS n_chunks, COUNT(DISTINCT h) AS n_distinct_chunks FROM c"""),
  )

  // -------------------------------------------------------------- mm06
  /** Content-defined chunking (CDC — the rolling-window boundary rule
    * behind dedup storage and blob delta-sync), completing mm03: a
    * chunk boundary falls after position i wherever the hash of the
    * 16-char window ending at i satisfies H % 64 == 0, so boundaries
    * depend only on LOCAL content and an insertion shifts — not
    * destroys — the chunk alignment. The declared row PROVES the
    * property it exists for: the same slice chunked raw and with a
    * 2-char prefix insertion shares ~all CDC chunk hashes (only each
    * doc's first chunk changes) while the fixed 64-char grid (mm03's
    * scheme) loses alignment entirely. Window hash is the established
    * md5-prefix integer idiom, so DuckDB replays boundaries, chunks
    * and both shared-fractions bit-for-bit.
    *
    * Scale shape: pure per-row expressions (window hash + boundary
    * filter + chunk slice fused into the scan) followed by one
    * explode + two-key aggregation; bounded to the doc_id < 200 slice
    * like dd14 — the per-position md5 is the eval harness cost, and a
    * production deployment lifts the window hash into a codegen'd
    * rolling-hash expression.
    */
  private val mm06 = {
    def cdc(t: String): String =
      s"""transform(sequence(0, size(bounds_$t) - 2),
         k -> md5(cast(substring($t, element_at(bounds_$t, k + 1) + 1,
           element_at(bounds_$t, k + 2) - element_at(bounds_$t, k + 1)) as binary)))"""
    def fixed(t: String): String =
      s"""transform(sequence(0, cast(ceil(length($t) / 64.0) as int) - 1),
         i -> md5(cast(substring($t, i * 64 + 1, 64) as binary)))"""
    def bounds(t: String): String =
      s"""array_sort(array_distinct(concat(array(0),
         filter(sequence(16, length($t)),
           i -> CAST(conv(substring(md5(cast(substring($t, i - 15, 16) as binary)), 1, 8), 16, 10) AS BIGINT) % 64 = 0),
         array(length($t)))))"""
    QueryDef(
      "mm06_cdc_chunks",
      (s, dir) => {
        val d = Tables(s, dir).documents
          .filter(col("doc_id") < 200 && length(col("text")) >= 16)
          .withColumn("orig", col("text"))
          .withColumn("shift", concat(lit("X:"), col("text")))
          .withColumn("bounds_orig", expr(bounds("orig")))
          .withColumn("bounds_shift", expr(bounds("shift")))
          .select(
            expr(cdc("orig")).as("cdc_o"), expr(cdc("shift")).as("cdc_s"),
            expr(fixed("orig")).as("fx_o"), expr(fixed("shift")).as("fx_s"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def dist(c: String) = d.select(explode(col(c)).as("h")).distinct()
        def shared(a: String, b: String) =
          dist(a).join(dist(b), "h").agg(count(lit(1)).as("n"))
        val out = d.select(expr("size(cdc_o)").as("n")).agg(sum(col("n")).as("n_cdc_chunks_orig"))
          .crossJoin(d.select(explode(col("cdc_s"))).agg(count(lit(1)).as("n_cdc_chunks_shift")))
          .crossJoin(dist("cdc_o").agg(count(lit(1)).as("n_cdc_distinct_orig")))
          .crossJoin(shared("cdc_o", "cdc_s").withColumnRenamed("n", "cdc_shared"))
          .crossJoin(dist("fx_o").agg(count(lit(1)).as("n_fixed_distinct_orig")))
          .crossJoin(shared("fx_o", "fx_s").withColumnRenamed("n", "fixed_shared"))
          .select(col("n_cdc_chunks_orig"), col("n_cdc_chunks_shift"),
            col("cdc_shared"),
            (col("cdc_shared").cast("double") / col("n_cdc_distinct_orig"))
              .as("cdc_shared_frac"),
            col("fixed_shared"),
            (col("fixed_shared").cast("double") / col("n_fixed_distinct_orig"))
              .as("fixed_shared_frac"))
          .localCheckpoint(eager = true)
        d.unpersist(blocking = false)
        out
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
          WHERE doc_id < 200 AND length(text) >= 16),
        fl AS (SELECT doc_id, 'orig' AS flavor, text AS t FROM d
          UNION ALL SELECT doc_id, 'shift', 'X:' || text FROM d),
        bb AS (SELECT doc_id, flavor, t,
            list_sort(list_distinct(list_concat(list_concat([0],
              list_filter(range(16, len(t) + 1),
                i -> ('0x' || substr(md5(substr(t, i - 15, 16)), 1, 8))::BIGINT % 64 = 0)),
              [len(t)]))) AS bounds
          FROM fl),
        c AS (SELECT doc_id, flavor, unnest(list_transform(range(len(bounds) - 1),
            k -> md5(substr(t, bounds[k + 1] + 1, bounds[k + 2] - bounds[k + 1])))) AS h
          FROM bb),
        f AS (SELECT doc_id, flavor, unnest(list_transform(
            range(CAST(ceil(len(t) / 64.0) AS INT)),
            i -> md5(substr(t, i * 64 + 1, 64)))) AS h
          FROM fl),
        cs AS (SELECT COUNT(*) AS n FROM (
          SELECT DISTINCT h FROM c WHERE flavor = 'orig'
          INTERSECT SELECT DISTINCT h FROM c WHERE flavor = 'shift')),
        fs AS (SELECT COUNT(*) AS n FROM (
          SELECT DISTINCT h FROM f WHERE flavor = 'orig'
          INTERSECT SELECT DISTINCT h FROM f WHERE flavor = 'shift'))
        SELECT
          (SELECT COUNT(*) FROM c WHERE flavor = 'orig') AS n_cdc_chunks_orig,
          (SELECT COUNT(*) FROM c WHERE flavor = 'shift') AS n_cdc_chunks_shift,
          (SELECT n FROM cs) AS cdc_shared,
          CAST((SELECT n FROM cs) AS DOUBLE) /
            (SELECT COUNT(DISTINCT h) FROM c WHERE flavor = 'orig') AS cdc_shared_frac,
          (SELECT n FROM fs) AS fixed_shared,
          CAST((SELECT n FROM fs) AS DOUBLE) /
            (SELECT COUNT(DISTINCT h) FROM f WHERE flavor = 'orig') AS fixed_shared_frac"""),
    )
  }

  // -------------------------------------------------------------- mm04
  // Frame sampling as a declared, oracle-checked query: every 4th
  // 16-byte frame of each payload, fingerprinted. The oracle recomputes
  // the frame grid with range-stepping (sampled byte offset i = 16·4·k,
  // so frame_idx = i/4 on the raw frame index) and slices the text —
  // char positions equal byte positions on this corpus (ASCII; the
  // technique mm03 established).
  private val mm04 = QueryDef(
    "mm04_frame_sample",
    (s, dir) =>
      sampleFrames(syntheticMedia(Tables(s, dir).documents))
        .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
          md5(col("frame")).as("frame_md5"),
          length(col("frame")).cast("bigint").as("frame_bytes"))
        .orderBy("doc_id", "frame_idx"),
    Some("""WITH d AS (SELECT doc_id, text,
          CAST(ceil(length(text) / 16.0) AS INT) AS nf FROM documents),
      s AS (SELECT doc_id, text,
          unnest(range(0, greatest(nf - 1, 0) + 1, 4)) AS i FROM d)
      SELECT doc_id, CAST(i // 4 AS BIGINT) AS frame_idx,
        md5(substring(text, i * 16 + 1, 16)) AS frame_md5,
        CAST(octet_length(encode(substring(text, i * 16 + 1, 16))) AS BIGINT) AS frame_bytes
      FROM s ORDER BY doc_id, frame_idx"""),
  )

  // ------------------------------------------------------------- mm05
  /** Perceptual-hash (aHash) near-dup detection over binary payloads —
    * the image-dedup shape: hash the first 64 payload "pixels" against
    * their mean (64*byte > sum keeps the threshold in exact integer
    * arithmetic), band the 64-bit hash into 4×16-bit LSH keys, pair
    * within band buckets (equi-join, never all-pairs), and verify
    * hamming distance on the full hash via two 32-bit bit_count XORs.
    * In production the byte window comes from a real decoder's
    * downsampled luma plane; the banding/verify pipeline is identical.
    *
    * The oracle regenerates hashes from the SAME payload bytes but
    * pairs with an independent quadratic OR-of-bands formulation — a
    * hash match proves the banded equi-join misses nothing (a pair
    * within hamming 6 of 64 bits shares at least one of 4 bands only
    * probabilistically; both sides implement the same any-band
    * candidate rule, so the check is of the bucketing arithmetic).
    * Both sides also implement the same degenerate-bucket cap
    * (maxBucket=100): buckets denser than the cap are dropped from
    * candidate generation — see the shape note inside [[phashPairs]].
    */
  private def aHashBands(media: DataFrame): DataFrame = {
    // byte i of the payload as an int (hex->dec round-trip works for
    // arbitrary binary, not just UTF-8 text).
    //
    // Shape note (measured, not theoretical — twice now). Any plan
    // where `bsum` is a PROJECTED alias gets destroyed by
    // CollapseProject: the 64-element byte fold inlines into every
    // consumer — first round, into each of 64×4 band-fold lambda
    // elements (~85 s / 500 rows); second round, into the per-exploded-
    // row bit predicate (64 folds × 64 elements per doc ≈ 6 s of the
    // sf0.1 bench, measured by stage bisection). The fix is to make
    // bsum an AGGREGATION OUTPUT: explode to (pos, byte) rows —
    // the generator's transform runs once per doc — aggregate per doc
    // into (bsum, collected (pos, byte) list), then fold the four band
    // words over the collected list. Projections cannot collapse
    // through the aggregate, so bsum is a plain column in the fold
    // lambda and per-doc work is O(64). One doc-keyed shuffle of
    // 64-row groups — the plan that scales.
    val byteArr =
      "transform(sequence(1, 64), i -> cast(conv(hex(substring(payload, i, 1)), 16, 10) as bigint))"
    def band(j: Int) =
      expr(s"""aggregate(pb, 0L, (acc, t) ->
        acc + if(t.pos div 16 = $j AND 64L * t.byte > bsum,
                 shiftleft(1L, t.pos % 16), 0L))""").as(s"b$j")
    media.filter(length(col("payload")) >= 64)
      .select(col("doc_id"), posexplode(expr(byteArr)).as(Seq("pos", "byte")))
      .groupBy("doc_id")
      .agg(sum(col("byte")).as("bsum"),
        collect_list(struct(col("pos"), col("byte"))).as("pb"))
      .select(col("doc_id"), band(0), band(1), band(2), band(3))
  }

  def phashPairs(media: DataFrame, maxHamming: Int = 6,
      maxBucket: Int = 100): DataFrame = {
    // Bucket-bounded pair expansion (Dedup.bandCandidates shape) with
    // the FULL hash carried through the buckets: group per band value,
    // DROP degenerate buckets, expand (doc, h0, h1) pairs inside the
    // survivors, and verify hamming directly on the carried halves.
    //
    // Two scale properties bought here (vs the round's first cut, the
    // slowest bench entry at 8.7 s/sf0.1):
    //  - the payload-hashing subtree evaluates ONCE — the previous
    //    shape re-joined the band table for each verify side, so the
    //    64-byte hash ran 3x per doc and the verify paid two joins of
    //    the 350k-pair candidate stream against it; carrying 2 longs
    //    through the bucket expansion makes the whole operator one
    //    aggregation + one explode, join-free;
    //  - degenerate buckets are capped (maxBucket=100): aHash over
    //    near-uniform media is collision-heavy (the hottest 16-bit
    //    band bucket holds 340 of 5,000 docs at sf0.1) and uncapped
    //    within-bucket expansion grows ~n² per bucket. The cap is the
    //    stop-fingerprint trade from dd06: a bucket that dense carries
    //    no discriminating signal.
    val bands = aHashBands(media)
    val keyed = bands.select(col("doc_id"),
        (col("b0").bitwiseOR(shiftleft(col("b1"), 16))).as("h0"),
        (col("b2").bitwiseOR(shiftleft(col("b3"), 16))).as("h1"),
        explode(array(
          (0 until 4).map(j => struct(lit(j).as("band"), col(s"b$j").as("v"))): _*)).as("k"))
      .select(col("doc_id"), col("h0"), col("h1"),
        col("k.band").as("band"), col("k.v").as("v"))
    keyed.groupBy(col("band"), col("v"))
      .agg(collect_list(struct(col("doc_id"), col("h0"), col("h1"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """filter(flatten(transform(ids, x -> transform(ids, y -> struct(x AS a, y AS b)))),
           p -> p.a.doc_id < p.b.doc_id)""")).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        expr("bit_count(p.a.h0 ^ p.b.h0) + bit_count(p.a.h1 ^ p.b.h1)")
          .cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  private val mm05 = QueryDef(
    "mm05_phash_neardup",
    (s, dir) => phashPairs(syntheticMedia(Tables(s, dir).documents)),
    Some("""WITH h AS (SELECT doc_id,
        -- first 64 BYTES of the UTF-8 payload via hex slicing, matching
        -- the engine's conv(hex(substring(payload, i, 1))) exactly —
        -- unicode(text[i+1]) read CODEPOINTS and diverges on any
        -- non-ASCII document
        list_transform(range(64),
          i -> ('0x' || substr(hex(encode(text)), 2 * i + 1, 2))::BIGINT) AS bytes
      FROM documents WHERE octet_length(encode(text)) >= 64),
    s AS (SELECT doc_id, bytes, CAST(list_sum(bytes) AS BIGINT) AS bsum FROM h),
    bits AS (SELECT doc_id,
        list_transform(range(64), i -> CASE WHEN 64 * bytes[i+1] > bsum THEN 1 ELSE 0 END) AS bit
      FROM s),
    bands AS (SELECT doc_id,
        CAST(list_sum(list_transform(range(16), i -> bit[i+1] << i)) AS BIGINT) AS b0,
        CAST(list_sum(list_transform(range(16), i -> bit[i+17] << i)) AS BIGINT) AS b1,
        CAST(list_sum(list_transform(range(16), i -> bit[i+33] << i)) AS BIGINT) AS b2,
        CAST(list_sum(list_transform(range(16), i -> bit[i+49] << i)) AS BIGINT) AS b3
      FROM bits),
    k AS (SELECT doc_id, 0 AS band, b0 AS v FROM bands
      UNION ALL SELECT doc_id, 1, b1 FROM bands
      UNION ALL SELECT doc_id, 2, b2 FROM bands
      UNION ALL SELECT doc_id, 3, b3 FROM bands),
    sz AS (SELECT band, v, COUNT(*) AS n FROM k GROUP BY 1, 2),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b
      ON a.doc_id < b.doc_id
      LEFT JOIN sz s0 ON s0.band = 0 AND s0.v = a.b0
      LEFT JOIN sz s1 ON s1.band = 1 AND s1.v = a.b1
      LEFT JOIN sz s2 ON s2.band = 2 AND s2.v = a.b2
      LEFT JOIN sz s3 ON s3.band = 3 AND s3.v = a.b3
      WHERE (a.b0 = b.b0 AND s0.n <= 100) OR (a.b1 = b.b1 AND s1.n <= 100)
         OR (a.b2 = b.b2 AND s2.n <= 100) OR (a.b3 = b.b3 AND s3.n <= 100)),
    ham AS (SELECT doc_a, doc_b,
        bit_count(xor(ba.b0 | (ba.b1 << 16), bb.b0 | (bb.b1 << 16))) +
        bit_count(xor(ba.b2 | (ba.b3 << 16), bb.b2 | (bb.b3 << 16))) AS hamming
      FROM cand JOIN bands ba ON ba.doc_id = doc_a JOIN bands bb ON bb.doc_id = doc_b)
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming FROM ham
    WHERE hamming <= 6 ORDER BY doc_a, doc_b"""),
  )

  // -------------------------------------------------------------- mm07
  /** Recall eval for the banded pHash join (the dd14/fz03 pattern in
    * the image domain): mm05's production path bands the 64-bit aHash
    * into 4×16-bit keys, which is LOSSY twice — a pair with hamming
    * 4–6 can spread its differing bits across all four bands
    * (pigeonhole only guarantees a clean band at hamming ≤ 3), and
    * degenerate buckets are capped at 100. This row measures what
    * those trades cost against the exact quadratic hamming scan
    * (bounded reference, the dd10 contract — fine at the declared
    * scale, sampled in production), and certifies precision is 1 by
    * construction (every banded pair is hamming-verified, so banded ⊆
    * exact).
    */
  def phashRecall(media: DataFrame, maxHamming: Int = 6): DataFrame = {
    val hs = aHashBands(media).select(col("doc_id"),
      col("b0").bitwiseOR(shiftleft(col("b1"), 16)).as("h0"),
      col("b2").bitwiseOR(shiftleft(col("b3"), 16)).as("h1"))
    val exact = hs.select(col("doc_id").as("doc_a"), col("h0").as("a0"), col("h1").as("a1"))
      .join(hs.select(col("doc_id").as("doc_b"), col("h0").as("c0"), col("h1").as("c1")),
        col("doc_a") < col("doc_b"))
      .filter(expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1)") <= maxHamming)
      .select("doc_a", "doc_b")
    val banded = phashPairs(media, maxHamming).select("doc_a", "doc_b")
    exact.withColumn("e", lit(1L))
      .join(banded.withColumn("bd", lit(1L)), Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(coalesce(col("e"), lit(0L))).as("n_exact"),
        sum(coalesce(col("bd"), lit(0L))).as("n_banded"),
        sum(when(col("e").isNotNull && col("bd").isNotNull, 1L).otherwise(0L))
          .as("n_hits"))
      .select(col("n_exact"), col("n_banded"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact")).as("recall"),
        (col("n_banded") === col("n_hits")).as("banded_subset"))
  }

  private val mm07 = QueryDef(
    "mm07_phash_recall",
    (s, dir) => phashRecall(syntheticMedia(Tables(s, dir).documents)),
    Some("""WITH h AS (SELECT doc_id,
        list_transform(range(64),
          i -> ('0x' || substr(hex(encode(text)), 2 * i + 1, 2))::BIGINT) AS bytes
      FROM documents WHERE octet_length(encode(text)) >= 64),
    s AS (SELECT doc_id, bytes, CAST(list_sum(bytes) AS BIGINT) AS bsum FROM h),
    bits AS (SELECT doc_id,
        list_transform(range(64), i -> CASE WHEN 64 * bytes[i+1] > bsum THEN 1 ELSE 0 END) AS bit
      FROM s),
    bands AS (SELECT doc_id,
        CAST(list_sum(list_transform(range(16), i -> bit[i+1] << i)) AS BIGINT) AS b0,
        CAST(list_sum(list_transform(range(16), i -> bit[i+17] << i)) AS BIGINT) AS b1,
        CAST(list_sum(list_transform(range(16), i -> bit[i+33] << i)) AS BIGINT) AS b2,
        CAST(list_sum(list_transform(range(16), i -> bit[i+49] << i)) AS BIGINT) AS b3
      FROM bits),
    ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.b0 | (a.b1 << 16), b.b0 | (b.b1 << 16))) +
            bit_count(xor(a.b2 | (a.b3 << 16), b.b2 | (b.b3 << 16))) <= 6),
    k AS (SELECT doc_id, 0 AS band, b0 AS v FROM bands
      UNION ALL SELECT doc_id, 1, b1 FROM bands
      UNION ALL SELECT doc_id, 2, b2 FROM bands
      UNION ALL SELECT doc_id, 3, b3 FROM bands),
    sz AS (SELECT band, v, COUNT(*) AS n FROM k GROUP BY 1, 2),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b
      ON a.doc_id < b.doc_id
      LEFT JOIN sz s0 ON s0.band = 0 AND s0.v = a.b0
      LEFT JOIN sz s1 ON s1.band = 1 AND s1.v = a.b1
      LEFT JOIN sz s2 ON s2.band = 2 AND s2.v = a.b2
      LEFT JOIN sz s3 ON s3.band = 3 AND s3.v = a.b3
      WHERE (a.b0 = b.b0 AND s0.n <= 100) OR (a.b1 = b.b1 AND s1.n <= 100)
         OR (a.b2 = b.b2 AND s2.n <= 100) OR (a.b3 = b.b3 AND s3.n <= 100)),
    bd AS (SELECT doc_a, doc_b FROM cand JOIN bands ba ON ba.doc_id = doc_a
      JOIN bands bb ON bb.doc_id = doc_b
      WHERE bit_count(xor(ba.b0 | (ba.b1 << 16), bb.b0 | (bb.b1 << 16))) +
            bit_count(xor(ba.b2 | (ba.b3 << 16), bb.b2 | (bb.b3 << 16))) <= 6),
    f AS (SELECT COALESCE(e.doc_a, b.doc_a) AS doc_a,
        CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END AS e,
        CASE WHEN b.doc_a IS NOT NULL THEN 1 ELSE 0 END AS bdd
      FROM ex e FULL OUTER JOIN bd b
        ON e.doc_a = b.doc_a AND e.doc_b = b.doc_b)
    SELECT CAST(SUM(e) AS BIGINT) AS n_exact,
      CAST(SUM(bdd) AS BIGINT) AS n_banded,
      CAST(SUM(e * bdd) AS BIGINT) AS n_hits,
      CAST(SUM(e * bdd) AS DOUBLE) / SUM(e) AS recall,
      SUM(bdd) = SUM(e * bdd) AS banded_subset
    FROM f"""),
  )

  // -------------------------------------------------------------- mm09
  /** Cross-video near-dup at FRAME granularity — the clip-copy shape
    * video corpus dedup needs (a re-upload shares most sampled frames;
    * a reaction video embeds a clip, sharing a contiguous subset):
    * mm04's sampled-frame grid, fingerprinted per frame, paired by
    * frame-hash equi-join — never all-pairs — with two bounds that
    * keep the candidate stream linear-ish at corpus scale:
    * partial tail frames are dropped (a short tail matches other
    * tails vacuously), and frames shared by more than `maxBucket`
    * docs are STOP-FRAMES (the dd06 stop-fingerprint / mm05
    * degenerate-bucket trade — black frames, title cards, silence
    * carry no discriminating signal and would expand ~n² per bucket).
    * Pairs sharing at least `minShared` distinct frames emit with
    * their containment = shared / min(|frames_a|, |frames_b|), the
    * dd10 asymmetric-overlap measure, so a short clip embedded in a
    * long video still scores near 1. Everything is aggregations over
    * one frame table + one equi-join: partial aggregation and AQE
    * sizing apply as-is at 100 TB.
    */
  def frameNearDup(media: DataFrame, frameBytes: Int = 16, stride: Int = 4,
      maxBucket: Int = 50, minShared: Long = 2L): DataFrame = {
    val f = sampleFrames(media, frameBytes, stride)
      .filter(length(col("frame")) === frameBytes)
      .select(col("doc_id"), md5(col("frame")).as("h"))
      .distinct()
    val sizes = f.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    // stop-frame drop: frequency computed over distinct (doc, frame)
    val keep = f.join(
      f.groupBy("h").agg(count(lit(1)).as("n")).filter(col("n") <= maxBucket)
        .select("h"),
      "h")
    val pairs = keep.select(col("doc_id").as("doc_a"), col("h"))
      .join(keep.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("bigint").as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("nf").as("nf_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nf").as("nf_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared_frames"),
        col("nf_a").cast("bigint").as("nf_a"),
        col("nf_b").cast("bigint").as("nf_b"),
        (col("shared_frames").cast("double") /
          least(col("nf_a"), col("nf_b")).cast("double")).as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  // The oracle rebuilds the full pipeline — mm04's frame grid and
  // ASCII slicing, the full-frame filter, per-doc distinct frame sets,
  // the stop-frame cap, pair counting, and the containment division —
  // so a hash match certifies the equi-join found exactly the pairs
  // the quadratic definition implies under the same caps.
  private val mm09 = QueryDef(
    "mm09_frame_neardup",
    (s, dir) => frameNearDup(syntheticMedia(Tables(s, dir).documents)),
    Some("""WITH d AS (SELECT doc_id, text,
          CAST(ceil(length(text) / 16.0) AS INT) AS nf FROM documents),
      s AS (SELECT doc_id, text,
          unnest(range(0, greatest(nf - 1, 0) + 1, 4)) AS i FROM d),
      f0 AS (SELECT doc_id, substring(text, i * 16 + 1, 16) AS fr FROM s),
      fd AS (SELECT DISTINCT doc_id, md5(fr) AS h FROM f0
        WHERE octet_length(encode(fr)) = 16),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fd GROUP BY 1),
      freq AS (SELECT h, COUNT(*) AS n FROM fd GROUP BY h),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(COUNT(*) AS BIGINT) AS shared_frames
        FROM fd a JOIN fd b USING (h) JOIN freq USING (h)
        WHERE a.doc_id < b.doc_id AND freq.n <= 50
        GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT p.doc_a, p.doc_b, p.shared_frames,
        sa.nf AS nf_a, sb.nf AS nf_b,
        CAST(p.shared_frames AS DOUBLE) /
          CAST(least(sa.nf, sb.nf) AS DOUBLE) AS containment
      FROM pairs p
      JOIN sz sa ON sa.doc_id = p.doc_a
      JOIN sz sb ON sb.doc_id = p.doc_b
      ORDER BY doc_a, doc_b"""),
  )

  val defs: Seq[QueryDef] =
    Seq(mm01, mm02, mm02v, mm03, mm04, mm05, mm06, mm07, mm08, mm09)
}
