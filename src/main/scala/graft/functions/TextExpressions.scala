package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time kernels for the text expressions, factored into a
  * top-level object so both the interpreted path (`nullSafeEval`) and
  * generated code (via the object's static forwarders) call the same
  * implementation. Keeping the expressions codegen-capable (not
  * CodegenFallback) keeps the scan→project pipeline inside ONE
  * WholeStageCodegen stage — no fallback row-format boundary around the
  * hottest dedup/text scans.
  */
object TextOps {

  // Locale.ROOT: default-locale lowercasing (e.g. Turkish dotless ı)
  // would diverge from DuckDB's lower() and break stopword matching
  private def split(s: UTF8String): Array[String] =
    s.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  def tokens(input: UTF8String): ArrayData = {
    val toks = split(input)
    new GenericArrayData(toks.map(UTF8String.fromString(_): Any))
  }

  def shingles(input: UTF8String, n: Int): ArrayData = {
    val toks = split(input)
    val sh: Iterator[String] =
      if (toks.length >= n) toks.iterator.sliding(n).withPartial(false).map(_.mkString(" "))
      else Iterator.single(toks.mkString(" "))
    val out = new java.util.LinkedHashSet[String]()
    sh.foreach(out.add)
    val arr = new Array[Any](out.size)
    var i = 0
    val it = out.iterator()
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  // MD5-derived portable base hash: the first `nBytes` (≤ 8) bytes of
  // md5(utf8 bytes) read big-endian — exactly DuckDB's
  // ('0x' || substr(md5(s), 1, 2*nBytes))::UBIGINT — so every signature
  // built on it can be reproduced bit-exactly by the DuckDB oracle.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5Prefix(s: UTF8String, nBytes: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }

  /** Portable MinHash: sig[j] = min over elements of
    * ((1337j+17)·h + 7919j+31) mod (2³¹−1), with h = 32-bit md5 prefix.
    * A min-wise affine family whose every intermediate stays below 2⁵²,
    * so DuckDB computes the identical signature in plain BIGINT
    * arithmetic (one md5 per element, k affine transforms — cheaper
    * than k independent full hashes, and cross-engine checkable).
    */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = md5Prefix(arr.getUTF8String(i), 4)
      var j = 0
      while (j < numHashes) {
        val v = ((1337L * j + 17L) * h + 7919L * j + 31L) % 2147483647L
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(java.lang.Long.valueOf(_): Any))
  }

  /** Sequential-left-fold dot product — the SAME summation order as
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` and DuckDB's
    * `list_sum(list_transform(list_zip(a, b), ...))`, so swapping the
    * interpreted higher-order fold for this compiled kernel changes
    * nothing bit-wise. Out-of-contract inputs keep the fold's null
    * semantics too: a length mismatch (zip_with pads with null) or a
    * null element poisons the sum to NULL — a ragged or corrupt
    * embedding row must surface as a null similarity, never as a
    * plausible-looking partial dot product.
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def stopwordCount(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    var count = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  def lshBits(arr: ArrayData, planes: Array[Array[Double]]): Long = {
    val v = arr.toDoubleArray()
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, plane.length)
      while (i < n) { dot += v(i) * plane(i); i += 1 }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Indices of the `nProbe` centroids with the LARGEST dot product
    * against the vector (ties by cell index ascending) — the MIPS
    * coarse-probe twin of [[nearestCentroids]], dim-ascending dot
    * folds so the selection matches the oracle's list_sum exactly.
    */
  def topDotCells(arr: ArrayData, centroids: Array[Array[Double]], nProbe: Int): ArrayData = {
    val v = arr.toDoubleArray()
    val dots = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.length, cen.length)
      while (i < n) { d += v(i) * cen(i); i += 1 }
      dots(c) = d
      c += 1
    }
    // descending WITHOUT negation: negating doubles maps 0.0/-0.0 to
    // -0.0/0.0 and Ordering[Double] distinguishes them, so a +0.0 vs
    // -0.0 dot-product tie (or a NaN) could rank cells differently
    // from Double.compare's total order. Explicit comparator —
    // Double.compare(b, a), index tie-break ascending — matches the
    // convention nearestCentroids gets for free from ascending sortBy.
    val order = (0 until dots.length).sortWith { (a, b) =>
      val c = java.lang.Double.compare(dots(b), dots(a))
      if (c != 0) c < 0 else a < b
    }
    new GenericArrayData(order.take(nProbe).map(_.asInstanceOf[Any]).toArray)
  }

  /** Full ADC distance/score for one stored candidate against one
    * query vector, quantizers baked in — the bulk probes' per-row
    * kernel. Fold orders are the oracle's exactly: per subspace a
    * dim-ascending left fold, subspaces summed ascending; MIPS adds
    * the full-dim q·cen(cell) base term first (dim-ascending), then
    * the subspace sum — bit-identical to the LUT path's
    * `base + ((p0+p1)+...)` add order.
    */
  def adcDistance(q: ArrayData, cell: Int, codes: ArrayData,
      cen: Array[Array[Double]], rcb: Array[Array[Double]],
      subDim: Int, mips: Boolean): Double = {
    val qv = q.toDoubleArray()
    val cc = cen(cell)
    val nSub = codes.numElements()
    if (mips) {
      var base = 0.0
      var i = 0
      val dim = math.min(qv.length, cc.length)
      while (i < dim) { base += qv(i) * cc(i); i += 1 }
      var t = 0.0
      var m = 0
      while (m < nSub) {
        val r = rcb(codes.getInt(m))
        var d = 0.0
        var i2 = 0
        while (i2 < subDim) { val j = m * subDim + i2; d += qv(j) * r(j); i2 += 1 }
        t += d
        m += 1
      }
      base + t
    } else {
      var t = 0.0
      var m = 0
      while (m < nSub) {
        val r = rcb(codes.getInt(m))
        var d = 0.0
        var i2 = 0
        while (i2 < subDim) {
          val j = m * subDim + i2
          val x = (qv(j) - cc(j)) - r(j)
          d += x * x
          i2 += 1
        }
        t += d
        m += 1
      }
      t
    }
  }

  def nearestCentroids(arr: ArrayData, centroids: Array[Array[Double]], nProbe: Int): ArrayData = {
    val v = arr.toDoubleArray()
    val dists = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(v.length, cen.length)
      while (i < n) { val x = v(i) - cen(i); d += x * x; i += 1 }
      dists(c) = d
      c += 1
    }
    val order = dists.zipWithIndex.sortBy { case (d, i) => (d, i) }
    new GenericArrayData(order.take(nProbe).map(_._2.asInstanceOf[Any]))
  }

  def winnow(input: UTF8String, k: Int, w: Int): ArrayData = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    if (s.length < k) return new GenericArrayData(Array.empty[Any])
    val n = s.length - k + 1
    // 60-bit md5 prefix of each k-char gram (character-positioned, so
    // multi-byte text agrees with DuckDB's substr). 60 bits keeps the
    // hash non-negative: the window-min selection below must order
    // identically under the JVM's signed and DuckDB's unsigned
    // comparison, which a full 64-bit value would break. Costs one md5
    // per position instead of a rolling multiply — the price of an
    // oracle-checkable fingerprint family (bounded: linear in text
    // length, and the k-char inputs are tiny).
    val chars = s.toCharArray
    val hashes = new Array[Long](n)
    // Hot path: encode the lowercased text to UTF-8 ONCE and hash byte
    // windows via per-char byte offsets — the per-position String +
    // UTF8String round-trip allocated three objects and re-encoded k
    // chars per position. Byte-identical to encoding each k-char slice
    // separately because every non-surrogate char encodes independently
    // of its neighbours; surrogates (absent from this corpus, but
    // guarded anyway) fall back to the slice-encoding path, whose
    // replacement-char behaviour on split pairs differs.
    var hasSurrogate = false
    var ci = 0
    while (ci < chars.length && !hasSurrogate) {
      if (chars(ci) >= 0xD800 && chars(ci) <= 0xDFFF) hasSurrogate = true
      ci += 1
    }
    var i = 0
    if (!hasSurrogate) {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val offs = new Array[Int](chars.length + 1)
      var bo = 0
      ci = 0
      while (ci < chars.length) {
        offs(ci) = bo
        val c = chars(ci)
        bo += (if (c < 0x80) 1 else if (c < 0x800) 2 else 3)
        ci += 1
      }
      offs(chars.length) = bo
      val md = md5Local.get()
      val dig = new Array[Byte](16)
      while (i < n) {
        md.reset()
        md.update(bytes, offs(i), offs(i + k) - offs(i))
        md.digest(dig, 0, 16)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
        hashes(i) = h >>> 4
        i += 1
      }
    } else {
      while (i < n) {
        hashes(i) = md5Prefix(UTF8String.fromString(new String(chars, i, k)), 8) >>> 4
        i += 1
      }
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    val lastStart = math.max(0, n - w)
    while (start <= lastStart) {
      var best = start
      var j = start
      val end = math.min(start + w, n)
      while (j < end) { if (hashes(j) <= hashes(best)) best = j; j += 1 }
      selected.add(hashes(best))
      start += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array: per-token 64-bit md5 prefix
    * (portable — see [[md5Prefix]]), bitwise majority vote across
    * tokens (ties → 0).
    */
  def simhash(arr: ArrayData, counts: Array[Int]): Long = {
    java.util.Arrays.fill(counts, 0)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val h = md5Prefix(arr.getUTF8String(t), 8)
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1; i += 1 }
      t += 1
    }
    var acc = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) acc |= (1L << i); i += 1 }
    acc
  }
}

/** Custom Catalyst expressions for the text-pipeline hot path.
  *
  * Spark's higher-order functions (`transform`/`filter`/`aggregate`)
  * are CodegenFallback and interpret their lambda per element — word
  * shingling through them benchmarked ~2.5 s per evaluation over the
  * sf0.1 corpus. These expressions do the same work in one tight eval
  * per row (~10x); they are the preference-order step (b) "custom
  * Expression" from the build guidance, ahead of UDFs because they
  * avoid the UDF's encoder boundary and stay null-aware in the plan.
  * Every expression implements `doGenCode` — one static call into
  * [[TextOps]] (constant state like stopword sets, hyperplanes and
  * centroids rides in via `addReferenceObj`) — so text/dedup/ANN scans
  * stay inside WholeStageCodegen rather than forcing fallback stages.
  */
object TextExpressions {

  /** Lowercased whitespace tokens of a string column. */
  case class Tokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextOps.tokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.tokens($c)")
    override protected def withNewChildInternal(c: Expression): Tokens = copy(child = c)
    override def prettyName: String = "graft_tokens"
  }

  /** Distinct word n-gram shingles of a string column; documents with
    * fewer than n tokens yield the single whole-document shingle.
    */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextOps.shingles(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.shingles($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
    override def prettyName: String = "graft_word_shingles"
  }

  /** MinHash signature in one pass over a string-array column:
    * sig[j] = min over elements of an affine transform of the element's
    * 32-bit md5 prefix (see [[TextOps.minhash]]). All `numHashes`
    * minima in a single traversal — replaces an explode + 32-column
    * hash-aggregate (one whole shuffle) in the LSH dedup pipeline —
    * and the md5-derived family is reproducible in DuckDB, which makes
    * the ENTIRE MinHash-LSH pipeline oracle-checkable (dd02), not just
    * its verify stage.
    */
  case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
    require(numHashes >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextOps.minhash(input.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.minhash($c, $numHashes)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
    override def prettyName: String = "graft_minhash_signature"
  }

  /** 64-bit SimHash of a token-array column: 64-bit md5 prefix of each
    * token, bitwise majority across tokens (dd03's signature — was the
    * repo's one hot-path Scala UDF; as an expression it avoids the
    * encoder boundary, stays null-aware, and participates in codegen;
    * the md5-derived token hash makes the signature — and so the whole
    * dd03 pipeline — reproducible by the DuckDB oracle).
    * A per-instance scratch buffer (thread-confined: Spark evaluates an
    * expression instance within a task) avoids a 64-int allocation per
    * row; generated code allocates its own via `addMutableState`.
    */
  case class SimHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    @transient private lazy val scratch = new Array[Int](64)
    override def nullSafeEval(input: Any): Any =
      TextOps.simhash(input.asInstanceOf[ArrayData], scratch)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val buf = ctx.addMutableState("int[]", "graftSimhashBuf", v => s"$v = new int[64];")
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.simhash($c, $buf)")
    }
    override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
    override def prettyName: String = "graft_simhash"
  }

  /** Bloom-filter membership probe of a string column (the runtime-
    * filter idiom: a filter built over a SMALL set — e.g. benchmark
    * shingles in decontamination — is shipped to every task and
    * pre-filters the LARGE side before any join; no false negatives,
    * false positives removed by the exact join that follows). Probes
    * the UTF-8 bytes, matching how Spark's sketch aggregate inserts
    * string keys.
    */
  case class BloomMightContain(child: Expression,
      bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloom", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
    }
    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
    override def prettyName: String = "graft_bloom_might_contain"
  }

  /** Number of elements of a string-array column that are members of a
    * fixed set (stopword counting; replaces an interpreted
    * `filter(toks, x -> x IN (...))` lambda).
    */
  case class StopwordCount(child: Expression, words: Seq[String]) extends UnaryExpression {
    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextOps.stopwordCount(input.asInstanceOf[ArrayData], set)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftStopwords", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.stopwordCount($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): StopwordCount = copy(child = c)
    override def prettyName: String = "graft_stopword_count"
  }

  /** Codegen'd dot product of two double-array columns. Replaces the
    * interpreted `aggregate(zip_with(...))` fold on the pair-heavy
    * similarity paths (sd01 compares ~n²/cells candidate pairs; the
    * HOF lambda-per-element cost dominated its profile). Identical
    * summation order to the fold it replaces — see [[TextOps.dot]].
    */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // nullable even for non-null children: ragged arrays / null
    // elements poison the result to NULL (the zip_with fold contract)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      TextOps.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("graftDot")
        s"""
        java.lang.Double $boxed = graft.functions.TextOps.dotOrNull($a, $b);
        if ($boxed == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $boxed.doubleValue();
        }
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot_product"
  }

  /** Sign-bit LSH bucket of a double-array column against fixed
    * hyperplanes: bit i = [v · plane_i >= 0]. One traversal per plane
    * set; replaces 16 interpreted zip_with/aggregate folds per row.
    */
  case class LshSignBits(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextOps.lshBits(input.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftPlanes", planes, "double[][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.lshBits($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): LshSignBits = copy(child = c)
    override def prettyName: String = "graft_lsh_sign_bits"
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken's MOSS
    * algorithm): hash every `k`-char gram of the lowercased text (60-bit
    * md5 prefix — portable, so the DuckDB oracle recomputes the full
    * pipeline), then keep the minimum hash of each window of `w`
    * consecutive grams (rightmost minimum on ties). Guarantees any
    * shared substring of length >= w + k - 1 contributes a shared
    * fingerprint, with output size ~2/(w+1) of the text — the compact
    * local fingerprint for plagiarism/near-dup detection.
    * Returns the distinct selected hashes, sorted.
    */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
    require(k >= 2 && w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextOps.winnow(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.winnow($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
      copy(child = c)
    override def prettyName: String = "graft_winnow_fingerprint"
  }

  /** Indices of the `nProbe` nearest centroids (squared L2) to a
    * double-array vector, nearest first — the IVF coarse-quantizer
    * assignment, one traversal per row with centroids baked in.
    */
  case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
      extends UnaryExpression {
    require(nProbe >= 1 && nProbe <= centroids.length)
    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, false)
    override def nullSafeEval(input: Any): Any =
      TextOps.nearestCentroids(input.asInstanceOf[ArrayData], centroids, nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftCentroids", centroids, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextOps.nearestCentroids($c, $ref, $nProbe)")
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroids =
      copy(child = c)
    override def prettyName: String = "graft_nearest_centroids"
  }

  /** Whole ADC distance (L2) or score (MIPS) per stored candidate,
    * quantizers baked in — ONE codegen'd call per row where the
    * higher-order-function formulation (zip_with/aggregate per
    * subspace) ran interpreted and broke whole-stage codegen: the
    * difference between the bulk probes scoring millions of
    * candidates inside a codegen stage and 16 interpreted lambda
    * evaluations per row.
    */
  case class AdcDistance(qv: Expression, cell: Expression, codes: Expression,
      cen: Array[Array[Double]], rcb: Array[Array[Double]],
      subDim: Int, mips: Boolean) extends TernaryExpression {
    override def first: Expression = qv
    override def second: Expression = cell
    override def third: Expression = codes
    override def dataType: DataType = DoubleType
    override def nullSafeEval(q: Any, c: Any, cds: Any): Any =
      TextOps.adcDistance(q.asInstanceOf[ArrayData],
        c.asInstanceOf[Int], cds.asInstanceOf[ArrayData],
        cen, rcb, subDim, mips)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cenRef = ctx.addReferenceObj("graftAdcCen", cen, "double[][]")
      val rcbRef = ctx.addReferenceObj("graftAdcRcb", rcb, "double[][]")
      defineCodeGen(ctx, ev, (q, c, cds) =>
        s"graft.functions.TextOps.adcDistance($q, $c, $cds, $cenRef, $rcbRef, $subDim, $mips)")
    }
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): AdcDistance =
      copy(qv = newFirst, cell = newSecond, codes = newThird)
    override def prettyName: String = "graft_adc_distance"
  }

  /** MIPS coarse-probe cells: indices of the `nProbe` centroids with
    * the largest dot product, descending (ties by cell ascending) —
    * [[NearestCentroids]] with the inner-product objective.
    */
  case class TopDotCells(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
      extends UnaryExpression {
    require(nProbe >= 1 && nProbe <= centroids.length)
    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, false)
    override def nullSafeEval(input: Any): Any =
      TextOps.topDotCells(input.asInstanceOf[ArrayData], centroids, nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftCentroids", centroids, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextOps.topDotCells($c, $ref, $nProbe)")
    }
    override protected def withNewChildInternal(c: Expression): TopDotCells =
      copy(child = c)
    override def prettyName: String = "graft_top_dot_cells"
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def tokens(c: Column): Column = ColumnBridge.column(Tokens(ColumnBridge.expression(c)))
  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
  def minhash_signature(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numHashes))
  def simhash64(c: Column): Column = ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
  def stopword_count(c: Column, words: Seq[String]): Column =
    ColumnBridge.column(StopwordCount(ColumnBridge.expression(c), words))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def bloom_might_contain(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
  def lsh_sign_bits(c: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(LshSignBits(ColumnBridge.expression(c), planes.map(_.toArray).toArray))
  def nearest_centroids(c: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(c), centroids, nProbe))
  def top_dot_cells(c: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(TopDotCells(ColumnBridge.expression(c), centroids, nProbe))
  def adc_distance(qv: Column, cell: Column, codes: Column,
      cen: Array[Array[Double]], rcb: Array[Array[Double]],
      subDim: Int, mips: Boolean): Column =
    ColumnBridge.column(AdcDistance(ColumnBridge.expression(qv),
      ColumnBridge.expression(cell), ColumnBridge.expression(codes),
      cen, rcb, subDim, mips))
  def winnow_fingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(c), k, w))
}
