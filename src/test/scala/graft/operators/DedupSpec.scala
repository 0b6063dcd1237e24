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

  test("minhash falls back to a shuffle join above the broadcast bound, same result") {
    // boilerplate-heavy corpus: every doc shares shingles -> buckets
    // near maxBucket -> large candidate set; with the broadcast bound
    // forced to 0 the verification join must take the shuffle path and
    // produce identical pairs
    val boiler = (0L until 60L).map(i =>
      (i, s"$base common boilerplate footer shared by every document variant ${i % 3}"))
      .toDF("doc_id", "text")
    val viaBroadcast = Dedup.minhashPairs(boiler, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaShuffle = Dedup.minhashPairs(boiler, threshold = 0.5, maxBroadcastCands = 0L)
    // above the bound the candidate set carries NO broadcast hint (the
    // planner remains free to broadcast the other, smaller side); below
    // it the hint is present
    assert(!viaShuffle.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "candidate set must not be broadcast-hinted above the bound")
    assert(Dedup.minhashPairs(boiler, threshold = 0.5)
      .queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(viaShuffle.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet == viaBroadcast)
    assert(viaBroadcast.nonEmpty)
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

  test("winnowing finds docs sharing long substrings, skips unrelated") {
    val pairs = Dedup.winnowingPairs(corpus, minShared = 3).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L)), s"exact dup pair missing from $keys")
    assert(keys.contains((0L, 2L)) || keys.contains((1L, 2L)),
      "near dup (long shared substrings) missing")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc matched")
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars yields a shared fingerprint") {
    import spark.implicits._
    val shared = "zq common winnow fragment xv" // > w+k-1 = 11 chars
    val docs = Seq(
      (0L, s"prefix one $shared suffix alpha beta gamma"),
      (1L, s"completely different beginning $shared and another ending"),
      (2L, "no overlap here at all just other words entirely")).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
      graft.functions.TextExpressions.winnow_fingerprint(col("text"), 8, 4).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fp(0L) intersect fp(1L)).nonEmpty)
    assert(fp(0L).nonEmpty && fp(2L).nonEmpty)
  }

  test("clusterPairs collapses chained pairs into one component; retainCanonical keeps one") {
    import spark.implicits._
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11 -> clusters {1,2,3,4}, {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L))
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
    // the distributed propagation loop (forced via driverThreshold = 0)
    // must agree with the driver-side union-find exactly
    val distributed = Dedup.clusterPairs(pairs, driverThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == clusters)
    val docs = (1L to 12L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val kept = Dedup.retainCanonical(docs, pairs).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // losers 2,3,4,11 removed; canonical 1 and 10 kept; untouched docs kept
    assert(kept == Seq(1L, 5L, 6L, 7L, 8L, 9L, 10L, 12L))
  }

  test("clusterPairs default maxIters converges a slow chain; wrappers share one map") {
    import spark.implicits._
    // a 2048-node chain is the worst case for label propagation: plain
    // hook would need ~2047 rounds and even hook+jump needs ~log2(n)
    // rounds — the old maxIters=10 primitive default sat right at the
    // edge while its wrappers used 50. Defaults are now shared, and the
    // distributed path at the shared default must fully converge.
    val n = 2048L
    val pairs = spark.range(n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val dist = Dedup.clusterPairs(pairs, driverThreshold = 0L).collect()
    assert(dist.length == n && dist.forall(_.getLong(1) == 0L),
      s"default maxIters left ${dist.count(_.getLong(1) != 0L)} nodes unconverged")
    // retainCanonical and leakageSafeSplit at THEIR defaults must see
    // the same single component: one survivor, one split label
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("d"), col("id")).as("text"))
    val kept = Dedup.retainCanonical(docs, pairs).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L), s"one canonical doc expected, got $kept")
    val splits = Dedup.leakageSafeSplit(docs, pairs)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(splits.length == 1, s"one component must get one split label, got $splits")
  }

  test("clusterPairs: both physical strategies match BFS ground truth on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2) {
      val n = 30
      val edges = Seq.fill(22)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
      // BFS ground truth: cluster = min reachable id
      val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1).view.mapValues(_.map(_._2))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val truth = nodes.map { s =>
        var seen = Set(s); var frontier = List(s)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(seen)
          seen ++= next; frontier = next
        }
        s -> seen.min
      }.toMap
      val pairs = edges.toDF("doc_a", "doc_b")
      val driver = Dedup.clusterPairs(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.clusterPairs(pairs, maxIters = 50, driverThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == truth, "driver union-find diverged from BFS")
      assert(dist == truth, "distributed propagation diverged from BFS")
    }
  }

  test("clusterPairs reliable checkpointing produces the same components") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    // without a checkpoint dir the option is rejected up front
    val before = spark.sparkContext.getCheckpointDir
    if (before.isEmpty)
      intercept[IllegalArgumentException](Dedup.clusterPairs(pairs, reliable = true))
    spark.sparkContext.setCheckpointDir(tmpDir("ckpt").toString)
    // driverThreshold = 0 so the reliable-checkpoint loop actually runs
    val clusters = Dedup.clusterPairs(pairs, reliable = true, driverThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L))
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
  }

  test("A21 file utilities: copy/move/delete/md5/atomic write") {
    val dir = tmpDir("fileutils")
    val a = dir.resolve("a.txt").toString
    graft.ingest.FileUtils.atomicWrite(a, "hello graft")
    assert(graft.ingest.FileUtils.exists(a))
    assert(graft.ingest.FileUtils.md5(a) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello graft".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val b = dir.resolve("b.txt").toString
    assert(graft.ingest.FileUtils.copy(a, b))
    assert(graft.ingest.FileUtils.exists(a) && graft.ingest.FileUtils.exists(b))
    val c = dir.resolve("c.txt").toString
    assert(graft.ingest.FileUtils.move(b, c))
    assert(!graft.ingest.FileUtils.exists(b) && graft.ingest.FileUtils.exists(c))
    assert(graft.ingest.FileUtils.delete(c))
    assert(!graft.ingest.FileUtils.exists(c))
  }

  test("hash-sample UDAF: deterministic, partition-independent, bounded") {
    import spark.implicits._
    import graft.functions.Sampling
    val values = (1 to 500).map(i => s"value_$i")
    val a = values.toDF("v").repartition(1)
      .agg(Sampling.hash_sample(col("v"), 10)).collect().head.getSeq[String](0)
    val b = values.reverse.toDF("v").repartition(13)
      .agg(Sampling.hash_sample(col("v"), 10)).collect().head.getSeq[String](0)
    assert(a == b, "sample must not depend on partitioning or row order")
    assert(a.length == 10)
    assert(a.toSet.subsetOf(values.toSet))
    // per-group sampling works too
    val grouped = (1 to 100).map(i => (i % 3, s"g$i")).toDF("k", "v")
      .groupBy("k").agg(Sampling.hash_sample(col("v"), 5).as("sample"))
      .collect()
    assert(grouped.length == 3)
    assert(grouped.forall(_.getSeq[String](1).length == 5))
  }

  test("dd09: batch probes history index; finds planted near-dup, skips unrelated") {
    // history holds the originals; the batch re-submits a near-dup and
    // an unrelated doc — only the near-dup may hit
    val history = Seq((0L, base), (3L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((100L, nearDup), (101L, "completely different content about gardens and rainfall patterns")).toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDups(history, batch, threshold = 0.5).collect()
    assert(hits.nonEmpty, "planted near-dup must be found against history")
    assert(hits.forall(_.getLong(0) == 100L), "only the near-dup batch doc may match")
    assert(hits.forall(_.getLong(1) == 0L))
    assert(hits.forall(_.getDouble(2) >= 0.5))
  }

  test("dd09: batch-internal duplicates are NOT reported (index-probe semantics)") {
    val history = Seq((0L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((100L, base), (101L, base)).toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDups(history, batch, threshold = 0.5).collect()
    assert(hits.isEmpty, "pairs inside the batch are dd02's job, not the probe's")
  }

  test("dd10: containment is asymmetric - a substring doc scores 1.0 one way only") {
    // doc 10 is a strict prefix of doc 11: every shingle of 10 appears
    // in 11 (c_ab = 1.0) but not vice versa
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    val docs = Seq((10L, short), (11L, long), (12L, unrelated)).toDF("doc_id", "text")
    val sh = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val pair = a.crossJoin(b)
      .filter(col("doc_a") === 10L && col("doc_b") === 11L)
      .select((inter / size(col("sa"))).as("c_ab"), (inter / size(col("sb"))).as("c_ba"))
      .collect().head
    assert(pair.getDouble(0) == 1.0, "contained doc must score 1.0 toward container")
    assert(pair.getDouble(1) < 1.0, "container must not score 1.0 toward contained")
  }

  test("spl01: near-duplicates never straddle a split boundary") {
    val docs = corpus
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val split = Dedup.leakageSafeSplit(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size == 5)
    // 0, 1 (exact dups) and 2 (near-dup) form one cluster -> one split
    assert(split(0L)._1 == split(1L)._1 && split(1L)._1 == split(2L)._1)
    assert(split(0L)._2 == split(1L)._2 && split(1L)._2 == split(2L)._2)
    // unrelated docs are singleton clusters
    assert(split(3L)._1 == 3L && split(4L)._1 == 4L)
    assert(split.values.forall(v => Set("train", "val", "test")(v._2)))
    // determinism
    val again = Dedup.leakageSafeSplit(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split == again)
  }

  test("exact dedup groups by content hash (dd01 semantics)") {
    val out = corpus.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    val dup = out.filter(col("n") > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keep") == 0L)
    assert(dup.head.getAs[Long]("n") == 2L)
  }

  test("containmentPairs: band-index scale path agrees exactly with the cartesian verifier") {
    // planted containment: B extends A (A's shingles ⊂ B's), with
    // enough overlap that the pair also collides in a minhash band
    val contained =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    val container = contained + " rho sigma tau"
    val docs = Seq(
      (0L, contained), (1L, container),
      (2L, base), (3L, base.replace("lazy", "sleepy")), (4L, unrelated),
    ).toDF("doc_id", "text")
    val scale = Dedup.containmentPairs(docs, minContainment = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // the planted pair is found, with C(A→B) = 1.0 (A fully inside B)
    assert(scale.contains((0L, 1L)), s"planted containment pair missed: ${scale.keys}")
    assert(scale((0L, 1L))._1 == 1.0)
    // every emitted pair matches the bounded cartesian verifier bit-for-bit
    val sh = Dedup.withShingles(docs).select("doc_id", "shingles")
    val cart = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") / size(col("sa"))).as("c_ab"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") / size(col("sb"))).as("c_ba"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    scale.foreach { case (k, (cab, cba, cmax)) =>
      assert(cart(k) == ((cab, cba)), s"pair $k disagrees with cartesian")
      assert(cmax == math.max(cab, cba))
      assert(cmax >= 0.3)
    }
  }

  test("containmentPairs on real docs: emitted pairs match the exact formula") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    // low threshold so the synthetic corpus (no planted dups) yields rows
    val scale = Dedup.containmentPairs(docs, minContainment = 0.02).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(scale.nonEmpty, "expected some low-containment candidate pairs")
    val sh = Dedup.withShingles(docs).select("doc_id", "shingles")
    val cart = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") / size(col("sa"))).as("c_ab"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") / size(col("sb"))).as("c_ba"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    scale.foreach { case (k, v) => assert(cart(k) == v, s"pair $k disagrees with cartesian") }
  }

  test("dd15: prefix-filter join equals brute-force exact Jaccard (recall 1 by construction)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 150).select("doc_id", "text")
      // planted exact + near pair on top of real docs (ids offset clear
      // of the real 0..149 range)
      .union(corpus.select(col("doc_id") + 1000L, col("text")))
    val got = Dedup.prefixFilterPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute-force ground truth: all pairs, exact Jaccard >= 0.5
    val sh = Dedup.withShingles(docs).select("doc_id", "shingles")
    val truth = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(truth.contains((1000L, 1001L)) && truth((1000L, 1001L)) == 1.0)
    assert(got == truth, s"prefix-filter join diverged: got ${got.size}, truth ${truth.size}")
  }

  test("dd16: probing the persisted (saved + appended) index equals the in-line probe") {
    val hist = Seq((0L, base), (1L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, "totally different content here nothing shared")).toDF("doc_id", "text")
    val inline = Dedup.incrementalNearDups(hist, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val path = java.nio.file.Files.createTempDirectory("dd16spec").toString
    val path2 = java.nio.file.Files.createTempDirectory("dd16geo").toString
    try {
      // build the index in two installments: save one doc, append the rest
      Dedup.saveNearDupIndex(hist.filter(col("doc_id") === 0L), path)
      Dedup.appendNearDupIndex(hist.filter(col("doc_id") =!= 0L), path)
      val loaded = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(inline.nonEmpty, "planted near-dup must be found")
      assert(loaded == inline, s"persisted-index probe diverged: $loaded vs $inline")
      // geometry is stored IN the index: a non-default save must make the
      // probe compute batch signatures under the saved geometry, matching
      // the in-line probe at that geometry (not the defaults)
      Dedup.saveNearDupIndex(hist, path2, numHashes = 16, bands = 8)
      val loaded2 = Dedup.probeNearDupIndex(spark, path2, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val inline2 = Dedup.incrementalNearDups(hist, batch, numHashes = 16, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(loaded2 == inline2, "probe must follow the index's stored geometry")
      // the zero-recompute probe of the newest committed batch must
      // equal append-then-probe of the same rows (cp02's fast path):
      // append the batch itself, then probe its STORED bands/shingles
      Dedup.appendNearDupIndex(batch, path)
      val stored = Dedup.probeNewestIndexBatch(spark, path)
        .filter(col("batch_id") > col("hist_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // loaded probed batch-vs-history only; the stored probe also sees
      // batch-vs-batch pairs (none planted here), so the sets must match
      assert(stored == loaded,
        s"newest-batch stored probe diverged from recompute probe: $stored vs $loaded")
      // tombstones hide BOTH sides of the stored probe: forgetting the
      // batch doc that drove the pairs must empty the result — an
      // erased doc can neither be probed nor drive a drop set
      val drivingBatchId = loaded.head._1
      Dedup.forgetFromIndex(spark, path, Seq(drivingBatchId).toDF("doc_id"))
      val afterForget = Dedup.probeNewestIndexBatch(spark, path)
        .filter(col("batch_id") > col("hist_id"))
        .filter(col("batch_id") === drivingBatchId).count()
      assert(afterForget == 0L,
        "a tombstoned batch doc must be invisible on the PROBE side too")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(path)); rm(new java.io.File(path2))
    }
  }

  test("dm06: every cluster wastes less than it holds, and the canonical share is positive") {
    val rows = graft.Registry.byName("dm06_dedup_roi").run(spark, sf0001).collect()
    assert(rows.nonEmpty, "the sf0.001 corpus has planted near-dup clusters")
    rows.foreach { r =>
      val (n, total, wasted) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 2, s"singletons must not appear: $r")
      assert(wasted < total && total - wasted > 0,
        s"canonical tokens = total - wasted must stay positive: $r")
    }
    // ranked by waste
    val w = rows.map(_.getLong(3)).toSeq
    assert(w == w.sortBy(-_), s"rows must rank by wasted tokens: $w")
  }

  test("re-save wipes stale tombstones; legacy flat-layout indexes are refused loudly") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val path = java.nio.file.Files.createTempDirectory("dd16resave").toString
    val legacy = java.nio.file.Files.createTempDirectory("dd16legacy").toString
    try {
      // index A erases doc 5; index B (a FRESH corpus reusing id 5)
      // must not inherit the tombstone
      Dedup.saveNearDupIndex(
        Seq((0L, base), (5L, nearDup)).toDF("doc_id", "text"), path)
      Dedup.forgetFromIndex(spark, path, Seq(5L).toDF("doc_id"))
      Dedup.saveNearDupIndex(
        Seq((5L, base), (9L, nearDup)).toDF("doc_id", "text"), path)
      val probe = Dedup.probeNearDupIndex(spark, path,
          Seq((20L, base)).toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(probe.contains((20L, 5L)),
        s"doc 5 of the NEW index must be visible after re-save: $probe")
      // a legacy flat-layout index (root bands/ table) must refuse
      // append and probe instead of silently dropping its history —
      // even when a newer build already added a batches/ dir beside it
      Seq((0L, base)).toDF("doc_id", "text").write.parquet(s"$legacy/bands")
      intercept[IllegalArgumentException](
        Dedup.appendNearDupIndex(Seq((1L, base)).toDF("doc_id", "text"), legacy))
      intercept[IllegalArgumentException](
        Dedup.probeNearDupIndex(spark, legacy,
          Seq((1L, base)).toDF("doc_id", "text")).collect())
      // and the documented remedy clears the legacy root tables too
      Dedup.saveNearDupIndex(Seq((1L, base)).toDF("doc_id", "text"), legacy)
      assert(!new java.io.File(s"$legacy/bands").exists(),
        "re-save must remove the legacy root table")
    } finally {
      rm(new java.io.File(path)); rm(new java.io.File(legacy))
    }
  }

  test("vacuum with NO tombstones = batch compaction: appended dirs fold to one, probe identical") {
    val conf = spark.sparkContext.hadoopConfiguration
    val hist = Seq((0L, base), (3L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dd_compact").toString
    try {
      Dedup.saveNearDupIndex(hist, path)
      Dedup.appendNearDupIndex(Seq((5L, nearDup)).toDF("doc_id", "text"), path)
      Dedup.appendNearDupIndex(Seq((6L, base + " extra")).toDF("doc_id", "text"), path)
      // resolve the LIVE generation each time: vacuum flips it
      def batchNames = graft.ingest.FileUtils.listSubdirs(
          graft.ingest.Generations.currentBatchesDir(path, conf), conf)
        .map(d => new org.apache.hadoop.fs.Path(d).getName)
      assert(batchNames == Seq("b0", "b1", "b2"), s"batches: $batchNames")
      val before = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(before.nonEmpty)
      Dedup.vacuumIndex(spark, path)
      assert(batchNames == Seq("b0"), s"compaction left $batchNames")
      // the swap's cleanup swept the pre-vacuum generation's bytes
      assert(!graft.ingest.FileUtils.exists(s"$path/batches", conf),
        "the stale generation-0 tree must be swept")
      val after = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == before, "compaction changed probe results")
    } finally graft.ingest.FileUtils.rmr(path, conf)
  }

  test("index retention: retired batches leave probes immediately; vacuum drops their bytes") {
    val conf = spark.sparkContext.hadoopConfiguration
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dd_retain").toString
    try {
      // old window: docs 0 and 3; recent window: doc 5
      Dedup.saveNearDupIndex(
        Seq((0L, base), (3L, unrelated)).toDF("doc_id", "text"), path)
      Dedup.appendNearDupIndex(Seq((5L, nearDup)).toDF("doc_id", "text"), path)
      def pairs = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((10L, 0L), (10L, 5L)), s"pre-retirement: $pairs")
      assert(Dedup.retireIndexBatches(spark, path, keepLast = 1) == Seq(0L))
      // metadata-only, but the probe window changed immediately
      assert(pairs == Set((10L, 5L)), s"post-retirement: $pairs")
      // retiring again with a roomy window is a no-op
      assert(Dedup.retireIndexBatches(spark, path, keepLast = 5).isEmpty)
      // vacuum carries only the live window into the compacted batch
      Dedup.vacuumIndex(spark, path)
      assert(pairs == Set((10L, 5L)), "vacuum changed probe semantics")
      val survivors = spark.read.parquet(
          graft.ingest.Generations.currentBatchesDir(path, conf) +
            "/b0/shingles")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(survivors == Set(5L),
        s"retired docs' shingles must be physically gone: $survivors")
    } finally graft.ingest.FileUtils.rmr(path, conf)
  }

  test("gov02: tombstone and vacuum agree, and vacuum physically erases the bytes") {
    val hist = Seq((0L, base), (5L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("gov02spec").toString
    try {
      Dedup.saveNearDupIndex(hist, path)
      val before = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(before.contains((10L, 0L)) && before.contains((10L, 5L)),
        s"both history near-dups must match before erasure: $before")
      // forget doc 5: logically gone from the next probe
      Dedup.forgetFromIndex(spark, path,
        Seq(5L).toDF("doc_id"))
      val tombstoned = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tombstoned == before - ((10L, 5L)), s"tombstone must hide doc 5: $tombstoned")
      // vacuum: probe identical, and the parquet no longer holds doc 5
      Dedup.vacuumIndex(spark, path)
      val vacuumed = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(vacuumed == tombstoned, "vacuum must not change probe semantics")
      val survivors = spark.read.parquet(graft.ingest.Generations
          .currentBatchesDir(path, spark.sparkContext.hadoopConfiguration) +
          "/b0/shingles")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(!survivors.contains(5L), "erased doc's shingles must be physically gone")
      assert(survivors == Set(0L, 3L))
      assert(!new java.io.File(s"$path/forgotten").exists(),
        "vacuum clears the tombstone log")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(path))
    }
  }

  test("vacuum is crash-atomic: an unmarked staged generation is invisible; the crashed retry is clean") {
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val hist = Seq((0L, base), (5L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dd_genatom").toString
    try {
      Dedup.saveNearDupIndex(hist, path)
      Dedup.forgetFromIndex(spark, path, Seq(5L).toDF("doc_id"))
      def pairs = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val tombstoned = pairs
      assert(tombstoned == Set((10L, 0L)))
      // a vacuum that CRASHED between staging and committing: the
      // staged tree is complete and marker-sealed INSIDE, but the
      // generation marker never landed — readers must not see it
      graft.ingest.FileUtils.mkdirs(s"$path/batches_g1/b0", conf)
      graft.ingest.FileUtils.touch(s"$path/batches_g1/b0/_COMMITTED", conf)
      assert(pairs == tombstoned,
        "an unmarked staged generation leaked into reads")
      val cat = StateCatalog.describeState(spark, path).head
      assert(cat.getAs[Long]("generation") == 0L,
        "the catalog must still report the live generation")
      // the RETRY: the real vacuum clears the orphan stage, re-stages
      // the same number, and its marker create is the atomic flip
      Dedup.vacuumIndex(spark, path)
      assert(pairs == tombstoned, "vacuum changed probe semantics")
      val base1 = graft.ingest.Generations.currentBatchesDir(path, conf)
      assert(base1.endsWith("batches_g1"), s"live dir: $base1")
      assert(!graft.ingest.FileUtils.exists(s"$path/batches", conf),
        "the old generation's bytes must be swept")
      assert(StateCatalog.describeState(spark, path).head
        .getAs[Long]("generation") == 1L)
      // and a SECOND vacuum keeps walking forward (g2), sweeping g1
      Dedup.vacuumIndex(spark, path)
      assert(pairs == tombstoned)
      assert(graft.ingest.Generations.currentBatchesDir(path, conf)
        .endsWith("batches_g2"))
      assert(!graft.ingest.FileUtils.exists(s"$path/batches_g1", conf))
    } finally graft.ingest.FileUtils.rmr(path, conf)
  }

  test("heavily tombstoned index: probe equals a survivors-only index — no candidate starvation") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables(spark, sf0001).documents
    val hist = docs.filter(col("doc_id") % 7 =!= 3)
    val batch = docs.filter(col("doc_id") % 7 === 3)
    val heavy = java.nio.file.Files.createTempDirectory("ndx_heavy").toString
    val lean = java.nio.file.Files.createTempDirectory("ndx_lean").toString
    try {
      // tombstone 80% of history: the retention-heavy shape — the
      // probe must behave as if only the survivors were ever indexed
      // (tombstones filter bands AND shingles AND bucket counts before
      // the candidate join, so no pair is starved or resurrected)
      Dedup.saveNearDupIndex(hist, heavy)
      Dedup.forgetFromIndex(spark, heavy,
        hist.filter(col("doc_id") % 5 =!= 0).select("doc_id"))
      Dedup.saveNearDupIndex(hist.filter(col("doc_id") % 5 === 0), lean)
      val got = Dedup.probeNearDupIndex(spark, heavy, batch).collect().toSeq
      val want = Dedup.probeNearDupIndex(spark, lean, batch).collect().toSeq
      assert(got == want,
        "heavily tombstoned probe must equal the survivors-only index")
    } finally Seq(heavy, lean).foreach(p =>
      graft.ingest.FileUtils.rmr(p, spark.sparkContext.hadoopConfiguration))
  }

  test("dd18 remedy loop: tombstoning the boilerplate clears its batch's skew flag") {
    import org.apache.spark.sql.functions.{col, lit}
    val normal = graft.sources.Tables(spark, sf0001).documents
      .filter(col("doc_id") % 7 =!= 3)
    val boiler = spark.range(100000, 100030)
      .select(col("id").as("doc_id"),
        lit("the same boilerplate footer appears verbatim on every page of this site")
          .as("text"))
    val path = java.nio.file.Files.createTempDirectory("dd18spec").toString
    try {
      Dedup.saveNearDupIndex(normal, path)
      Dedup.appendNearDupIndex(boiler, path)
      val before = Dedup.auditIndexBuckets(spark, path, cap = 16).collect()
      assert(before.map(r => r.getAs[Long]("batch_id") ->
        r.getAs[Boolean]("flagged")).toMap == Map(0L -> false, 1L -> true),
        s"only the boilerplate batch may flag: ${before.toSeq}")
      // the remedy: tombstone two thirds of the boilerplate — its
      // surviving bucket (10 identical docs) drops under the cap, and
      // the audit reflects it WITHOUT any rewrite (tombstones filter
      // the band scan)
      Dedup.forgetFromIndex(spark, path,
        boiler.filter(col("doc_id") % 3 =!= 0).select("doc_id"))
      val after = Dedup.auditIndexBuckets(spark, path, cap = 16).collect()
      assert(after.map(r => r.getAs[Long]("batch_id") ->
        r.getAs[Boolean]("flagged")).toMap == Map(0L -> false, 1L -> false),
        s"the tombstoned batch must drop under the cap: ${after.toSeq}")
      assert(after.find(_.getAs[Long]("batch_id") == 1L).get
        .getAs[Long]("max_bucket") == 10L)
    } finally graft.ingest.FileUtils.rmr(path,
      spark.sparkContext.hadoopConfiguration)
  }

  test("near-dup index lifecycle runs through the Hadoop FileSystem API (file: URI)") {
    // an explicit file:-scheme URI never resolves through java.io —
    // save/append/forget/vacuum/probe must all route Path.getFileSystem,
    // the property that lets the same index live on HDFS/S3A
    val hist = Seq((0L, base), (5L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val path = "file:" + java.nio.file.Files.createTempDirectory("ddfsuri").toString
    try {
      Dedup.saveNearDupIndex(hist.filter(col("doc_id") =!= 3L), path)
      Dedup.appendNearDupIndex(hist.filter(col("doc_id") === 3L), path)
      Dedup.forgetFromIndex(spark, path, Seq(5L).toDF("doc_id"))
      Dedup.vacuumIndex(spark, path)
      val probed = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(probed == Set((10L, 0L)), s"vacuumed file:-URI index probe: $probed")
      // post-vacuum the live tree is generation 1 (resolved, not assumed)
      assert(graft.ingest.FileUtils.exists(
        graft.ingest.Generations.currentBatchesDir(path,
          spark.sparkContext.hadoopConfiguration) + "/b0/_COMMITTED",
        spark.sparkContext.hadoopConfiguration))
    } finally {
      graft.ingest.FileUtils.delete(path, recursive = true)
      ()
    }
  }

  test("dd16: a failed append is invisible and its retry is idempotent") {
    val hist = Seq((0L, base), (3L, unrelated)).toDF("doc_id", "text")
    val late = Seq((1L, nearDup)).toDF("doc_id", "text")
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dd16retry").toString
    try {
      Dedup.saveNearDupIndex(hist, path)
      // simulate a crash mid-append: a batch dir with bands but no
      // shingles and NO commit marker — readers must ignore it
      // (half-visible bands would emit candidates that silently drop
      // at the shingle verify join)
      val dead = new java.io.File(s"$path/batches/b1/bands")
      dead.mkdirs()
      val beforeRetry = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(beforeRetry == Seq((10L, 0L)),
        s"uncommitted batch leaked into the probe: $beforeRetry")
      // the retried append lands in a fresh committed dir; the probe
      // now sees history + late exactly once (no duplicated rows)
      Dedup.appendNearDupIndex(late, path)
      val after = Dedup.probeNearDupIndex(spark, path, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val inline = Dedup.incrementalNearDups(hist.union(late), batch).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(after == inline && after.toSet == Set((10L, 0L), (10L, 1L)),
        s"retried append diverged: $after vs $inline")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(path))
    }
  }

  test("dd15: size filter is lossless pruning (same output with it off)") {
    val docs = corpus
    val withFilter = Dedup.prefixFilterPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val without = Dedup.prefixFilterPairs(docs, withSizeFilter = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(withFilter == without && withFilter.nonEmpty)
  }

  test("dupSpanCoverage: shared 6-token span covers exactly 6 positions per doc") {
    val docs = Seq(
      (0L, "alpha beta one two three four five six gamma delta"),
      (1L, "epsilon one two three four five six zeta eta theta"),
      (2L, "completely different words with no overlap at all here now"),
      (3L, "tiny doc"), // under the gram size: never flagged, never crashes
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanCoverage(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // two overlapping dup 5-grams at consecutive positions merge into a
    // 6-token covered interval: min(5, 1) + 5
    assert(out(0L) == ((6L, 0.6, true)), out(0L).toString)
    assert(out(1L) == ((6L, 0.6, true)), out(1L).toString)
    assert(out(2L) == ((0L, 0.0, false)))
    assert(out(3L) == ((0L, 0.0, false)))
  }

  test("dupSpanCoverage: whole-doc duplicates are fully covered") {
    val text = "one two three four five six seven eight nine ten"
    val docs = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
    val out = Dedup.dupSpanCoverage(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 6 dup grams at positions 0..5, coverage = 5*min-gaps + last = 10
    assert(out(0L) == ((10L, 10L, 1.0)))
    assert(out(1L) == ((10L, 10L, 1.0)))
  }

  test("incrementalExactSurvivors: bloom pre-pass equals the plain anti-join") {
    val history = Seq((0L, base), (1L, nearDup), (2L, unrelated))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),          // exact dup of history 0 -> dropped
      (11L, unrelated),     // exact dup of history 2 -> dropped
      (12L, "brand new document text"),
      (13L, nearDup + " extra"), // near- but not exact-dup -> survives
    ).toDF("doc_id", "text")
    val survivors = Dedup.incrementalExactSurvivors(history, batch)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(12L, 13L))
    // equals the un-bloomed anti-join on the digest
    val plain = batch.withColumn("m", md5(col("text").cast("binary")))
      .join(history.select(md5(col("text").cast("binary")).as("m")), Seq("m"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == plain)
  }

  test("dd14: detector eval — precision 1.0 by construction, counts reconcile") {
    val r = graft.Registry.byName("dd14_lsh_eval").run(spark, sf0001).collect().head
    val (t, d, h) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_detected"), r.getAs[Long]("n_hit"))
    assert(h <= d && h <= t)
    // minhashPairs verifies candidates with exact Jaccard, so every
    // detected pair is true: hit == detected, precision == 1.0
    assert(h == d)
    if (d > 0) assert(r.getAs[Double]("precision") == 1.0)
    if (t > 0) assert(r.getAs[Double]("recall") == h.toDouble / t)
  }

  test("leak01: the cluster-hash split leaks fewer shingles than the naive split") {
    val rows = graft.Registry.byName("leak01_split_leakage")
      .run(spark, sf0001).collect().map(r => r.getString(0) -> r.getAs[Long]("n_shared")).toMap
    assert(rows.keySet == Set("cluster_hash", "doc_hash"))
    // the operator's reason to exist: same thresholds, same hash, only
    // the split KEY differs — clustering the near-dups into one split
    // must strictly reduce the cross-split shingle overlap
    assert(rows("cluster_hash") < rows("doc_hash"),
      s"cluster ${rows("cluster_hash")} !< naive ${rows("doc_hash")}")
  }
}
