package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-curation operators (Corpus.scala);
  * bit-level value checks are the DuckDB oracle's job.
  */
class CorpusSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sf0001)

  test("dc01: benchmark docs are never flagged; hits share >= 3 shingles") {
    val rows = run("dc01_decontaminate").collect()
    assert(rows.nonEmpty, "word-salad corpus must show shingle overlap")
    assert(rows.forall(_.getLong(0) % 97 != 0), "held-out docs must be excluded")
    assert(rows.forall(r => r.getLong(1) >= 3 && r.getLong(2) >= 1))
  }

  test("dc02: bloom pre-pass output is byte-identical to the exact join") {
    assert(run("dc02_bloom_decontaminate").collect().toSeq ==
      run("dc01_decontaminate").collect().toSeq)
  }

  test("dm05: degree-product estimate equals the materialized join count on every row") {
    val rows = run("dm05_join_cardinality").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(5),
        s"${r.getString(0)}: predicted ${r.getLong(4)} != actual ${r.getLong(5)}")
    }
    // FK sanity: orders⋈lineitem on orderkey = every lineitem matches
    val ol = rows.find(_.getString(0) == "orders-lineitem").get
    assert(ol.getLong(4) == ol.getLong(2), "FK join size must equal |lineitem|")
    // the self-join includes the diagonal, so it is at least |lineitem|
    val self = rows.find(_.getString(0) == "lineitem-self-partkey").get
    assert(self.getLong(4) >= self.getLong(1))
  }

  test("ord04: every epoch is a full-corpus permutation and genuinely reshuffles") {
    val rows = run("ord04_epoch_reshuffle").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val n = rows.head.getLong(1)
    assert(n > 0 && rows.forall(_.getLong(1) == n), "same corpus every epoch")
    assert(rows.head.isNullAt(3), "epoch 1 has no predecessor")
    // nearly all docs should move between epochs (independent md5 keys)
    rows.tail.foreach { r =>
      assert(r.getLong(3) > n / 2, s"epoch ${r.getLong(0)} barely reshuffled: $r")
    }
    // and the orders are genuinely different permutations
    assert(rows.map(_.getLong(2)).distinct.length == 3, "order checksums must differ")
  }

  test("rep01: counts are consistent and rep_ratio is in [0,1)") {
    val rows = run("rep01_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, top) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d <= n && top <= n && top >= 1)
      val ratio = r.getDouble(4)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - d.toDouble / n)) < 1e-12)
    }
  }

  test("smp01: sampling is deterministic and stratified by language") {
    val a = run("smp01_hash_sample").collect()
    val b = run("smp01_hash_sample").collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be run-to-run stable")
    val docs = graft.sources.Tables(spark, sf0001).documents
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // en is downsampled ~10%, other langs ~30%: the en keep-rate must be
    // strictly below every other stratum's (loose bound, tiny corpus)
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    total.keys.filter(_ != "en").foreach { l =>
      assert(enRate < kept.getOrElse(l, 0L).toDouble / total(l) + 0.15,
        s"en rate $enRate should sit below $l")
    }
  }

  test("smp02: exactly min(20, stratum size) rows per language, rank total") {
    val rows = run("smp02_stratified_topn").collect()
    val docs = graft.sources.Tables(spark, sf0001).documents
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = rows.groupBy(_.getString(1))
    total.foreach { case (l, n) =>
      assert(perLang.get(l).map(_.length).getOrElse(0) == math.min(20L, n))
    }
    perLang.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("chk01: chunks cover every token with the configured stride/overlap") {
    val chunks = run("chk01_token_chunks")
    val docs = graft.sources.Tables(spark, sf0001).documents
      .withColumn("n", size(graft.functions.TextExpressions.tokens(col("text"))))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n").cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.collect().groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val n = docs(id)
      assert(rs.length == ((n - 1) / 48 + 1), s"doc $id: chunk count")
      // chunk i starts at 48·i and holds exactly min(64, n − 48·i)
      // tokens — this pins BOTH the stride and the 16-token overlap (a
      // slice-length regression to 48 would fail here)
      rs.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i, s"doc $id: chunk_idx gap at $i")
        assert(r.getLong(2) == math.min(64L, n - 48L * i),
          s"doc $id chunk $i: size ${r.getLong(2)} for n=$n")
      }
    }
  }

  test("mix01: replication weights hold exactly per language") {
    val rows = run("mix01_language_mix").collect()
    val docs = graft.sources.Tables(spark, sf0001).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = rows.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    docs.foreach { case (l, n) =>
      assert(mixed(l) == (if (l == "en") n else 2 * n), s"lang $l")
    }
  }

  test("pii01: no digits survive redaction and span counts match") {
    val rows = run("pii01_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getString(1).exists(_.isDigit))
      assert(r.getLong(2) == "<ID>".r.findAllIn(r.getString(1)).length)
    }
  }

  test("pack01: hierarchical packing equals the flat cumulative sum") {
    val rows = run("pack01_sequence_pack").collect()
    assert(rows.nonEmpty)
    // replay the packing sequentially: offsets must chain exactly
    var cum = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val (n, seqId, off) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(seqId == cum / 2048 && off == cum % 2048,
        s"doc ${r.getLong(0)}: start $cum -> ($seqId, $off)")
      cum += n
    }
  }

  test("vcb01: oov rate is 0 when every token clears min-count, consistent otherwise") {
    val rows = run("vcb01_vocab_oov").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0 && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-12)
    }
  }

  test("dif01: statuses partition the diff and agree with the perturbations") {
    val rows = run("dif01_snapshot_diff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, status) = (r.getLong(0), r.getString(1))
      status match {
        case "added"   => assert(id % 97 == 3 && id % 89 != 5)
        case "removed" => assert(id % 89 == 5 && id % 97 != 3)
        case "changed" => assert(id % 13 == 0 && id % 97 != 3 && id % 89 != 5)
        case other     => fail(s"unexpected status $other")
      }
    }
  }

  test("smp03: weighted sample is deterministic, 10 per stratum, biased to long docs") {
    val rows = run("smp03_weighted_sample").collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (_, rs) =>
      assert(rs.length <= 10)
      val rns = rs.map(_.getLong(4)).sorted
      assert(rns.sameElements(1L to rns.length)) // dense ranks
    }
    // determinism: second run bit-identical (hash-derived, no RNG state)
    val again = run("smp03_weighted_sample").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // weight = n_chars: the sample mean length must exceed the corpus mean
    // (Efraimidis-Spirakis selects long documents preferentially)
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = graft.sources.Tables(spark, sf0001).documents
      .agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("txt08: vocab growth stats reconcile - hapax <= vocab <= tokens, ttr consistent") {
    val rows = run("txt08_vocab_growth").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, vocab, hapax, ttr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(hapax <= vocab && vocab <= total)
      assert(math.abs(ttr - vocab.toDouble / total) < 1e-12)
    }
    // cross-check one source against a direct computation
    val direct = graft.sources.Tables(spark, sf0001).documents
      .filter(col("source") === "src0")
      .select(explode(graft.functions.TextExpressions.tokens(col("text"))).as("tk"))
      .groupBy("tk").count().collect()
    val r0 = rows.find(_.getString(0) == "src0").get
    assert(r0.getLong(1) == direct.map(_.getLong(1)).sum)
    assert(r0.getLong(2) == direct.length)
    assert(r0.getLong(3) == direct.count(_.getLong(1) == 1))
  }

  test("ord01: shuffle is a permutation - every doc once, dense positions, deterministic") {
    val rows = run("ord01_corpus_shuffle").collect()
    val n = graft.sources.Tables(spark, sf0001).documents.count()
    assert(rows.length == n, "every document appears exactly once")
    assert(rows.map(_.getLong(0)).distinct.length == n)
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val ps = rs.map(_.getLong(2)).sorted
      assert(ps.sameElements(1L to ps.length), "positions dense within shard")
    }
    assert(rows.map(_.getLong(1)).distinct.forall(s => s >= 0 && s < 8))
    val again = run("ord01_corpus_shuffle").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("mix02: allocation respects the budget and per-source caps") {
    val rows = run("mix02_token_budget").collect()
    assert(rows.nonEmpty)
    var allocSum = 0L
    rows.foreach { r =>
      val (tokens, alloc, rate) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(alloc >= 0 && alloc <= tokens, "cap: can't allocate more than exists")
      assert(rate >= 0.0 && rate <= 1.0)
      allocSum += alloc
    }
    // one water-filling round: total allocation never exceeds the budget
    // (floor division can only under-shoot)
    assert(allocSum <= 100000L, s"allocated $allocSum over budget")
    assert(allocSum > 0)
  }

  test("dm01: source stats reconcile with direct per-source counts") {
    val rows = run("dm01_source_stats").collect()
    val direct = graft.sources.Tables(spark, sf0001).documents
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == direct.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == direct(r.getString(0)))
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(1)) // dups < docs
      assert(r.getLong(5) >= 1)
    }
    // ordered by token volume desc
    val toks = rows.map(_.getLong(2))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }

  test("card01: per-language stats reconcile with direct counts") {
    val rows = run("card01_dataset_card").collect()
    val docs = graft.sources.Tables(spark, sf0001).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == docs.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == docs(r.getString(0)))
      assert(r.getLong(3) <= r.getLong(1), "unique docs cannot exceed docs")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    }
  }

  test("mix03: temperature weights normalize and upweight low-resource languages") {
    val rows = run("mix03_temperature_weights").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "sampled weights must sum to 1")
    val smallest = rows.minBy(_._2); val largest = rows.maxBy(_._2)
    assert(smallest._4 > smallest._3,
      s"alpha=0.5 must upweight the smallest language: $smallest")
    assert(largest._4 < largest._3,
      s"alpha=0.5 must downweight the largest language: $largest")
  }

  test("smp04: Poisson bootstrap replicates center on the corpus and vary across reps") {
    val rows = run("smp04_poisson_bootstrap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    val docs = graft.sources.Tables(spark, sf0001).documents
    val n = docs.count()
    val trueMean = docs.agg(org.apache.spark.sql.functions.avg("n_chars"))
      .collect().head.getDouble(0)
    rows.foreach { case (_, nEff, bootMean) =>
      // Poisson(1) row weights: E[n_eff]=n, sd=sqrt(n) — allow 5 sigma
      assert(math.abs(nEff - n) <= 5 * math.sqrt(n.toDouble), s"n_eff $nEff vs $n")
      assert(math.abs(bootMean - trueMean) / trueMean < 0.2)
    }
    // replicates must actually differ (distinct md5 draws per rep)
    assert(rows.map(_._3).distinct.length > 10)
  }

  test("txt12: readability components are self-consistent") {
    val rows = run("txt12_readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, y, f) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(w >= 1 && s >= 1 && y >= 1)
      val expect = BigDecimal(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(f - expect) < 1e-9, s"flesch $f != $expect")
    }
  }

  test("evalSpanContamination flags exactly the doc quoting an eval span") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),            // eval (0 % 97 == 0)
      (1L, "intro words then alpha beta gamma delta epsilon trailing"), // quotes 3 spans
      (2L, "totally unrelated content with no quoted material present"),
      (3L, "alpha beta but never four in a row"),
    ).toDF("doc_id", "text")
    val out = Corpus.evalSpanContamination(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc1 shares the 4-grams "alpha beta gamma delta" and
    // "beta gamma delta epsilon": 2 spans, 1 eval doc
    assert(out == Map(1L -> ((2L, 1L))), out.toString)
  }

  test("ord02: deciles are monotone in (n_tokens, doc_id); within-decile order is shuffled") {
    val rows = run("ord02_curriculum").collect()
    assert(rows.length > 0)
    // decile boundaries respect the curriculum order: the max
    // (n_tokens, doc_id) tuple of decile d precedes the min of d+1
    val byDecile = rows.groupBy(_.getAs[Long]("decile"))
    for (d <- 1L until 10L) {
      val hi = byDecile(d).map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("doc_id"))).max
      val lo = byDecile(d + 1).map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("doc_id"))).min
      assert(Ordering[(Long, Long)].lt(hi, lo), s"decile $d max $hi !< decile ${d + 1} min $lo")
    }
    // within a decile the read order is NOT doc_id order (the shuffle
    // key did something) but positions are dense 1..n
    val one = byDecile(1L).sortBy(_.getAs[Long]("pos"))
    assert(one.map(_.getAs[Long]("pos")).toSeq == (1L to one.length).toSeq)
    assert(one.map(_.getAs[Long]("doc_id")).toSeq != one.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("pii03: exactly the Luhn-validating half masks; masks keep only the last 4") {
    val rows = run("pii03_luhn_redact").collect()
    assert(rows.nonEmpty)
    // reference Luhn over the full 16-digit string (right-to-left,
    // double every second) — independent of the operator's payload fold
    def luhn(card: String): Boolean = {
      val s = card.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      s % 10 == 0
    }
    rows.foreach { r =>
      val key = r.getLong(0); val masked = r.getString(1); val valid = r.getBoolean(2)
      assert(valid == (key % 2 == 0), s"validity must track key parity: $key")
      if (valid) {
        assert(masked.startsWith("************") && masked.length == 16, masked)
      } else {
        assert(masked.length == 16 && masked.forall(_.isDigit), masked)
        assert(!luhn(masked), s"unmasked candidate must fail Luhn: $masked")
      }
    }
  }

  test("pii02: pseudonyms are consistent across tables and never expose the key") {
    val out = run("pii02_pseudonymize")
    // no column carries the raw key, and every pid is a 32-hex digest
    assert(!out.columns.exists(_.contains("custkey")))
    val pids = out.select("pid").collect().map(_.getString(0))
    assert(pids.forall(_.matches("[0-9a-f]{32}")))
    // referential consistency: per-pseudonym order counts equal the
    // raw-key join's counts (the pseudonym didn't split or merge keys)
    val t = graft.sources.Tables(spark, sf0001)
    val rawCounts = t.customer.join(t.orders,
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"))
      .groupBy("c_custkey").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    val pidCounts = out.collect().map(_.getAs[Long]("n_orders")).sorted.toSeq
    assert(pidCounts == rawCounts)
  }

  test("spl02: every stratum hits its train/val/test quota exactly") {
    val rows = graft.Registry.byName("spl02_stratified_split")
      .run(spark, sf0001).collect()
    val perLang = rows.groupBy(_.getString(1))
    for ((lang, rs) <- perLang) {
      val n = rs.length.toLong
      val by = rs.groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
      assert(by.getOrElse("train", 0L) == 8 * n / 10, s"$lang train quota")
      assert(by.getOrElse("val", 0L) == 9 * n / 10 - 8 * n / 10, s"$lang val quota")
      assert(by.getOrElse("test", 0L) == n - 9 * n / 10, s"$lang test quota")
    }
    // assignment is a pure function of doc_id: rerunning cannot move docs
    val again = graft.Registry.byName("spl02_stratified_split")
      .run(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("scd2History: all four key fates produce the right timeline rows") {
    import spark.implicits._
    val v1 = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"),
      (4L, null.asInstanceOf[String], "w")).toDF("k", "seg", "v")
    val v2 = Seq((1L, "a", "x"),            // unchanged
      (2L, "B", "y"),                        // changed
      (4L, "now-set", "w"),                  // NULL -> value transition
      (9L, "new", "n")                       // inserted; 3 deleted
    ).toDF("k", "seg", "v")
    val h = Corpus.scd2History(v1, v2, "k", Seq("seg", "v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .sortBy(r => (r._1, r._3))
    // unchanged: one open current row
    assert(h.filter(_._1 == 1L).toSeq ==
      Seq((1L, Some("a"), 1L, None, true)))
    // changed: closed old + open new
    assert(h.filter(_._1 == 2L).toSeq ==
      Seq((2L, Some("b"), 1L, Some(2L), false), (2L, Some("B"), 2L, None, true)))
    // deleted: closed old only, nothing current
    assert(h.filter(_._1 == 3L).toSeq == Seq((3L, Some("c"), 1L, Some(2L), false)))
    // NULL -> value is a CHANGE (null-safe compare), not an unchanged row
    assert(h.filter(_._1 == 4L).toSeq ==
      Seq((4L, None, 1L, Some(2L), false), (4L, Some("now-set"), 2L, None, true)))
    // inserted: open new row at v2
    assert(h.filter(_._1 == 9L).toSeq == Seq((9L, Some("new"), 2L, None, true)))
    // reconstruction: the is_current rows ARE snapshot v2
    val current = Corpus.scd2History(v1, v2, "k", Seq("seg", "v"))
      .filter($"is_current").select("k", "seg", "v")
    assert(current.exceptAll(v2).isEmpty && v2.exceptAll(current).isEmpty)
  }

  test("smp05: resize moves keys only into the NEW shard, roughly 1/9 of them") {
    val rows = run("smp05_rendezvous_sharding").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = rows.values.map(_._1).sum
    assert(total == spark.read.parquet(s"$sf0001/part.parquet").count())
    // the HRW theorem: no key ever moves into a pre-existing shard
    (0 to 7).foreach { sh =>
      rows.get(sh).foreach { case (_, moved) => assert(moved == 0L, s"shard $sh") }
    }
    // the new shard receives everything that moved, ~1/9 of the keys
    val (n8, moved8) = rows(8)
    assert(n8 == moved8, "every key in the new shard moved there")
    assert(moved8 > total / 20 && moved8 < total / 4,
      s"expected ~${total / 9} moved, got $moved8")
  }

  test("scd02: facts join the version valid at their time, not the current row") {
    val rows = run("scd02_pit_join").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // v1 facts never see a starred (v2-updated) segment; v2 facts do
    assert(!rows.keys.exists { case (v, seg) => v == 1L && seg.endsWith("*") },
      "a v1 fact leaked a v2 segment label")
    assert(rows.keys.exists { case (v, seg) => v == 2L && seg.endsWith("*") },
      "v2 facts must surface the updated labels")
    // deleted customers (key % 13 == 0) keep v1 facts, lose v2 facts:
    // total v2 fact-rows < total v1 fact-rows is the visible effect at
    // this data (deletions outnumber nothing on the v1 side)
    val n1 = rows.collect { case ((1L, _), n) => n }.sum
    val n2 = rows.collect { case ((2L, _), n) => n }.sum
    assert(n2 < n1, s"v2 must drop deleted customers' facts: $n2 !< $n1")
  }

  test("ord03: batches are full, length-sorted, and account for every doc") {
    val rows = run("ord03_length_batches").collect()
    val nDocs = graft.sources.Tables(spark, sf0001).documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // all batches full except possibly the last
    rows.sortBy(_.getAs[Long]("batch_id")).init.foreach(r =>
      assert(r.getAs[Long]("n_docs") == 16L))
    // descending length order => batch max_tokens never increases
    val maxes = rows.sortBy(_.getAs[Long]("batch_id")).map(_.getAs[Long]("max_tokens"))
    assert(maxes.zip(maxes.tail).forall { case (a, b) => a >= b }, maxes.mkString(","))
    rows.foreach(r => assert(r.getAs[Long]("pad_waste") >= 0L))
  }
}
