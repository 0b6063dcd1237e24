package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while a cat watches from the warm windowsill " +
      "and the evening light settles in across the quiet garden path near the old wooden fence"
  private val german =
    "der hund und die katze sind nicht im garten und das wetter ist heute wirklich nicht gut " +
      "und die sonne ist auch nicht zu sehen und das ist wirklich schade heute"

  test("curate filters, dedups and reports per-stage counts") {
    val docs = Seq(
      (0L, good),                              // keeps
      (1L, good),                              // exact dup of 0 -> removed
      (2L, good.replace("lazy", "sleepy")),    // near dup -> removed
      (3L, german),                            // wrong language -> removed
      (4L, "too short"),                       // quality -> removed
      (5L, ("spam " * 40).trim),               // low distinct ratio -> removed
      (6L, "the engine plans a distributed query and the optimizer picks a broadcast join " +
        "while the shuffle stays small and the partitions remain balanced for the readers"),
    ).toDF("doc_id", "text")
    val r = CurationPipeline.curate(docs,
      CurationPipeline.Config(minTokens = 10, nearDupThreshold = 0.5))
    assert(r.counts.input == 7)
    assert(r.counts.afterQuality == 5) // drops 4 (short) and 5 (repetitive)
    assert(r.counts.afterLang == 4)    // drops 3 (german)
    assert(r.counts.afterExact == 3)   // drops 1 (exact dup)
    assert(r.counts.afterNearDup == 2) // drops 2 (near dup)
    val kept = r.corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 6L))
    assert(r.counts.afterDecontam == r.counts.afterNearDup,
      "no benchmark given: decontamination must be a no-op")
  }

  test("curate with a benchmark set decontaminates the surviving corpus") {
    val docs = Seq(
      (0L, good),
      (6L, "the engine plans a distributed query and the optimizer picks a broadcast join " +
        "while the shuffle stays small and the partitions remain balanced for the readers"),
    ).toDF("doc_id", "text")
    // benchmark shares a long span with doc 6 only
    val bench = Seq(
      (100L, "the optimizer picks a broadcast join while the shuffle stays small")
    ).toDF("doc_id", "text")
    val r = CurationPipeline.curate(docs,
      CurationPipeline.Config(minTokens = 10, nearDupThreshold = 0.5),
      benchmark = Some(bench))
    assert(r.counts.afterNearDup == 2)
    assert(r.counts.afterDecontam == 1)
    assert(r.corpus.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(0L))
    r.release()
  }

  test("curate scans the corpus once: stage counts are observe() side effects") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val fileScans = new java.util.concurrent.atomic.AtomicInteger(0)
    // true only when the execution itself reads the parquet file —
    // deliberately does NOT descend into InMemoryRelation (whose plan
    // text/tree embeds the original scan it replaced)
    def readsFile(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        readsFile(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => readsFile(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains("documents.parquet"))
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => false
      case other => other.children.exists(readsFile)
    }
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (readsFile(qe.executedPlan)) fileScans.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val r = CurationPipeline.curate(docs, CurationPipeline.Config(minTokens = 5))
      assert(r.counts.input == 500)
      // the near-dup and retention stages read the cached exact-dedup
      // survivors, not the recomputed filter chain
      val plan = r.corpus.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan.take(1200))
      // listener events are async: wait for the count to go quiet
      var last = -1
      var spins = 0
      while (fileScans.get() != last && spins < 20) {
        last = fileScans.get(); Thread.sleep(250); spins += 1
      }
      // NO top-level execution reads the parquet file directly: the one
      // real read happens during cache population (inside
      // InMemoryRelation, invisible to readsFile by design). The
      // round-1 version ran its stage counts as uncached actions and
      // would show 4-5 direct file-scanning executions here.
      assert(fileScans.get() == 0,
        s"expected no direct file-scanning executions, saw ${fileScans.get()}")
      // release() frees the cache; the corpus plan stays usable
      r.release()
      assert(r.corpus.count() == r.counts.afterNearDup)
    } finally spark.listenerManager.unregister(listener)
  }

  test("curate with splits: every survivor assigned; assignment stable across configs") {
    val docs = Seq(
      (0L, good),
      (2L, good.replace("lazy", "sleepy")),    // near dup of 0
      (6L, "the engine plans a distributed query and the optimizer picks a broadcast join " +
        "while the shuffle stays small and the partitions remain balanced for the readers"),
    ).toDF("doc_id", "text")
    val cfg = CurationPipeline.Config(minTokens = 10, nearDupThreshold = 0.5)
    val r = CurationPipeline.curate(docs, cfg, assignSplits = true)
    val splits = r.splits.get.collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    val kept = r.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(splits.keySet == kept, "every surviving doc gets a split")
    assert(splits.values.forall(v => Set("train", "val", "test")(v._2)))
    // invariance: raising the threshold so doc 2 SURVIVES must not move
    // doc 0's split (cluster-hash keying, not doc-hash)
    val loose = CurationPipeline.curate(docs,
      cfg.copy(nearDupThreshold = 0.999), assignSplits = true)
    val looseSplits = loose.splits.get.collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(looseSplits(0L) == splits(0L)._2,
      "doc 0's split must not depend on dedup config")
    r.release(); loose.release()
  }

  test("curate on the documents table keeps a sane fraction") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = CurationPipeline.curate(docs, CurationPipeline.Config(minTokens = 5))
    assert(r.counts.input == 500)
    assert(r.counts.afterNearDup > 0)
    assert(r.counts.afterNearDup <= r.counts.afterExact)
    assert(r.corpus.columns.toSeq == Seq("doc_id", "text"))
    // pipeline is idempotent: curating the output changes nothing
    val r2 = CurationPipeline.curate(r.corpus, CurationPipeline.Config(minTokens = 5))
    assert(r2.counts.afterNearDup == r.counts.afterNearDup)
  }

  test("curateIncremental: planted cross-batch duplicates are caught by the persisted state") {
    val alt = good.replace("lazy", "sleepy")
    val other = "the engine plans a distributed query and the optimizer picks a broadcast join " +
      "while the shuffle stays small and the partitions remain balanced for the readers"
    // ids 0..3 land as batch 1 (split at count/2 = 4), 4..7 as batch 2
    val docs = Seq(
      (0L, good),            // batch 1, retained
      (1L, alt),             // batch 1, near-dup of 0 -> dropped (smaller neighbor)
      (2L, other),           // batch 1, retained
      (3L, german),          // batch 1, language-gated
      (4L, good),            // batch 2, EXACT dup of landed 0 -> digest state drops it
      (5L, good.replace("lazy", "weary")),   // batch 2, near-dup of landed 0 -> index probe drops it
      (6L, other.replace("broadcast", "shuffled")), // batch 2, near-dup of landed 2 -> dropped
      (7L, "the careful reader follows the long and winding story of the data pipeline " +
        "as it moves through many stages toward the final clean corpus output table"),
    ).toDF("doc_id", "text")
    val out = CurationPipeline.curateIncremental(docs,
      CurationPipeline.Config(minTokens = 10, nearDupThreshold = 0.5))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 2L, 7L), s"got $out")
  }

  test("curateIncremental is split-invariant: any batch boundary lands the same corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val cfg = CurationPipeline.Config(nearDupThreshold = 0.5)
    def run(splitAt: Long): Seq[(Long, Long)] =
      CurationPipeline.curateIncremental(docs, cfg, splitAt = Some(splitAt))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val mid = CurationPipeline.curateIncremental(docs, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mid.nonEmpty && mid == mid.sortBy(_._1))
    // everything in batch 2, a lopsided 100-doc first batch, everything
    // in batch 1 — the incremental machinery must be invisible (the
    // DuckDB oracle separately proves mid == the from-scratch run)
    assert(run(0L) == mid, "empty first batch must change nothing")
    assert(run(100L) == mid, "lopsided split must change nothing")
    assert(run(1000000L) == mid, "everything-in-batch-1 must change nothing")
  }
}
