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
}
