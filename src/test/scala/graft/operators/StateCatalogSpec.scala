package graft.operators

import graft.SparkSpec
import graft.ingest.FileUtils
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The state catalog's FAILURE census — the rows ops01 can't show
  * because its lifecycles all complete cleanly: a stale `_SAVING`
  * lease, a claimed-but-never-committed batch id (crashed appender),
  * and the loud rejection of a root that holds no engine state.
  */
class StateCatalogSpec extends SparkSpec {

  private val conf = spark.sparkContext.hadoopConfiguration

  test("describeState surfaces a stale save lease and an abandoned claim") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again"),
      (1L, "pack my box with five dozen liquor jugs for the judge"))
      .toDF("doc_id", "text")
    val path = tmpDir("cat_fail_nd").toString
    try {
      Dedup.saveNearDupIndex(docs, path)
      // a crashed saver's lease + a crashed appender's claim (id
      // reserved, dir never committed)
      FileUtils.touch(s"$path/_SAVING", conf)
      assert(FileUtils.createExclusive(s"$path/batches/b7.claim", conf))
      val r = StateCatalog.describeState(spark, path).head
      assert(r.getAs[String]("state_kind") == "near_dup_index")
      assert(r.getAs[Boolean]("stale_saving_lease"),
        "the lease must be surfaced")
      assert(r.getAs[Long]("abandoned_claims") == 1L,
        "the uncommitted claim must be surfaced")
      assert(r.getAs[Long]("committed_batches") == 1L)
      // ... and a half-written batch dir (claim + dir, no _COMMITTED)
      // is still just one abandoned claim, never a committed batch
      FileUtils.mkdirs(s"$path/batches/b7", conf)
      val r2 = StateCatalog.describeState(spark, path).head
      assert(r2.getAs[Long]("abandoned_claims") == 1L)
      assert(r2.getAs[Long]("committed_batches") == 1L)
    } finally FileUtils.rmr(path, conf)
  }

  test("describeState on a vector index counts live vs retired batches") {
    val emb = Tables(spark, sf0001).embeddings
    val path = tmpDir("cat_vidx").toString
    try {
      VectorIndex.saveVectorIndex(
        emb.filter(col("vec_id") < 32 || col("vec_id") % 3 === 0), path)
      VectorIndex.appendVectorIndex(
        emb.filter(col("vec_id") >= 32 && col("vec_id") % 3 =!= 0), path)
      assert(VectorIndex.retireVectorIndexBatches(spark, path,
        keepLast = 1) == Seq(0L))
      val r = StateCatalog.describeState(spark, path).head
      assert(r.getAs[String]("state_kind") == "vector_index")
      assert(r.getAs[String]("geometry") == "n_cells=16,n_sub=8,sub_dim=8")
      // committed INCLUDES the retired subset — the census never
      // hides history the bytes still hold
      assert(r.getAs[Long]("committed_batches") == 2L)
      assert(r.getAs[Long]("retired_batches") == 1L)
    } finally FileUtils.rmr(path, conf)
  }

  test("an unrecognizable root fails loudly naming the known layouts") {
    val path = tmpDir("cat_unknown").toString
    FileUtils.mkdirs(s"$path/whatever", conf)
    val e = intercept[RuntimeException](
      StateCatalog.describeState(spark, path))
    assert(e.getMessage.contains("no recognizable engine state"))
    assert(e.getMessage.contains("vector index"))
    assert(e.getMessage.contains("compacted table"),
      "the fourth lifecycle must be named in the rejection")
  }

  test("describeState on a compacted table: live version, abandoned claim, cluster-by") {
    import spark.implicits._
    val path = tmpDir("cat_cmp").toString
    try {
      val landing = s"$path/landing"
      spark.range(0, 512).select(col("id").as("k"))
        .repartition(4).write.parquet(landing)
      val dst = s"$path/versions"
      // a compactor that claimed v0 and crashed BEFORE writing: the
      // root is already recognizable (claims land first), with no
      // live version yet
      assert(FileUtils.claimSeqDir(dst, "v", conf).endsWith("/v0"))
      val r0 = StateCatalog.describeState(spark, dst).head
      assert(r0.getAs[String]("state_kind") == "compacted_table")
      assert(r0.getAs[Long]("generation") == -1L,
        "no committed version yet → no live version")
      assert(r0.getAs[Long]("abandoned_claims") == 1L)
      assert(r0.getAs[String]("geometry") == "")
      // plain v1, then clustered v2 — v2 is live and carries the
      // recorded cluster-by column; the v0 claim stays abandoned
      Layout.compact(spark, landing, dst, targetBytes = 1L << 20)
      Layout.compact(spark, landing, dst, targetBytes = 1L << 20,
        clusterBy = Some("k"))
      val r = StateCatalog.describeState(spark, dst).head
      assert(r.getAs[String]("state_kind") == "compacted_table")
      assert(r.getAs[Long]("generation") == 2L)
      assert(r.getAs[Long]("committed_batches") == 2L)
      assert(r.getAs[Long]("abandoned_claims") == 1L)
      assert(r.getAs[String]("geometry") == "cluster_by=k")
      assert(!r.getAs[Boolean]("stale_saving_lease"))
      // the census agrees with what the reader actually resolves
      assert(Layout.readCompacted(spark, dst).count() == 512L)
    } finally FileUtils.rmr(path, conf)
  }

  test("describeWarehousePartitions refuses a non-warehouse root") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val path = tmpDir("cat_notwh").toString
    try {
      Dedup.saveNearDupIndex(docs, path)
      val e = intercept[IllegalArgumentException](
        StateCatalog.describeWarehousePartitions(spark, path))
      assert(e.getMessage.contains("not a sketch warehouse"))
    } finally FileUtils.rmr(path, conf)
  }
}
