package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")

  test("zValue interleaves bits (known examples)") {
    import spark.implicits._
    val out = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // x=3 (11), y=5 (101): z = x0 + 2*y0 + 4*x1 + 8*y1 + 16*x2 + 32*y2
    //                        = 1 + 2 + 4 + 0 + 0 + 32 = 39
    assert(out(0) == 39L)
    assert(out(1) == 0L)
    assert(out(2) == 0x55555555L) // 16 x-bits at even positions
    assert(out(3) == 0xaaaaaaaaL) // 16 y-bits at odd positions
  }

  test("z-order monotone locality: close keys get close z-values within a quadrant") {
    import spark.implicits._
    val z = Seq((4L, 4L), (5L, 4L), (4L, 5L), (5L, 5L), (100L, 100L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // the 2x2 block starting at an even corner is z-contiguous
    assert(z.take(4).sorted.sameElements(Array(z(0), z(0) + 1, z(0) + 2, z(0) + 3)))
    assert(z(4) > z(3))
  }

  test("zorderWrite files carry tighter per-file rectangles than a hash layout") {
    val dir = tmpDir("graft_zorder")
    val zPath = dir.resolve("z").toString
    val hPath = dir.resolve("h").toString
    Layout.zorderWrite(lineitem, "l_partkey", "l_suppkey", zPath, nFiles = 8)
    lineitem.repartition(8).write.mode("overwrite").parquet(hPath)
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length
    }
    // the wide dimension (partkey: 8 bits at this SF) must tighten
    // sharply; suppkey's whole domain is 0-9 here, so with 8 files its
    // span can only be asked not to REGRESS (a z-curve splits on the
    // highest differing bit, which at this scale is always partkey's)
    assert(avgSpan(zPath, "l_partkey") < 0.8 * avgSpan(hPath, "l_partkey"))
    assert(avgSpan(zPath, "l_suppkey") <= avgSpan(hPath, "l_suppkey"))
  }

  test("zBucketStats: buckets partition the corpus with bounded rectangles") {
    val stats = Layout.zBucketStats(lineitem, "l_partkey", "l_suppkey").collect()
    val total = lineitem.count()
    assert(stats.map(_.getLong(1)).sum == total)
    val buckets = stats.map(_.getLong(0))
    assert(buckets.distinct.length == buckets.length)
    assert(buckets.forall(b => b >= 0 && b < 64))
    val globalXSpan = stats.map(_.getLong(3)).max - stats.map(_.getLong(2)).min
    val avgXSpan = stats.map(r => (r.getLong(3) - r.getLong(2)).toDouble).sum / stats.length
    assert(avgXSpan < globalXSpan, "z-buckets should bound the x dimension")
  }

  test("zo02: z-order prunes the non-sort dimension where linear cannot") {
    val rows = graft.Registry.byName("zo02_pruning_benefit")
      .run(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet ==
      Set("linear_x", "linear_y", "zorder_x", "zorder_y"))
    // every layout must scan at least what the predicate matches
    rows.values.foreach { case (_, _, scanned, matched) =>
      assert(scanned >= matched, s"pruning can never drop matches: $rows")
    }
    // the headline: on the NON-sort dimension, linear buckets span the
    // whole y domain (no pruning) while z-rectangles bound y
    val (_, _, linY, _) = rows("linear_y")
    val (_, _, zY, _) = rows("zorder_y")
    assert(zY < linY, s"z-order must out-prune linear on y: z=$zY linear=$linY")
  }

  test("compact: fewer even files, rows untouched, versions crash-safe, skew evened") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = tmpDir("graft_compact")
    val landing = dir.resolve("landing").toString
    val dst = dir.resolve("compacted").toString
    // a SKEWED landing: one fat file + 31 slivers (the coalesce trap —
    // concatenating whole input partitions would keep the skew)
    lineitem.filter(col("l_orderkey") % 32 === 0).repartition(1)
      .write.parquet(landing)
    lineitem.filter(col("l_orderkey") % 32 =!= 0).repartition(31)
      .write.mode("append").parquet(landing)
    val before = graft.ingest.FileUtils.listDataFilesWithSize(landing, conf)
    assert(before.size == 32)
    val target = (before.map(_._2).sum + 3) / 4 // aim at ~4 output files
    val stats = Layout.compact(spark, landing, dst, target)
    assert(stats.filesBefore == 32 && stats.filesAfter.toInt <= 5)
    // content invariance, row for row — multiset compare ((l_orderkey,
    // l_linenumber) is NOT unique in the synthetic lineitem, so no
    // ORDER BY is total)
    def multiset(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.toSeq).view.mapValues(_.length).toMap
    val a = multiset(lineitem.collect())
    val b = multiset(Layout.readCompacted(spark, dst)
      .select(lineitem.columns.map(col).toIndexedSeq: _*).collect())
    assert(a == b, "compaction changed row content")
    // even sizing: no output file more than 2x the mean
    val sizes = graft.ingest.FileUtils
      .listDataFilesWithSize(s"$dst/v0/data", conf).map(_._2)
    val mean = sizes.sum.toDouble / sizes.size
    assert(sizes.forall(_ <= 2 * mean),
      s"round-robin rewrite left skewed files: $sizes")
    // an uncommitted (crashed) later version is invisible to readers
    graft.ingest.FileUtils.mkdirs(s"$dst/v1/data", conf)
    assert(Layout.readCompacted(spark, dst).count() == lineitem.count())
    // a second committed pass supersedes v0
    Layout.compact(spark, dst + "/v0/data", dst, Long.MaxValue)
    val vs = graft.ingest.FileUtils.listSubdirs(dst, conf)
      .map(d => new org.apache.hadoop.fs.Path(d).getName)
      .filterNot(_.endsWith(".claim"))
    assert(vs.contains("v2"), s"versions: $vs")
    assert(Layout.readCompacted(spark, dst).count() == lineitem.count())
  }

  test("cmp03: vacuum crash safety, lease exclusion, and the post-vacuum catalog census") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = tmpDir("graft_cmp03_spec")
    val landing = dir.resolve("landing").toString
    val dst = dir.resolve("compacted").toString
    spark.range(0, 4096).select(col("id").as("k"))
      .repartition(16).write.parquet(landing)
    Layout.compact(spark, landing, dst, 1L << 20)
    Layout.compact(spark, landing, dst, 1L << 20)
    val claimed = graft.ingest.FileUtils.claimSeqDir(dst, "v", conf)
    graft.ingest.FileUtils.mkdirs(s"$claimed/data", conf)
    // a vacuum KILLED mid-sweep: it had atomically unsealed v0 (the
    // marker goes first) and died before finishing the bytes — readers
    // must still resolve the live v1, and a re-run must finish
    graft.ingest.FileUtils.delete(s"$dst/v0/_COMMITTED",
      recursive = false, conf)
    assert(Layout.readCompacted(spark, dst).count() == 4096L,
      "a killed vacuum must leave the live version serving")
    val stats = Layout.vacuumCompacted(spark, dst)
    assert(stats.liveVersion == 1L && stats.droppedVersions == 2L,
      s"re-run vacuum must finish the sweep: $stats")
    assert(Layout.readCompacted(spark, dst).count() == 4096L)
    assert(graft.ingest.FileUtils.listSubdirs(dst, conf).size == 1 &&
      !graft.ingest.FileUtils.exists(s"$dst/v2.claim", conf),
      "superseded/abandoned dirs and stale claims must be reclaimed")
    // vacuuming again is a clean no-op census (idempotent maintenance)
    assert(Layout.vacuumCompacted(spark, dst) ==
      Layout.CompactionVacuumStats(1L, 0L, 0L))
    // the state catalog reflects the reclaim: one committed version,
    // zero abandoned claims, generation = the live version id
    val census = StateCatalog.describeState(spark, dst)
      .select("state_kind", "generation", "committed_batches",
        "abandoned_claims").head
    assert(census.getString(0) == "compacted_table" &&
      census.getLong(1) == 1L && census.getLong(2) == 1L &&
      census.getLong(3) == 0L, s"post-vacuum census off: $census")
    // the lease excludes maintenance overlap BOTH ways: a held lease
    // (a live compactor or vacuum) makes the other fail loudly naming
    // the remedy instead of running beside it
    graft.ingest.FileUtils.touch(s"$dst/_SAVING", conf)
    try {
      val e1 = intercept[IllegalArgumentException](
        Layout.vacuumCompacted(spark, dst))
      assert(e1.getMessage.contains("_SAVING"))
      val e2 = intercept[IllegalArgumentException](
        Layout.compact(spark, landing, dst, 1L << 20))
      assert(e2.getMessage.contains("_SAVING"))
    } finally graft.ingest.FileUtils.delete(s"$dst/_SAVING",
      recursive = false, conf)
    // vacuum refuses a root with no committed version at all (nothing
    // safe to keep serving)
    val empty = dir.resolve("never_committed").toString
    graft.ingest.FileUtils.mkdirs(s"$empty/v0/data", conf)
    val e3 = intercept[IllegalArgumentException](
      Layout.vacuumCompacted(spark, empty))
    assert(e3.getMessage.contains("no committed compaction"))
  }

  test("compact clusterBy: files carry disjoint-ish min-max bounds on the cluster column") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = tmpDir("graft_compact_cluster")
    val landing = dir.resolve("landing").toString
    val dst = dir.resolve("compacted").toString
    lineitem.repartition(16).write.parquet(landing)
    val target = (graft.ingest.FileUtils.listDataFilesWithSize(landing, conf)
      .map(_._2).sum + 3) / 4
    Layout.compact(spark, landing, dst, target, clusterBy = Some("l_partkey"))
    // per-file min-max on the cluster column must tile, not overlap
    // wholesale: read each compacted file separately and check the
    // ranges are pairwise non-nested (range clustering ⇒ sortable)
    val files = graft.ingest.FileUtils.listDataFilesWithSize(s"$dst/v0/data", conf)
      .map(_._1)
    assert(files.size >= 2, "need multiple files to check bounds")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("l_partkey")), max(col("l_partkey"))).head
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(lo2 >= hi, s"cluster ranges interleave: $ranges")
      case _ => ()
    }
  }

  test("cmp02: clustered compaction prunes STRICTLY fewer files and rows than plain") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = tmpDir("graft_cmp02_strict")
    val landing = dir.resolve("landing").toString
    lineitem.repartition(64).write.parquet(landing)
    val bytes = graft.ingest.FileUtils.listDataFilesWithSize(landing, conf)
      .map(_._2).sum
    val target = (bytes - 1) / 8 + 1
    Layout.compact(spark, landing, dir.resolve("plain").toString, target)
    Layout.compact(spark, landing, dir.resolve("clustered").toString,
      target, clusterBy = Some("l_partkey"))
    val cut = lineitem.agg(expr("CAST(MAX(l_partkey) AS BIGINT) div 8"))
      .head.getLong(0)
    // the physical census the query derives its booleans from — a
    // file must be scanned iff its min clears the low-range cut
    def census(dst: String): (Long, Long) = {
      val st = Layout.readCompacted(spark, dst)
        .select(col("l_partkey"), input_file_name().as("f"))
        .groupBy("f")
        .agg(min(col("l_partkey")).cast("bigint").as("mn"),
          count(lit(1)).as("n"))
        .collect()
      (st.count(_.getLong(1) <= cut).toLong,
        st.filter(_.getLong(1) <= cut).map(_.getLong(2)).sum)
    }
    val (pf, pr) = census(dir.resolve("plain").toString)
    val (cf, cr) = census(dir.resolve("clustered").toString)
    assert(cf < pf, s"clustered must hit strictly fewer files: $cf vs $pf")
    assert(cr < pr, s"clustered must scan strictly fewer rows: $cr vs $pr")
    assert(cf >= 1 && cr >= 1, "the matching range itself must survive")
  }
}
