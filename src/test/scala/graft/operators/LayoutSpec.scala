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
}
