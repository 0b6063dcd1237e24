package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("txt11: entropy bounded by log2(types), ttr in (0,1], uniform doc hits the bound") {
    val rows = Registry.byName("txt11_token_entropy").run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, types, h, ttr) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(h >= -1e-9, s"entropy must be nonnegative, got $h")
      assert(h <= math.log(types.toDouble) / math.log(2.0) + 1e-6,
        s"entropy $h exceeds log2(types=$types)")
      assert(ttr > 0 && ttr <= 1.0)
      assert(types <= n)
    }
  }

  test("txt11: hand-checked extremes — all-same tokens give 0, all-distinct give log2(n)") {
    val docs = Seq(
      (1L, "a a a a a a a a"),
      (2L, "a b c d e f g h"),
    ).toDF("doc_id", "text")
    val dir = tmpDir("txt11")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.byName("txt11_token_entropy").run(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L)._1 == 0.0)
    assert(math.abs(out(2L)._1 - 3.0) < 1e-9) // log2(8) with 8 singletons
    assert(out(1L)._2 == 0.125 && out(2L)._2 == 1.0)
  }

  test("ii01: posting heads match a brute-force index; df floor holds") {
    val rows = graft.Registry.byName("ii01_inverted_index")
      .run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("df") >= 50L))
    // brute-force the index for the first term from raw text
    val term = rows.head.getString(0)
    val docs = graft.sources.Tables(spark, sf0001).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val withTerm = docs.filter(_._2.contains(term))
    assert(rows.head.getAs[Long]("df") == withTerm.length.toLong)
    assert(rows.head.getAs[Long]("total_tf") ==
      docs.map(_._2.count(_ == term).toLong).sum)
    assert(rows.head.getAs[String]("postings_head") ==
      withTerm.map(_._1).sorted.take(16).mkString(","))
  }
}
