package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {

  private lazy val customer = spark.read.parquet(s"$sf0001/customer.parquet")

  test("deletionVariants: the string plus every single-char deletion") {
    import spark.implicits._
    val out = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants(col("s")).as("v"))
      .collect().head.getSeq[String](0).toSet
    assert(out == Set("abc", "bc", "ac", "ab"))
    val empty = Seq("").toDF("s")
      .select(Fuzzy.deletionVariants(col("s")).as("v"))
      .collect().head.getSeq[String](0)
    assert(empty == Seq(""))
  }

  test("blocked fuzzy join equals the naive quadratic join (losslessness)") {
    val blocked = Fuzzy.fuzzyPairs(customer, "c_name", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = customer.select(col("c_custkey").as("ia"), col("c_name").as("ka"))
    val b = customer.select(col("c_custkey").as("ib"), col("c_name").as("kb"))
    val naive = a.crossJoin(b)
      .filter(col("ia") < col("ib") && levenshtein(col("ka"), col("kb")) <= 1)
      .select(col("ia"), col("ib"), levenshtein(col("ka"), col("kb")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == naive)
    assert(blocked.nonEmpty, "testdata should contain edit-distance-1 name pairs")
  }

  test("maxDist=2: depth-2 blocking equals the naive quadratic join (FastSS losslessness)") {
    import spark.implicits._
    // every distance-2 composition: 2 subs, 2 dels, 2 ins, sub+del,
    // sub+ins, del+ins, plus distance-3 pairs that must NOT appear
    val docs = Seq(
      (1L, "kitten"), (2L, "mutten"), (3L, "kien"), (4L, "kititen"),
      (5L, "sitten"), (6L, "kittenxy"), (7L, "wolverine"),
    ).toDF("id", "k")
    val blocked = Fuzzy.fuzzyPairs(docs, "k", "id", maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = docs.select(col("id").as("ia"), col("k").as("ka"))
    val b = docs.select(col("id").as("ib"), col("k").as("kb"))
    val naive = a.crossJoin(b)
      .filter(col("ia") < col("ib") && levenshtein(col("ka"), col("kb")) <= 2)
      .select(col("ia"), col("ib"), levenshtein(col("ka"), col("kb")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == naive, s"blocked $blocked vs naive $naive")
    assert(naive.exists(_._3 == 2L), "planted distance-2 pairs must exist")
    // on a real slice too
    val slice = customer.filter(col("c_custkey") < 150)
    val b2 = Fuzzy.fuzzyPairs(slice, "c_name", "c_custkey", maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val n2 = slice.select(col("c_custkey").as("ia"), col("c_name").as("ka"))
      .crossJoin(slice.select(col("c_custkey").as("ib"), col("c_name").as("kb")))
      .filter(col("ia") < col("ib") && levenshtein(col("ka"), col("kb")) <= 2)
      .select(col("ia"), col("ib"), levenshtein(col("ka"), col("kb")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(b2 == n2)
  }

  test("maxBucket drops boilerplate variant buckets (bounded work, documented recall trade)") {
    import spark.implicits._
    // 50 keys sharing a low-entropy stem: the shared variants form
    // giant buckets; with a tiny cap the join still runs and any pair
    // it DOES emit is exact (verify stage unaffected)
    val docs = (0L until 50L).map(i => (i, f"id$i%02d")).toDF("id", "k")
    val capped = Fuzzy.fuzzyPairs(docs, "k", "id", maxDist = 2, maxBucket = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    capped.foreach { case (x, y, d) => assert(x < y && d <= 2) }
    val uncapped = Fuzzy.fuzzyPairs(docs, "k", "id", maxDist = 2).collect()
    assert(capped.length <= uncapped.length)
  }

  test("insert/delete pairs (length differs by 1) are caught by the blocking") {
    import spark.implicits._
    val df = Seq((1L, "kitten"), (2L, "kittn"), (3L, "mitten"), (4L, "bolt"))
      .toDF("id", "name")
    val pairs = Fuzzy.fuzzyPairs(df, "name", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // kitten-kittn is a deletion; kitten-mitten a substitution;
    // kittn-mitten is distance 2 and must NOT appear
    assert(pairs == Set((1L, 2L), (1L, 3L)))
  }
}
