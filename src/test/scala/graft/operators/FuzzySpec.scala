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
