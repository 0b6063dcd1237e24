package graft.ingest

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the normalization contract (SURVEY.md §5:
  * round-trip + null/empty laws over generated JSON records).
  * ScalaCheck generators driven with fixed seeds (no scalatestplus
  * bridge in the offline dependency set).
  */
class NormalizerPropertySpec extends SparkSpec {

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
    Gen.oneOf("true", "false"),
    Gen.const("null"),
  )

  private val recordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 5)
    keys <- Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
    vals <- Gen.listOfN(keys.size, scalarGen)
  } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: ingested values are non-null text; JSON nulls map to empty string") {
    for (i <- 1 to 10) {
      val records = sample(Gen.listOfN(3, recordGen), i.toLong)
      val dir = tmpDir("prop")
      writeFile(dir, "data.json", records.mkString("[", ",", "]"))
      val df = JsonIngestor.ingest(spark, dir.toString).data
      assert(df.count() == records.size, s"seed $i")
      assert(df.schema.fields.forall(_.dataType.typeName == "string"), s"seed $i")
      // within a single file every field is non-null (null -> "")
      val rows = df.collect()
      assert(rows.forall(r => (0 until r.length).forall(j => r.get(j) != null)), s"seed $i")
    }
  }

  test("property: int64 values round-trip exactly through TEXT normalization") {
    for (i <- 1 to 10) {
      val v = sample(Gen.chooseNum(Long.MinValue, Long.MaxValue), 100L + i)
      val dir = tmpDir("propl")
      writeFile(dir, "data.json", s"""[{"v": $v}]""")
      val df = JsonIngestor.ingest(spark, dir.toString).data
      assert(df.collect().head.getAs[String]("v") == v.toString, s"seed $i")
    }
  }

  test("property: nested structures round-trip through their JSON string form") {
    for (i <- 1 to 10) {
      val a = sample(Gen.alphaNumStr.map(_.take(10)), 200L + i)
      val b = sample(Gen.chooseNum(-1000000L, 1000000L), 300L + i)
      val dir = tmpDir("propn")
      writeFile(dir, "data.json", s"""[{"inner": {"a": "$a", "b": $b}}]""")
      val df = JsonIngestor.ingest(spark, dir.toString).data
      val s = df.collect().head.getAs[String]("inner")
      val parsed = spark.read.json(
        spark.createDataset(Seq(s))(org.apache.spark.sql.Encoders.STRING)).collect().head
      assert(parsed.getAs[String]("a") == a, s"seed $i")
      assert(parsed.getAs[Long]("b") == b, s"seed $i")
    }
  }
}
