package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Normalization contract tests — ports of the reference's semantic
  * tests (reference tests/unit/test_json_processor.py; SURVEY.md §1.2 /
  * §5 "highest-value ports").
  */
class NormalizerSpec extends SparkSpec {

  private def oneFile(json: String): org.apache.spark.sql.DataFrame = {
    val dir = tmpDir("norm")
    writeFile(dir, "data.json", json)
    JsonIngestor.ingest(spark, dir.toString).data
  }

  test("flat records pass through unchanged (test_json_processor.py:21-34)") {
    val df = oneFile("""[{"id": "A1", "name": "John", "age": 30}]""")
    val row = df.collect().head
    assert(df.columns.toSeq == Seq("_source_file", "age", "id", "name"))
    assert(row.getAs[String]("id") == "A1")
    assert(row.getAs[String]("name") == "John")
    assert(row.getAs[String]("age") == "30")
    assert(row.getAs[String]("_source_file") == "data.json")
  }

  test("nested objects become JSON strings that round-trip (:36-56)") {
    val df = oneFile("""[{"user": "u1", "profile": {"city": "NYC", "zip": "10001"}}]""")
    val s = df.collect().head.getAs[String]("profile")
    val parsed = spark.read.json(
      spark.createDataset(Seq(s))(org.apache.spark.sql.Encoders.STRING))
    val r = parsed.collect().head
    assert(r.getAs[String]("city") == "NYC")
    assert(r.getAs[String]("zip") == "10001")
  }

  test("arrays become JSON strings (:58-74)") {
    val df = oneFile("""[{"id": 1, "tags": ["a", "b", "c"]}]""")
    assert(df.collect().head.getAs[String]("tags") == """["a","b","c"]""")
  }

  test("null and empty collections map to empty string (:76-90 + edge_cases fixture)") {
    val df = oneFile(
      """[{"a": null, "b": "", "c": [], "d": {}, "e": "x"},
         {"a": "v", "b": null, "c": ["y"], "d": {}, "e": null}]""")
    val rows = df.orderBy(col("e")).collect()
    val r1 = rows.find(_.getAs[String]("e") == "x").get
    assert(r1.getAs[String]("a") == "")
    assert(r1.getAs[String]("b") == "")
    assert(r1.getAs[String]("c") == "")   // empty array -> ""
    assert(r1.getAs[String]("d") == "")   // empty object -> ""
    val r2 = rows.find(_.getAs[String]("a") == "v").get
    assert(r2.getAs[String]("b") == "")
    assert(r2.getAs[String]("c") == """["y"]""")
    assert(r2.getAs[String]("e") == "")
  }

  test("non-dict top-level items are dropped (:100-109)") {
    val df = oneFile("""[{"id": 1}, "just a string", 42, {"id": 2}]""")
    assert(df.count() == 2)
    assert(df.select("id").collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2"))
  }

  test("single top-level object is wrapped (application.py:84-86)") {
    val df = oneFile("""{"only": "one"}""")
    assert(df.count() == 1)
    assert(df.collect().head.getAs[String]("only") == "one")
  }

  test("int64/double extremes survive (error_handling large_values fixture)") {
    val df = oneFile(
      """[{"big_int": 9223372036854775807, "small": -9223372036854775808, "pi": 3.5}]""")
    val r = df.collect().head
    assert(r.getAs[String]("big_int") == "9223372036854775807")
    assert(r.getAs[String]("small") == "-9223372036854775808")
    assert(r.getAs[String]("pi") == "3.5")
  }

  test("unicode passes through (unicode_test fixture)") {
    val df = oneFile("""[{"cjk": "你好", "emoji": "🎉", "ar": "مرحبا"}]""")
    val r = df.collect().head
    assert(r.getAs[String]("cjk") == "你好")
    assert(r.getAs[String]("emoji") == "🎉")
    assert(r.getAs[String]("ar") == "مرحبا")
  }
}
