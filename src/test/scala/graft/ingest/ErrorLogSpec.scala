package graft.ingest

import graft.SparkSpec
import graft.ingest.JsonIngestor.FileError

class ErrorLogSpec extends SparkSpec {

  test("append/read/summary/export roundtrip; summary-from-log semantics") {
    val dir = tmpDir("errlog").resolve("log").toString
    val log = new ErrorLog(spark, dir)
    // empty log reads as an empty typed frame, summary is zeros
    assert(log.read().count() == 0)
    assert(log.summary().totalErrors == 0)

    log.append(Seq(
      FileError("/data/a.json", "unexpected end of input"),
      FileError("/data/b.json", "unexpected end of input")), "ParseError")
    log.append(Seq(FileError("/data/c.json", "bad byte 0xFF")), "EncodingError")
    log.log(new IllegalStateException("boom"), Some("/data/d.json"))

    val s = log.summary()
    assert(s.totalErrors == 4)
    assert(s.errorTypes == Map(
      "ParseError" -> 2L, "EncodingError" -> 1L, "IllegalStateException" -> 1L))
    assert(s.details.length == 4)

    // the distributed aggregation agrees with the driver summary
    val top = log.summaryDF().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.head == ("ParseError" -> 2L))
    assert(top.length == 3)

    // export writes parseable JSON with the reference's keys
    val out = tmpDir("errlog-export").resolve("summary.json")
    log.export(out.toString)
    val json = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(out))
    assert(json.get("total_errors").asLong == 4)
    assert(json.get("error_types").get("ParseError").asLong == 2)
    assert(json.get("error_details").size == 4)
  }

  test("numeric-looking messages stay strings; empty-but-existing dir reads empty") {
    val dir = tmpDir("errlog-num").resolve("log").toString
    val log = new ErrorLog(spark, dir)
    log.log(new RuntimeException("404"), Some("/data/x.json"))
    assert(log.summary().details.head._2 == "404") // not inferred as a number
    val emptyDir = tmpDir("errlog-empty").toString
    assert(new ErrorLog(spark, emptyDir).read().count() == 0)
  }

  test("ingest errors flow into the persistent log") {
    val dir = tmpDir("errlog-ingest")
    writeFile(dir, "ok.json", """[{"a": "1"}]""")
    writeFile(dir, "broken.json", """{"a": 1""")
    val res = JsonIngestor.ingest(spark, dir.toString)
    val log = new ErrorLog(spark, dir.resolve("_errors").toString)
    log.append(res.report.errors, "ParseError")
    val s = log.summary()
    assert(s.totalErrors == 1)
    assert(s.details.head._3.endsWith("broken.json"))
  }
}
