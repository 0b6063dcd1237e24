package graft.query

import graft.SparkSpec
import graft.ingest.FileScanner
import graft.ingest.JsonIngestor.FileError

class QueryEngineSpec extends SparkSpec {
  lazy val qe = new QueryEngine(spark)

  test("A16: SQL passthrough over a registered view") {
    spark.read.parquet(s"$sf0001/nation.parquet").createOrReplaceTempView("nation_v")
    assert(qe.execute("SELECT COUNT(*) AS n FROM nation_v").collect().head.getLong(0) == 25)
  }

  test("A16: parameterized point lookup") {
    spark.read.parquet(s"$sf0001/region.parquet").createOrReplaceTempView("region_v")
    val r = qe.execute("SELECT r_name FROM region_v WHERE r_regionkey = :k", Map("k" -> 2))
    assert(r.collect().head.getString(0) == "ASIA")
  }

  test("A17/A18: preview and describe") {
    spark.read.parquet(s"$sf0001/region.parquet").createOrReplaceTempView("region_v")
    assert(qe.preview("region_v", 3).count() == 3)
    val d = qe.describe("region_v")
    assert(d.map(_._1) == Seq("r_regionkey", "r_name"))
  }

  test("A16: liveness SELECT 1") { assert(qe.ping()) }

  test("A16: non-SELECT statements run for their effect (DDL/DML passthrough)") {
    qe.execute("CREATE OR REPLACE TEMP VIEW qe_ddl AS SELECT 1 AS x")
    assert(qe.execute("SELECT x FROM qe_ddl").collect().head.getInt(0) == 1)
    qe.execute("DROP VIEW qe_ddl")
    intercept[Exception](qe.execute("SELECT x FROM qe_ddl").collect())
    // catalog surface (SHOW TABLES analogue of sqlite_master query)
    spark.read.parquet(s"$sf0001/region.parquet").createOrReplaceTempView("qe_show")
    val names = qe.execute("SHOW VIEWS").collect().map(_.getString(1))
    assert(names.contains("qe_show"))
  }

  test("A20: error summary top-k by count desc") {
    val errs = Seq(
      FileError("a.json", "ParseError: bad token"),
      FileError("b.json", "ParseError: eof"),
      FileError("c.json", "IOError: missing"))
    val rows = qe.errorSummary(errs).collect()
    assert(rows.head.getAs[String]("error_type") == "ParseError")
    assert(rows.head.getAs[Long]("n") == 2)
  }

  test("A2/A3: extension classification and ignore patterns") {
    assert(FileScanner.classify("x.JSON").contains("json"))
    assert(FileScanner.classify("x.ndjson").contains("json"))
    assert(FileScanner.classify("x.psv").contains("csv"))
    assert(FileScanner.classify("x.pqt").contains("parquet"))
    assert(FileScanner.classify("noext").isEmpty)
    assert(FileScanner.shouldIgnore(".hidden"))
    assert(FileScanner.shouldIgnore("f.tmp"))
    assert(FileScanner.shouldIgnore("f.bak"))
    assert(FileScanner.shouldIgnore("~lock"))
    assert(!FileScanner.shouldIgnore("data.json"))
  }
}
