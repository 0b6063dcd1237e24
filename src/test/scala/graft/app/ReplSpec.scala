package graft.app

import graft.SparkSpec

class ReplSpec extends SparkSpec {
  import spark.implicits._

  test("eval: SQL passthrough renders aligned results; errors don't kill the loop") {
    Seq((1L, "ann"), (2L, "bob")).toDF("id", "name").createOrReplaceTempView("repl_t")
    val out = Repl.eval(spark, "SELECT id, name FROM repl_t ORDER BY id").get
    assert(out.linesIterator.toSeq.head.startsWith("id"))
    assert(out.contains("ann") && out.contains("bob"))
    // a bad query reports, it doesn't throw
    assert(Repl.eval(spark, "SELECT FROM nowhere").get.startsWith("error:"))
    assert(Repl.eval(spark, ":bogus").get.startsWith("error: unknown command"))
  }

  test("eval: meta commands (:schema, :preview, :tables, :quit)") {
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("repl_meta")
    val schema = Repl.eval(spark, ":schema repl_meta").get
    assert(schema.contains("k\tbigint") && schema.contains("v\tstring"))
    val prev = Repl.eval(spark, ":preview repl_meta 5").get
    assert(prev.contains("x"))
    assert(Repl.eval(spark, ":tables").get.contains("repl_meta"))
    assert(Repl.eval(spark, ":quit").isEmpty)
    assert(Repl.eval(spark, "").get == "")
  }

  test("eval: declared queries run by name (:queries / :query)") {
    val listing = Repl.eval(spark, ":queries").get
    assert(listing.linesIterator.contains("q01_pricing_summary"))
    assert(listing.linesIterator.contains("dc01_decontaminate"))
    val out = Repl.eval(spark, s":query q22_count_star $sf0001").get
    assert(out.contains("n_rows"), out)
    assert(Repl.eval(spark, ":query nope").get.startsWith("error: unknown query"))
  }

  test("loop: scripted session drives ingest-then-query end to end") {
    val dir = tmpDir("repl-loop")
    writeFile(dir, "d.json", """[{"a": "1"}, {"a": "2"}]""")
    graft.ingest.JsonIngestor.ingest(spark, dir.toString)
      .data.createOrReplaceTempView("ingested")
    val script = "SELECT COUNT(*) AS n FROM ingested\n:quit\n"
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val buf = new java.io.ByteArrayOutputStream()
    Repl.loop(spark, in, new java.io.PrintStream(buf, true, "UTF-8"))
    val out = buf.toString("UTF-8")
    assert(out.contains("n"))
    assert(out.contains("2"))
  }

  test("rows beyond the cap are truncated with a notice") {
    val df = spark.range(100).toDF("i")
    val out = Repl.render(df, maxRows = 10)
    assert(out.contains("truncated at 10 rows"))
  }
}
