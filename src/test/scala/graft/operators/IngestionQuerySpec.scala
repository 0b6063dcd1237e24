package graft.operators

import graft.SparkSpec

/** Pins the ingestion-path oracle queries (ing01-ing03) over the
  * checked-in fixtures — the ScalaTest twin of the DuckDB gate rows.
  */
class IngestionQuerySpec extends SparkSpec {

  private def run(name: String) =
    graft.Registry.byName(name).run(spark, sf0001)

  test("ing01 normalizes nested/array/null/empty to the TEXT contract") {
    val rows = run("ing01_normalize").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getAs[String]("customer") == """{"city":"Dunwich","name":"Ada Quarry"}""")
    assert(r1.getAs[String]("items").startsWith("""[{"price":949.99,"product":"Drafting table""""))
    assert(r1.getAs[String]("notes") == "") // JSON null -> ''
    assert(r1.getAs[String]("priority") == "5")
    assert(r1.getAs[String]("vip") == "true")
    val r2 = rows(1)
    assert(r2.getAs[String]("items") == "") // empty array -> ''
    assert(r2.getAs[String]("tags") == "")
    assert(r2.getAs[String]("total") == "0.5")
  }

  test("ing02 unions heterogeneous files: missing key NULL, null value ''") {
    val rows = run("ing02_union_nullfill").collect()
    assert(rows.length == 4)
    val cust = rows.filter(_.getAs[String]("_source_file") == "customers.json")
    assert(cust.length == 3)
    // key absent from customers.json entirely -> SQL NULL
    assert(cust.forall(_.isNullAt(cust.head.fieldIndex("user_id"))))
    val prof = rows.filter(_.getAs[String]("_source_file") == "profile.json").head
    assert(prof.getAs[String]("bio") == "") // present-but-null -> ''
    assert(prof.getAs[String]("score") == "87")
    assert(prof.isNullAt(prof.fieldIndex("customer_id")))
  }

  test("ing04 bulk mode drops malformed files wholesale, unifies the rest") {
    val rows = run("ing04_bulk_ingest").collect()
    assert(rows.length == 6) // 3 + 2 + 1 records; both bad files contribute 0
    val srcs = rows.map(_.getAs[String]("_source_file")).distinct.sorted
    assert(srcs.toSeq == Seq("customers.json", "nested.json", "profile.json"))
    // bulk normalizes after union: absent keys are '', not NULL
    assert(rows.forall(!_.anyNull))
  }

  test("ing05 sink roundtrip preserves every byte") {
    val direct = run("ing02_union_nullfill").collect().map(_.toSeq)
    val viaSink = run("ing05_sink_roundtrip").collect().map(_.toSeq)
    assert(viaSink.toSeq == direct.toSeq)
  }

  test("ing03 isolates malformed files and keeps good ones") {
    val rows = run("ing03_error_isolation").collect()
      .map(r => r.getAs[String]("file") -> r.getAs[Long]("n")).toMap
    assert(rows == Map(
      "__files_failed__" -> 2L,
      "customers.json" -> 3L,
      "nested.json" -> 2L,
      "profile.json" -> 1L))
  }

  test("ing13 drift report: statuses reflect the two batches' key sets") {
    val rows = run("ing13_schema_drift").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // customers.json-only keys read as removed, profile.json-only as added
    assert(rows("customer_id") == "removed")
    assert(rows("status") == "removed")
    assert(rows("user_id") == "added")
    assert(rows("bio") == "added")
    assert(!rows.contains("_source_file"), "lineage meta-column is not drift")
    assert(rows.values.toSet.subsetOf(Set("added", "removed", "common")))
  }

  test("resumeJsonlBackfill: file-granular skip, idempotent re-run") {
    val dir = tmpDir("graft_resume")
    val table = "resume_spec_landed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
    writeFile(dir, "a.jsonl", """{"id":"1","v":"x"}""" + "\n" + """{"id":"2","v":"y"}""" + "\n")
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 2L)
    // new file appears: only its rows land
    writeFile(dir, "b.jsonl", """{"id":"3","v":"z"}""" + "\n")
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 1L)
    // nothing new: no-op
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 0L)
    // the skip is FILE-granular by contract: mutating an already-landed
    // file does not re-process it (lineage says the file is done)
    writeFile(dir, "a.jsonl", """{"id":"1","v":"x"}""" + "\n" + """{"id":"9","v":"late"}""" + "\n")
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 0L)
    val landed = spark.table(table).select("id").collect().map(_.getString(0)).toSet
    assert(landed == Set("1", "2", "3"), landed.toString)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
  }

  test("resumeJsonlBackfill: skip decision scales past a toy manifest") {
    val dir = tmpDir("graft_resume_big")
    val table = "resume_big_landed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
    writeFile(dir, "a.jsonl", """{"id":"1","v":"x"}""" + "\n")
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 1L)
    // grow the manifest to 20k rows (a year of hourly landings): the
    // anti-join skip must keep working — and only the pending file may
    // land — without the manifest ever being collected
    import org.apache.spark.sql.functions.{col, concat, lit}
    val filler = spark.range(20000)
      .select(concat(lit("hist_"), col("id"), lit(".jsonl")).as("file"))
    graft.sink.Sinks.saveTable(filler, s"${table}_manifest")
    writeFile(dir, "b.jsonl", """{"id":"2","v":"y"}""" + "\n")
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 1L)
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 0L)
    val landed = spark.table(table).select("id").collect().map(_.getString(0)).toSet
    assert(landed == Set("1", "2"), landed.toString)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
  }

  test("resumeJsonlBackfill: a partially-committed file is replayed, not skipped") {
    val dir = tmpDir("graft_resume_partial")
    val table = "resume_partial_landed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
    writeFile(dir, "a.jsonl", """{"id":"1","v":"x"}""" + "\n" + """{"id":"2","v":"y"}""" + "\n")
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 2L)
    // simulate a crashed run whose append became PARTIALLY visible:
    // one row of b.jsonl is in the table, but b.jsonl never reached
    // the completion manifest (the manifest write is ordered after the
    // data commit, so this is exactly the crash-window state)
    writeFile(dir, "b.jsonl", """{"id":"3","v":"z"}""" + "\n" + """{"id":"4","v":"w"}""" + "\n")
    import spark.implicits._
    val partial = Seq(("z", "3", "b.jsonl")).toDF("v", "id", "_source_file")
      .select(spark.table(table).columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    graft.sink.Sinks.saveTable(partial, table)
    // a lineage-based skip would see b.jsonl "landed" and lose id=4;
    // the manifest-based resume replays it and the upsert drops the dup
    assert(Ingestion.resumeJsonlBackfill(spark, dir.toString, table, Seq("id")) == 1L)
    val landed = spark.table(table).select("id").collect().map(_.getString(0)).sorted
    assert(landed.toSeq == Seq("1", "2", "3", "4"), landed.mkString(","))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_manifest")
  }

  test("writeAuditPublish: bad batch rejected, staging cleaned, published intact") {
    import spark.implicits._
    val table = "wap_spec_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_staging")
    val good = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Ingestion.writeAuditPublish(spark, good, table, "id"))
    assert(spark.table(table).count() == 2)
    // duplicate keys fail the audit; published content untouched
    val dup = Seq((1L, "x"), (1L, "y")).toDF("id", "v")
    assert(!Ingestion.writeAuditPublish(spark, dup, table, "id"))
    assert(spark.table(table).orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    // staging must not linger after a rejection
    assert(!graft.sink.Sinks.tableExists(spark, table + "_staging"))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("writeAuditPublish: recovers a crash-orphaned _retired copy on entry") {
    import spark.implicits._
    val table = "wap_recover_tbl"
    Seq(table, s"${table}_retired", s"${table}_staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // simulate the crash window: live table parked under _retired,
    // staging already gone, published name missing
    graft.sink.Sinks.saveTable(Seq((1L, "old")).toDF("id", "v"), s"${table}_retired")
    // next publish must first restore the retired copy (readers see the
    // old version if THIS audit fails), then swap in the new batch
    assert(Ingestion.writeAuditPublish(spark, Seq((2L, "new")).toDF("id", "v"), table, "id"))
    assert(spark.table(table).collect().map(_.getString(1)).toSeq == Seq("new"))
    assert(!graft.sink.Sinks.tableExists(spark, s"${table}_retired"))
    // and a failing publish after recovery leaves the restored old copy live
    Seq(table, s"${table}_retired").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.sink.Sinks.saveTable(Seq((1L, "old")).toDF("id", "v"), s"${table}_retired")
    val dup = Seq((1L, "x"), (1L, "y")).toDF("id", "v")
    assert(!Ingestion.writeAuditPublish(spark, dup, table, "id"))
    assert(spark.table(table).collect().map(_.getString(1)).toSeq == Seq("old"))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
