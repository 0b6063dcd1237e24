package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroIngestorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("blob", BinaryType)))

  private def sample = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, null, Array[Byte]())),
    schema)

  test("roundtrip preserves every primitive type including NULLs") {
    val dir = tmpDir("graft_avro_rt").toString
    AvroIngestor.writeAvro(sample.repartition(2), dir)
    val back = AvroIngestor.readAvro(spark, dir).drop("_source_file")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.orderBy("id").collect()
    val want = sample.orderBy("id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getAs[String](1) == w.getAs[String](1))
      assert(g.getAs[Any](2) == w.getAs[Any](2))
      assert(g.getAs[Any](3) == w.getAs[Any](3))
      val (gb, wb) = (g.getAs[Array[Byte]](4), w.getAs[Array[Byte]](4))
      assert((gb == null && wb == null) || gb.toSeq == wb.toSeq)
    }
  }

  test("column projection builds a reader schema; lineage names the part file") {
    val dir = tmpDir("graft_avro_proj").toString
    AvroIngestor.writeAvro(sample.coalesce(1), dir)
    val back = AvroIngestor.readAvro(spark, dir, columns = Seq("name", "id"))
    // projected columns in the requested order, plus lineage
    assert(back.columns.toSeq == Seq("name", "id", "_source_file"))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("_source_file")).toSet == Set("part-00000.avro"))
    assert(rows.map(r => Option(r.getAs[String]("name"))).toSeq ==
      Seq(Some("alpha"), None, Some("gamma")))
    // a column absent from the writer schema fails loudly, not silently
    val e = intercept[IllegalArgumentException] {
      AvroIngestor.readAvro(spark, dir, columns = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("writeAvro over a reused dir replaces stale parts (driver pre-clean)") {
    val dir = tmpDir("graft_avro_ow").toString
    // first job writes 2 part files; second writes 1 — the stale
    // part-00001 from job 1 must NOT survive into the re-read
    AvroIngestor.writeAvro(sample.repartition(2), dir)
    AvroIngestor.writeAvro(sample.coalesce(1), dir)
    val back = AvroIngestor.readAvro(spark, dir)
    assert(back.select("_source_file").distinct().collect()
      .map(_.getString(0)).toSet == Set("part-00000.avro"))
    assert(back.count() == 3L)
  }

  test("Some(Nil) projects NOTHING (row count kept, zero fields decoded)") {
    val dir = tmpDir("graft_avro_none").toString
    AvroIngestor.writeAvro(sample.coalesce(1), dir)
    val files = FileScanner.discover(dir, fileTypes = Seq("avro"),
      hadoopConf = spark.sessionState.newHadoopConf())("avro")
    // the LakeIngestor empty-intersection contract: project-nothing is
    // distinct from no-projection — rows come back lineage-only, one
    // per record, never a silent full-schema decode
    val none = AvroIngestor.readAvroFiles(spark, files, columns = Some(Nil))
    assert(none.columns.toSeq == Seq("_source_file"))
    assert(none.count() == 3L)
    val all = AvroIngestor.readAvroFiles(spark, files, columns = None)
    assert(all.columns.toSeq == schema.fieldNames.toSeq :+ "_source_file")
    assert(all.count() == 3L)
  }

  test("writerSchema reads the embedded header; classifier dispatches .avro/.orc") {
    val dir = tmpDir("graft_avro_schema").toString
    AvroIngestor.writeAvro(sample.coalesce(1), dir)
    val ws = AvroIngestor.writerSchema(spark, s"$dir/part-00000.avro")
    assert(AvroIngestor.toSparkSchema(ws).fieldNames.toSeq ==
      Seq("id", "name", "score", "flag", "blob"))
    assert(FileScanner.classify("landed.avro").contains("avro"))
    assert(FileScanner.classify("LANDED.AVRO").contains("avro"))
    assert(FileScanner.classify("stripe.orc").contains("orc"))
  }

  test("discover picks up .avro files under ignore/include rules") {
    val dir = tmpDir("graft_avro_disc")
    AvroIngestor.writeAvro(sample.coalesce(1), dir.toString)
    writeFile(dir, ".hidden.avro", "not a container")
    val d = FileScanner.discover(dir.toString, fileTypes = Seq("avro"),
      hadoopConf = spark.sessionState.newHadoopConf())
    assert(d("avro").map(_.split('/').last) == Seq("part-00000.avro"),
      "dot-files must be ignored; the real container must be found")
  }
}
