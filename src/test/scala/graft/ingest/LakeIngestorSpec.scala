package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class LakeIngestorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("formats unify by NAME with typed NULL-fill for absent columns") {
    val dir = tmpDir("graft_lake")
    // jsonl leg carries all three columns; csv leg OMITS score — it
    // must land as a typed NULL double, not a parse error or a string
    writeFile(dir, "a.jsonl",
      """{"id": 1, "name": "one", "score": 1.5}
        |{"id": 2, "name": "two", "score": null}""".stripMargin)
    // the csv read applies the declared schema positionally, so a file
    // carrying a column PREFIX parses with the trailing columns null
    writeFile(dir, "b.csv", "id,name\n3,three\n")
    val out = LakeIngestor.ingestMixed(spark, dir.toString, schema)
    val rows = out.orderBy("id").collect()
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getDouble(2) == 1.5)
    assert(rows(1).isNullAt(2) && rows(2).isNullAt(2),
      "missing/omitted score must land as typed NULL")
  }

  test("an avro slice missing a declared column NULL-fills like every other leg") {
    val dir = tmpDir("graft_lake_avro")
    // avro slice written WITHOUT score: the projection must intersect
    // with the writer schema and conform() NULL-fill the rest (A12),
    // not fail readAvro's strict unknown-column check
    val twoCol = spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, "seven")),
      StructType(schema.fields.filter(_.name != "score")))
    AvroIngestor.writeAvro(twoCol.coalesce(1), dir.toString)
    val rows = LakeIngestor.ingestMixed(spark, dir.toString, schema)
      .orderBy("id").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 7L)
    assert(rows(0).isNullAt(2), "absent avro column must land as typed NULL")
  }

  test("an empty landing dir fails loudly, not as an empty table") {
    val dir = tmpDir("graft_lake_empty")
    writeFile(dir, "notes.txt", "not a lake file")
    val e = intercept[IllegalArgumentException] {
      LakeIngestor.ingestMixed(spark, dir.toString, schema)
    }
    assert(e.getMessage.contains("no supported lake files"))
  }
}
