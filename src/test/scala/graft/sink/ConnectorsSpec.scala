package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  test("factory: unknown type lists supported; normalization; extension point") {
    val e = intercept[ConnectorError](Connectors.create("mongodb"))
    assert(e.getMessage.contains("not supported"))
    Connectors.supported.foreach(s => assert(e.getMessage.contains(s)))
    // normalized lookup (connector_factory.py lower/strip semantics)
    Connectors.create("  Parquet ")
    // runtime registration
    Connectors.register("null_sink", _ => new Connector {
      def write(df: org.apache.spark.sql.DataFrame, target: String, mode: SaveMode): Long =
        df.count()
      def read(s: org.apache.spark.sql.SparkSession, target: String) = s.emptyDataFrame
    })
    assert(Connectors.create("null_sink").write(sample, "ignored") == 3L)
  }

  test("SaveMode.Ignore is rejected (a skipped write would deadlock the count)") {
    val e = intercept[IllegalArgumentException](
      Connectors.create("parquet").write(sample, tmpDir("ig").toString, SaveMode.Ignore))
    assert(e.getMessage.contains("Ignore"))
  }

  test("parquet connector roundtrip with written-count") {
    val dir = tmpDir("conn-pq").resolve("out").toString
    val c = Connectors.create("parquet")
    assert(c.write(sample, dir, SaveMode.Overwrite) == 3L)
    assert(c.read(spark, dir).count() == 3L)
  }

  test("table connector roundtrip") {
    val c = Connectors.create("table")
    c.write(sample, "conn_t1", SaveMode.Overwrite)
    assert(c.read(spark, "conn_t1").count() == 3L)
    assert(c.write(sample, "conn_t1") == 3L) // append = insert-into-existing
    assert(c.read(spark, "conn_t1").count() == 6L)
  }

  test("bucketed connector requires params and produces a bucketed table") {
    intercept[ConnectorError](Connectors.create("bucketed"))
    val c = Connectors.create("bucketed", Map("bucketCols" -> "k", "numBuckets" -> "4"))
    c.write(sample, "conn_b1", SaveMode.Overwrite)
    assert(c.read(spark, "conn_b1").count() == 3L)
  }

  test("jdbc connector writes and reads back through Derby") {
    val db = tmpDir("conn-derby").resolve("db").toString
    val c = Connectors.create("jdbc", Map("url" -> s"jdbc:derby:$db;create=true"))
    assert(c.write(sample, "conn_j1", SaveMode.Overwrite) == 3L)
    val back = c.read(spark, "conn_j1").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
