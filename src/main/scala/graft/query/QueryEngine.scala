package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.JsonIngestor.FileError

/** The query-back surface (reference A16-A18, A20 and §2B): SQL
  * passthrough, previews, schema introspection, error summaries.
  *
  * The reference forwards arbitrary SQL to SQLite
  * (sqlite_connector.py:80-115); here the engine is Spark SQL itself —
  * parse/analyze/optimize/execute via Catalyst, which is the entire
  * point of the re-architecture.
  */
final class QueryEngine(spark: SparkSession) {

  /** A16: SQL passthrough. SELECTs return rows; DML/DDL run for their
    * effect and return an empty frame (the reference returns [] for
    * non-SELECT).
    */
  def execute(sql: String): DataFrame = spark.sql(sql)

  /** A16 parameterized variant (`WHERE col = ?` point lookups). */
  def execute(sql: String, args: Map[String, Any]): DataFrame = spark.sql(sql, args)

  /** A17: preview — first n rows of a table. */
  def preview(table: String, limit: Int = 10): DataFrame =
    spark.table(table).limit(limit)

  /** A18: schema introspection (PRAGMA table_info equivalent). */
  def describe(table: String): Seq[(String, String, Boolean)] =
    spark.table(table).schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString, f.nullable))

  /** A16: liveness. */
  def ping(): Boolean = spark.sql("SELECT 1").collect().head.getInt(0) == 1

  /** A20: error-log aggregation — count per error type, top-5 by count
    * desc (error_handler.py:47-95, the one aggregation the reference
    * computes itself). Error "type" = first token of the message.
    */
  def errorSummary(errors: Seq[FileError], topK: Int = 5): DataFrame = {
    import spark.implicits._
    errors.toDF("file", "error")
      .withColumn("error_type", split(col("error"), "[:\\s]").getItem(0))
      .groupBy("error_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("error_type"))
      .limit(topK)
  }
}
