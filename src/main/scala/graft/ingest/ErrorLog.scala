package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.JsonIngestor.FileError

/** Persistent error log + summary-from-log (reference
  * src/handlers/error_handler.py:15-95: file-backed error log,
  * `get_error_summary` parsing it into total / per-type counts /
  * top-5 / first details, `export_error_log` to JSON).
  *
  * Spark-first re-expression: the log is an append-only DIRECTORY of
  * JSONL files — every `append` writes one new immutable file (atomic
  * on object stores, no appends to shared files, safe under concurrent
  * runs), and reading it back is an ordinary distributed
  * `spark.read.json` scan, so the summary is a DataFrame aggregation
  * that holds up when a 100 TB ingest leaves millions of error rows,
  * where the reference's line-by-line driver parse would not.
  */
final class ErrorLog(spark: SparkSession, dir: String) {

  private val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
  private val mapper = new ObjectMapper()

  /** Append one batch of errors as a new JSONL file. `errorType` is the
    * exception-class analogue in the reference's log format.
    */
  def append(errors: Seq[FileError], errorType: String = "IngestError"): Unit = {
    if (errors.isEmpty) return
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val lines = errors.map { e =>
      val node = mapper.createObjectNode()
      node.put("ts", ts)
      node.put("error_type", errorType)
      node.put("message", e.error)
      node.put("file", e.file)
      node.toString
    }
    val p = new Path(dir, s"errors-${java.util.UUID.randomUUID()}.jsonl")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Log one throwable (error_handler.py `log_error` shape). */
  def log(e: Throwable, file: Option[String] = None): Unit =
    append(Seq(FileError(file.getOrElse(""),
      Option(e.getMessage).getOrElse(e.getClass.getName))), e.getClass.getSimpleName)

  /** The log's fixed schema — passed to the reader explicitly so
    * numeric-looking messages aren't inferred as numbers and an
    * existing-but-empty directory reads as an empty frame instead of
    * failing schema inference.
    */
  private val logSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("error_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("message", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType)))

  /** The raw log as a DataFrame (empty-but-typed when nothing logged). */
  def read(): DataFrame = {
    val p = new Path(dir)
    if (!p.getFileSystem(conf).exists(p)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logSchema)
    } else spark.read.schema(logSchema).json(dir)
      .select("ts", "error_type", "message", "file")
  }

  /** Per-type counts, count desc (the reference's `error_types` +
    * `most_common_errors` in one frame).
    */
  def summaryDF(topK: Int = 5): DataFrame =
    read().groupBy("error_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("error_type"))
      .limit(topK)

  final case class Summary(totalErrors: Long, errorTypes: Map[String, Long],
      details: Seq[(String, String, String)])

  /** Driver-side summary mirroring get_error_summary's dict: total,
    * per-type counts, first `maxDetails` detail rows.
    */
  def summary(maxDetails: Int = 10): Summary = {
    val byType = read().groupBy("error_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val details = read().orderBy("ts", "file").limit(maxDetails).collect()
      .map(r => (r.getAs[String]("error_type"), r.getAs[String]("message"),
        r.getAs[String]("file"))).toSeq
    Summary(byType.values.sum, byType, details)
  }

  /** Export the summary as a JSON file (export_error_log). */
  def export(outFile: String): Unit = {
    val s = summary()
    val root = mapper.createObjectNode()
    root.put("total_errors", s.totalErrors)
    val types = root.putObject("error_types")
    s.errorTypes.toSeq.sortBy(-_._2).foreach { case (k, v) => types.put(k, v) }
    val det = root.putArray("error_details")
    s.details.foreach { case (t, m, f) =>
      val n = det.addObject(); n.put("type", t); n.put("message", m); n.put("file", f)
    }
    val p = new Path(outFile)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(root.toPrettyString.getBytes("UTF-8")) finally out.close()
  }
}
