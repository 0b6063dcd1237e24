package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV/Parquet ingestion for the formats the reference's classifier
  * recognizes but never processes (reference file_scanner.py:15-30
  * maps .csv/.tsv/.psv and .parquet/.pq/.pqt; application.py:60 only
  * ever requests json — this completes the declared surface).
  *
  * Same pipeline contract as JSON: discovery with pattern filters,
  * TEXT normalization, `_source_file` lineage, alphabetically sorted
  * columns. Delimiter is inferred from the extension (.tsv → tab,
  * .psv → pipe). Single distributed scan per format group.
  */
object TabularIngestor {

  private def basenameCol = element_at(split(input_file_name(), "/"), -1)

  private def delimiterFor(ext: String): String = ext match {
    case "tsv" => "\t"
    case "psv" => "|"
    case _ => ","
  }

  private def extOf(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    name.substring(name.lastIndexOf('.') + 1).toLowerCase
  }

  def ingestCsv(spark: SparkSession, dir: String,
      includePatterns: Seq[String] = Nil,
      excludePatterns: Seq[String] = FileScanner.DefaultIgnorePatterns,
      header: Boolean = true): JsonIngestor.IngestResult = {
    val t0 = System.nanoTime()
    val files = FileScanner.discover(dir, Seq("csv"), recursive = true,
      includePatterns, excludePatterns, spark.sparkContext.hadoopConfiguration)("csv")
    if (files.isEmpty)
      return JsonIngestor.IngestResult(spark.emptyDataFrame,
        JsonIngestor.IngestReport(0, 0, 0, 0L, Nil, (System.nanoTime() - t0) / 1e9))
    // one scan per delimiter group (a delimiter is a reader option, not
    // per-file state)
    val groups = files.groupBy(f => delimiterFor(extOf(f)))
    val parts = groups.map { case (delim, fs) =>
      val df = spark.read
        .option("header", header.toString)
        .option("sep", delim)
        .option("mode", "PERMISSIVE")
        .csv(fs: _*)
        .withColumn("_source_file", basenameCol)
      Normalizer.normalizeAll(df, passthrough = Set("_source_file"))
    }.toSeq
    val data0 = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val data = data0.select(data0.columns.sorted.map(col).toSeq: _*)
    val total = data.count()
    JsonIngestor.IngestResult(data, JsonIngestor.IngestReport(
      files.size, files.size, 0, total, Nil, (System.nanoTime() - t0) / 1e9))
  }

  def ingestParquet(spark: SparkSession, dir: String,
      includePatterns: Seq[String] = Nil,
      excludePatterns: Seq[String] = FileScanner.DefaultIgnorePatterns,
      normalizeText: Boolean = false): JsonIngestor.IngestResult = {
    val t0 = System.nanoTime()
    val files = FileScanner.discover(dir, Seq("parquet"), recursive = true,
      includePatterns, excludePatterns, spark.sparkContext.hadoopConfiguration)("parquet")
    if (files.isEmpty)
      return JsonIngestor.IngestResult(spark.emptyDataFrame,
        JsonIngestor.IngestReport(0, 0, 0, 0L, Nil, (System.nanoTime() - t0) / 1e9))
    val raw = spark.read.option("mergeSchema", "true").parquet(files: _*)
      .withColumn("_source_file", basenameCol)
    // parquet is already typed: TEXT normalization only on request
    // (fidelity mode); default keeps native types for query performance
    val df = if (normalizeText) Normalizer.normalizeAll(raw, passthrough = Set("_source_file"))
             else raw
    val data = df.select(df.columns.sorted.map(col).toSeq: _*)
    val total = data.count()
    JsonIngestor.IngestResult(data, JsonIngestor.IngestReport(
      files.size, files.size, 0, total, Nil, (System.nanoTime() - t0) / 1e9))
  }
}
