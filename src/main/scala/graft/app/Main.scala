package graft.app

import graft.GraftSession
import graft.ingest.{JsonIngestor, TabularIngestor}
import graft.query.QueryEngine
import graft.sink.Sinks

/** CLI frontend (reference main.py:24-104 argument surface):
  *
  * {{{
  * graft.app.Main <input-dir> [--output <path>] [--table <name>]
  *   [--format json|csv|parquet] [--mode exact|bulk]
  *   [--include <glob>]... [--exclude <glob>]... [--preview N] [--quiet]
  * }}}
  *
  * Ingests the directory, writes the normalized table (parquet path or
  * managed table), prints the run report (files ok/failed, records,
  * throughput — application.py:125-142's metrics dict) and a preview.
  */
object Main {

  final case class Config(
      inputDir: String = "",
      output: Option[String] = None,
      table: Option[String] = None,
      format: String = "json",
      mode: String = "exact",
      include: Seq[String] = Nil,
      exclude: Seq[String] = graft.ingest.FileScanner.DefaultIgnorePatterns,
      preview: Int = 10,
      quiet: Boolean = false,
      repl: Boolean = false,
  )

  def parse(args: List[String], c: Config = Config()): Either[String, Config] = args match {
    case Nil if c.inputDir.isEmpty => Left("missing <input-dir>")
    case Nil => Right(c)
    case "--output" :: v :: rest => parse(rest, c.copy(output = Some(v)))
    case "--table" :: v :: rest => parse(rest, c.copy(table = Some(v)))
    case "--format" :: v :: rest =>
      if (Set("json", "csv", "parquet")(v)) parse(rest, c.copy(format = v))
      else Left(s"invalid --format '$v' (expected json|csv|parquet)")
    case "--mode" :: v :: rest =>
      if (Set("exact", "bulk")(v)) parse(rest, c.copy(mode = v))
      else Left(s"invalid --mode '$v' (expected exact|bulk)")
    case "--include" :: v :: rest => parse(rest, c.copy(include = c.include :+ v))
    case "--exclude" :: v :: rest => parse(rest, c.copy(exclude = c.exclude :+ v))
    case "--preview" :: v :: rest => parse(rest, c.copy(preview = v.toInt))
    case "--quiet" :: rest => parse(rest, c.copy(quiet = true))
    case "--repl" :: rest => parse(rest, c.copy(repl = true))
    case dir :: rest if !dir.startsWith("--") && c.inputDir.isEmpty =>
      parse(rest, c.copy(inputDir = dir))
    case other :: _ => Left(s"unknown argument: $other")
  }

  def main(args: Array[String]): Unit = {
    parse(args.toList) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        System.err.println(
          "usage: graft.app.Main <input-dir> [--output <path>] [--table <name>] " +
            "[--format json|csv|parquet] [--mode exact|bulk] [--include g]... " +
            "[--exclude g]... [--preview N] [--quiet] [--repl]")
        sys.exit(2)
      case Right(c) => run(c)
    }
  }

  private def run(c: Config): Unit = {
    val spark = GraftSession.getOrCreate()
    try {
      val result = c.format match {
        case "json" if c.mode == "bulk" =>
          JsonIngestor.ingestBulk(spark, c.inputDir, c.include, c.exclude)
        case "json" => JsonIngestor.ingest(spark, c.inputDir, c.include, c.exclude)
        case "csv" => TabularIngestor.ingestCsv(spark, c.inputDir, c.include, c.exclude)
        case "parquet" => TabularIngestor.ingestParquet(spark, c.inputDir, c.include, c.exclude)
      }
      val r = result.report
      if (!c.quiet) {
        println(s"files discovered : ${r.filesDiscovered}")
        println(s"files processed  : ${r.filesProcessed}")
        println(s"files failed     : ${r.filesFailed}")
        println(s"records          : ${r.totalRecords}")
        println(f"elapsed          : ${r.elapsedSec}%.2f s")
        println(f"throughput       : ${r.throughputRps}%.0f records/s")
        r.errors.take(5).foreach(e => println(s"  error: ${e.file}: ${e.error.take(120)}"))
      }
      if (result.data.columns.nonEmpty) {
        c.output.foreach { p => Sinks.saveParquet(result.data, p) }
        c.table.foreach { t => Sinks.saveTable(result.data, t) }
        result.data.createOrReplaceTempView("ingested")
        if (!c.quiet && c.preview > 0) {
          val qe = new QueryEngine(spark)
          qe.execute(s"SELECT * FROM ingested LIMIT ${c.preview}").show(truncate = false)
        }
        // interactive query loop over the just-ingested view (the
        // reference's upload -> process -> query flow, app.py:41-261)
        if (c.repl) Repl.loop(spark)
      }
      if (r.filesFailed > 0 && r.filesProcessed == 0) sys.exit(1)
    } finally spark.stop()
  }
}
