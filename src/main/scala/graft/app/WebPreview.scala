package graft.app

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.JsonIngestor
import graft.query.QueryEngine
import graft.sink.Sinks

/** Minimal web frontend — the analog of the reference's Streamlit app
  * (app.py:41-261: upload JSON files → process into a table → metrics,
  * schema view, LIMIT-100 preview, SQL query), re-expressed as a plain
  * HTTP/JSON surface on the JDK's built-in server (zero new
  * dependencies; a real deployment would front a long-lived
  * SparkSession the same way, whatever the HTTP framework).
  *
  * Surface (all JSON unless noted):
  *  - `GET  /`                          tiny HTML index (the "UI")
  *  - `POST /upload?name=f.json`        body = file bytes → session upload dir
  *  - `POST /process?table=t[&mode=bulk]` ingest upload dir → managed table;
  *     returns the run metrics (files/records/throughput — the
  *     render_results metric row)
  *  - `GET  /schema?table=t`            column name/type list (PRAGMA analog)
  *  - `GET  /preview?table=t&limit=100` LIMIT preview rows
  *  - `GET  /sql?q=SELECT...&limit=100` passthrough query, preview-limited
  *
  * Scale/safety notes: every row-returning endpoint is LIMIT-bounded
  * (cap 1000) before collect — the driver never materializes an
  * unbounded result; identifiers are validated against a strict
  * pattern rather than spliced raw; the server binds loopback only.
  */
object WebPreview {

  final case class Running(server: HttpServer, uploadDir: java.nio.file.Path) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r
  private val MaxLimit = 1000

  def start(spark: SparkSession, port: Int = 0): Running = {
    val uploadDir = java.nio.file.Files.createTempDirectory("graft_web_upload")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val qe = new QueryEngine(spark)

    def handle(ex: HttpExchange)(body: => (Int, String, String)): Unit = {
      val (code, ctype, payload) =
        try body
        catch {
          case e: Throwable =>
            (400, "application/json",
              s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
        }
      val bytes = payload.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", s"$ctype; charset=utf-8")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

    def params(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&').toSeq
        .filter(_.nonEmpty).flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) =>
              Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
            case _ => None
          }
        }.toMap

    def ident(m: Map[String, String], key: String): String = {
      val v = m.getOrElse(key, sys.error(s"missing ?$key="))
      require(Ident.matches(v), s"invalid identifier '$v'")
      v
    }

    def boundedLimit(m: Map[String, String]): Int =
      math.min(m.get("limit").map(_.toInt).getOrElse(100), MaxLimit)

    def rowsJson(df: DataFrame, limit: Int): String = {
      // Spark's own row-to-JSON keeps escaping/typing consistent with
      // the ingestion contract; the LIMIT runs in the PLAN, so the
      // collect is bounded before any driver materialization
      val rows = df.limit(limit).toJSON.collect()
      s"""{"n":${rows.length},"rows":[${rows.mkString(",")}]}"""
    }

    server.createContext("/", (ex: HttpExchange) => handle(ex) {
      (200, "text/html",
        """<html><body><h1>graft preview</h1>
          |<p>POST /upload?name=f.json &middot; POST /process?table=t
          | &middot; GET /schema?table=t &middot; GET /preview?table=t&amp;limit=100
          | &middot; GET /sql?q=SELECT...</p></body></html>""".stripMargin)
    })

    server.createContext("/upload", (ex: HttpExchange) => handle(ex) {
      require(ex.getRequestMethod == "POST", "POST required")
      val name = params(ex).getOrElse("name", sys.error("missing ?name="))
      // basename only: an uploaded name must not traverse out of the dir
      require(!name.contains('/') && !name.contains('\\') && name.nonEmpty,
        s"invalid file name '$name'")
      val dst = uploadDir.resolve(name)
      val in = ex.getRequestBody
      try java.nio.file.Files.copy(in, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      (200, "application/json",
        s"""{"file":${jstr(name)},"bytes":${java.nio.file.Files.size(dst)}}""")
    })

    server.createContext("/process", (ex: HttpExchange) => handle(ex) {
      require(ex.getRequestMethod == "POST", "POST required")
      val m = params(ex)
      val table = ident(m, "table")
      val res =
        if (m.get("mode").contains("bulk"))
          JsonIngestor.ingestBulk(spark, uploadDir.toString)
        else JsonIngestor.ingest(spark, uploadDir.toString)
      val landed =
        if (res.data.columns.nonEmpty) Sinks.saveTable(res.data, table) else 0L
      val r = res.report
      (200, "application/json",
        s"""{"table":${jstr(table)},"files_discovered":${r.filesDiscovered},""" +
          s""""files_processed":${r.filesProcessed},"files_failed":${r.filesFailed},""" +
          s""""records":${r.totalRecords},"inserted":$landed,""" +
          f""""throughput_rps":${r.throughputRps}%.0f,""" +
          s""""errors":[${r.errors.take(5).map(e =>
            s"""{"file":${jstr(e.file)},"error":${jstr(e.error.take(200))}}""").mkString(",")}]}""")
    })

    server.createContext("/schema", (ex: HttpExchange) => handle(ex) {
      val table = ident(params(ex), "table")
      val cols = spark.table(table).schema.fields.map(f =>
        s"""{"name":${jstr(f.name)},"type":${jstr(f.dataType.simpleString)},"nullable":${f.nullable}}""")
      (200, "application/json", s"""{"table":${jstr(table)},"columns":[${cols.mkString(",")}]}""")
    })

    server.createContext("/preview", (ex: HttpExchange) => handle(ex) {
      val m = params(ex)
      (200, "application/json", rowsJson(spark.table(ident(m, "table")), boundedLimit(m)))
    })

    server.createContext("/sql", (ex: HttpExchange) => handle(ex) {
      val m = params(ex)
      val q = m.getOrElse("q", sys.error("missing ?q="))
      (200, "application/json", rowsJson(qe.execute(q), boundedLimit(m)))
    })

    server.start()
    Running(server, uploadDir)
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Standalone entry: `graft.app.WebPreview [port]` (default 8080). */
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val r = start(spark, args.headOption.map(_.toInt).getOrElse(8080))
    println(s"graft web preview listening on http://127.0.0.1:${r.port}/")
    Thread.currentThread().join()
  }
}
