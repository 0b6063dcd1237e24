package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.query.QueryEngine

/** Interactive query frontend — the CLI analogue of the reference's
  * second entry point (reference app.py:41-261, a Streamlit
  * upload→process→query→schema UI; re-expressed as a terminal REPL
  * since the engine targets clusters, not a web runtime).
  *
  * Commands (everything else is executed as Spark SQL through
  * [[QueryEngine]]'s passthrough):
  *
  *   :tables            list catalog tables
  *   :schema <table>    column/type/nullable introspection (A18)
  *   :preview <table> [n]  first n rows (A17)
  *   :queries           list every declared operator query (Registry)
  *   :query <name> [sfDir]  run a declared query over an sf dataset
  *   :quit / :exit      leave
  */
object Repl {

  private val MaxRows = 50

  /** Render a DataFrame as an aligned text table (driver-side, capped
    * at [[MaxRows]] — a preview surface, not an export path).
    */
  def render(df: DataFrame, maxRows: Int = MaxRows): String = {
    val cols = df.columns
    if (cols.isEmpty) return "(ok)"
    val rows = df.limit(maxRows + 1).collect()
    val shown = rows.take(maxRows)
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
    val widths = cols.indices.map(i =>
      (cols(i).length +: shown.map(_(i).length)).max)
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
    val sep = widths.map("-" * _).mkString("-+-")
    val body = (line(cols.toSeq) +: sep +: shown.map(r => line(r.toSeq))).mkString("\n")
    if (rows.length > maxRows) s"$body\n... (truncated at $maxRows rows)" else body
  }

  /** Evaluate one input line. Returns None to quit, otherwise the
    * rendered response (errors render as `error: ...` — the loop never
    * dies on a bad query, the reference UI's error-banner behavior).
    */
  def eval(spark: SparkSession, line: String): Option[String] = {
    val qe = new QueryEngine(spark)
    val trimmed = line.trim
    if (trimmed.isEmpty) return Some("")
    try {
      trimmed.split("\\s+").toList match {
        case (":quit" | ":exit") :: _ => None
        case ":tables" :: _ =>
          Some(spark.catalog.listTables().collect()
            .map(t => s"${t.name}\t${t.tableType}").sorted.mkString("\n"))
        case ":schema" :: t :: _ =>
          Some(qe.describe(t)
            .map { case (n, dt, nullable) =>
              s"$n\t$dt\t${if (nullable) "nullable" else "not null"}" }
            .mkString("\n"))
        case ":preview" :: t :: rest =>
          // user-supplied n is capped: preview is a driver-side surface
          val n = math.min(rest.headOption.map(_.toInt).getOrElse(10), MaxRows)
          Some(render(qe.preview(t, n), n))
        case ":queries" :: _ =>
          Some(graft.Registry.all.map(_.name).sorted.mkString("\n"))
        case ":query" :: name :: rest =>
          val dir = rest.headOption.getOrElse("/root/testdata/sf0.001")
          graft.Registry.byName.get(name) match {
            case Some(d) => Some(render(d.run(spark, dir)))
            case None => Some(s"error: unknown query $name (see :queries)")
          }
        case cmd :: _ if cmd.startsWith(":") => Some(s"error: unknown command $cmd")
        case _ => Some(render(qe.execute(trimmed)))
      }
    } catch {
      case e: Exception =>
        Some(s"error: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator
          .take(3).mkString(" ").take(400)}")
    }
  }

  /** stdin/stdout loop until EOF or :quit. */
  def loop(spark: SparkSession,
      in: java.io.BufferedReader =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
      out: java.io.PrintStream = System.out): Unit = {
    out.println("graft> enter SQL, :tables, :schema <t>, :preview <t> [n], " +
      ":queries, :query <name> [sfDir], :quit")
    var continue = true
    while (continue) {
      out.print("graft> ")
      out.flush()
      val line = in.readLine()
      if (line == null) continue = false
      else eval(spark, line) match {
        case None => continue = false
        case Some(resp) => if (resp.nonEmpty) out.println(resp)
      }
    }
  }
}
