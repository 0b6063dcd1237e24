package graft
import graft.ingest.JsonIngestor
import graft.query.QueryEngine

/** Scratch driver for manual end-to-end runs (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("probe")
    java.nio.file.Files.writeString(dir.resolve("customers.json"),
      """[{"id": "C1", "name": "Ann", "prefs": {"theme": "dark"}}, {"id": "C2", "tags": ["a","b"], "note": null}]""")
    java.nio.file.Files.writeString(dir.resolve("orders.json"),
      """{"order": "O1", "id": "C1", "amount": 10.5}""")
    java.nio.file.Files.writeString(dir.resolve("broken.json"), """[{"x": 1""")
    for (mode <- Seq("exact", "bulk")) {
      val r = if (mode == "exact") JsonIngestor.ingest(spark, dir.toString)
              else JsonIngestor.ingestBulk(spark, dir.toString)
      println(s"== $mode: discovered=${r.report.filesDiscovered} ok=${r.report.filesProcessed} " +
        s"failed=${r.report.filesFailed} records=${r.report.totalRecords} rps=${r.report.throughputRps.toInt}")
      r.data.show(10, false)
      r.data.createOrReplaceTempView(s"ingested_$mode")
      val qe = new QueryEngine(spark)
      qe.execute(s"SELECT id, name FROM ingested_$mode WHERE id = 'C1'").show(false)
      println(qe.describe(s"ingested_$mode").mkString(", "))
      qe.errorSummary(r.report.errors).show(false)
    }
    spark.stop()
  }
}
