package graft.app

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** End-to-end drive of the web preview surface over REAL HTTP — the
  * upload → process → schema/preview/sql flow the reference's
  * Streamlit app (app.py:41-261) offers, exercised with actual
  * sockets, not handler calls.
  */
class WebPreviewSpec extends SparkSpec {

  private def request(method: String, url: String,
      body: Option[Array[Byte]] = None): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b) finally os.close()
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val out = try new String(is.readAllBytes(), UTF_8) finally is.close()
    (code, out)
  }

  test("upload -> process -> schema/preview/sql over real HTTP") {
    val r = WebPreview.start(spark)
    val base = s"http://127.0.0.1:${r.port}"
    try {
      // index page is served
      val (ic, ihtml) = request("GET", s"$base/")
      assert(ic == 200 && ihtml.contains("graft preview"))
      // upload two files: a good one and one with a malformed record
      // mix (whole-file error isolation must report, not fail)
      val good = """[{"id": 1, "name": "ada"}, {"id": 2, "name": "bob"}]"""
      val bad = """{"id": oops not json"""
      val (u1, _) = request("POST", s"$base/upload?name=good.json",
        Some(good.getBytes(UTF_8)))
      val (u2, _) = request("POST", s"$base/upload?name=bad.json",
        Some(bad.getBytes(UTF_8)))
      assert(u1 == 200 && u2 == 200)
      // path traversal is rejected
      val (ut, _) = request("POST", s"$base/upload?name=..%2Fevil.json",
        Some("x".getBytes(UTF_8)))
      assert(ut == 400)
      // process into a managed table
      spark.sql("DROP TABLE IF EXISTS web_spec_tbl")
      val (pc, pjson) = request("POST", s"$base/process?table=web_spec_tbl")
      assert(pc == 200, pjson)
      assert(pjson.contains(""""files_processed":1""") &&
        pjson.contains(""""files_failed":1""") &&
        pjson.contains(""""records":2""") &&
        pjson.contains(""""inserted":2"""), pjson)
      // schema introspection (every §1.2-normalized column is a string)
      val (sc, sjson) = request("GET", s"$base/schema?table=web_spec_tbl")
      assert(sc == 200 && sjson.contains(""""name":"id"""") &&
        sjson.contains(""""type":"string""""), sjson)
      // bounded preview
      val (vc, vjson) = request("GET", s"$base/preview?table=web_spec_tbl&limit=1")
      assert(vc == 200 && vjson.contains(""""n":1"""), vjson)
      // SQL passthrough, preview-limited
      val (qc, qjson) = request("GET", s"$base/sql?q=" +
        java.net.URLEncoder.encode(
          "SELECT name FROM web_spec_tbl ORDER BY id", "UTF-8"))
      assert(qc == 200 && qjson.contains(""""n":2""") &&
        qjson.indexOf("ada") < qjson.indexOf("bob"), qjson)
      // bad identifiers / bad SQL surface as 400s with a JSON error
      assert(request("GET", s"$base/schema?table=no%3Bdrop")._1 == 400)
      assert(request("GET", s"$base/sql?q=SELEKT+1")._1 == 400)
    } finally {
      r.stop()
      spark.sql("DROP TABLE IF EXISTS web_spec_tbl")
    }
  }
}
