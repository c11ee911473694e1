package graft.pg.server

import java.net.{HttpURLConnection, URI}

import scala.sys.process._

import graft.TestSpark

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e2e: the monitoring web UI serves live counters, sessions, and recent
  * statements after real psql traffic (reference UI pages,
  * MAIN/ui/SQLServerPage.scala).
  */
class WebUiSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var server: PgWireServer = _

  override def beforeAll(): Unit = {
    server = new PgWireServer(TestSpark.spark, port = 0,
      config = PgServerConfig(uiPort = Some(0)))
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  private def get(path: String): (Int, String) = {
    val c = new URI(s"http://127.0.0.1:${server.uiBoundPort}$path")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(5000)
    c.setReadTimeout(5000)
    val code = c.getResponseCode
    val in = if (code < 400) c.getInputStream else c.getErrorStream
    val body = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    (code, body)
  }

  private def psql(sql: String): String =
    Seq("psql", s"host=127.0.0.1 port=${server.boundPort} dbname=default user=graft",
      "-At", "-c", sql).!!.trim

  test("overview page reflects executed statements and live counters") {
    assert(psql("SELECT 7 AS ui_marker") === "7")
    val (code, html) = get("/")
    assert(code === 200)
    assert(html.contains("graft SQL server"))
    assert(html.contains("statements_run"))
    assert(html.contains("ui_marker"), "recent statements table shows the executed SQL")
    assert(html.contains("Finished"))
  }

  test("json endpoint exposes the same state machine-readably") {
    psql("SELECT 1")
    val (code, json) = get("/json")
    assert(code === 200)
    assert(json.contains("\"statements_run\":"))
    assert(json.contains("\"state\":\"Finished\""))
    // counters are live: statements_run grows with traffic
    val before = "\"statements_run\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toLong
    psql("SELECT 2")
    val (_, json2) = get("/json")
    val after = "\"statements_run\":(\\d+)".r.findFirstMatchIn(json2).get.group(1).toLong
    assert(after > before)
  }

  test("unknown path is a 404, not a crash") {
    val (code, _) = get("/nope")
    assert(code === 404)
  }
}
