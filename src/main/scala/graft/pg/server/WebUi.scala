package graft.pg.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Monitoring web UI for the wire server (the reference's two-page UI,
  * `MAIN/ui/SQLServerPage.scala` + `SQLServerSessionPage.scala`, rebuilt on
  * the JDK's built-in HTTP server — no extra dependency, read-only, served
  * off a single daemon thread):
  *
  *   - `GET /`     — HTML overview: uptime, counters, live sessions, the
  *                   last 100 statements with state and duration
  *   - `GET /json` — the same as machine-readable JSON
  *
  * Pass port 0 for an ephemeral port (tests); `boundPort` reports it.
  */
final class GraftWebUi(port: Int) {
  @volatile private var server: HttpServer = _

  /** Bound port after start. */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => serve(ex))
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-web-ui"); t.setDaemon(true); t
    })
    server.start()
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def serve(ex: HttpExchange): Unit = {
    val (code, mime, body) = ex.getRequestURI.getPath match {
      case "/" => (200, "text/html; charset=utf-8", htmlPage())
      case "/json" => (200, "application/json", jsonPage())
      case _ => (404, "text/plain", "not found")
    }
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", mime)
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private val counterNames = Seq("sessions_opened", "sessions_closed",
    "sessions_active", "statements_run", "statements_failed", "rows_streamed")

  private def jsonPage(): String = {
    val counters = counterNames
      .map(n => s""""$n":${ServerStats.get(n)}""").mkString(",")
    val sessions = SessionRegistry.snapshot.map { case (pid, busy, idleMs) =>
      s"""{"pid":$pid,"busy":$busy,"idle_ms":$idleMs}"""
    }.mkString(",")
    val stmts = ServerStats.recentStatements.map { e =>
      s"""{"pid":${e.pid},"state":"${e.state}","started_at":${e.startedAt},""" +
        s""""duration_ms":${e.durationMs},"statement":"${jsonEsc(e.statement)}"}"""
    }.mkString(",")
    s"""{"uptime_ms":${System.currentTimeMillis() - ServerStats.startedAt},""" +
      s"""$counters,"sessions":[$sessions],"statements":[$stmts]}"""
  }

  private def htmlPage(): String = {
    val counters = counterNames
      .map(n => s"<tr><td>$n</td><td>${ServerStats.get(n)}</td></tr>").mkString
    val sessions = SessionRegistry.snapshot.map { case (pid, busy, idleMs) =>
      s"<tr><td>$pid</td><td>${if (busy) "busy" else "idle"}</td><td>${idleMs}ms</td></tr>"
    }.mkString
    val stmts = ServerStats.recentStatements.map { e =>
      s"<tr><td>${e.pid}</td><td>${e.state}</td><td>${e.durationMs}ms</td>" +
        s"<td><code>${esc(e.statement)}</code></td></tr>"
    }.mkString
    val up = (System.currentTimeMillis() - ServerStats.startedAt) / 1000
    s"""<!DOCTYPE html><html><head><title>graft SQL server</title>
       |<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
       |td,th{border:1px solid #ccc;padding:4px 8px;text-align:left}</style></head>
       |<body><h1>graft SQL server</h1><p>uptime ${up}s</p>
       |<h2>Counters</h2><table>$counters</table>
       |<h2>Sessions</h2><table><tr><th>pid</th><th>state</th><th>idle</th></tr>$sessions</table>
       |<h2>Recent statements</h2>
       |<table><tr><th>pid</th><th>state</th><th>duration</th><th>statement</th></tr>$stmts</table>
       |</body></html>""".stripMargin
  }
}
