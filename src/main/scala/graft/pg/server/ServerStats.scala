package graft.pg.server

import java.util.concurrent.atomic.AtomicLong

/** Session/statement event tracking (the reference's SQLServerListener,
  * SQLServerListener.scala:68-176, minus the web UI — counters are exposed
  * to clients through the `graft_stat('name')` function instead).
  */
object ServerStats {
  val sessionsOpened = new AtomicLong
  val sessionsClosed = new AtomicLong
  val statementsRun = new AtomicLong
  val statementsFailed = new AtomicLong
  val rowsStreamed = new AtomicLong

  def active: Long = sessionsOpened.get - sessionsClosed.get

  def get(name: String): Long = name match {
    case "sessions_opened" => sessionsOpened.get
    case "sessions_closed" => sessionsClosed.get
    case "sessions_active" => active
    case "statements_run" => statementsRun.get
    case "statements_failed" => statementsFailed.get
    case "rows_streamed" => rowsStreamed.get
    case _ => -1L
  }
}
