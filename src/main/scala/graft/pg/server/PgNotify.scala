package graft.pg.server

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** LISTEN / NOTIFY: a server-wide channel registry with cross-session
  * delivery of NotificationResponse ('A') messages. The reference has no
  * counterpart (its protocol layer rejects these statements); real PG apps
  * use the pair for cache invalidation and worker wake-ups, and ORMs issue
  * UNLISTEN * on pool check-in.
  *
  * Semantics matched to PG:
  *  - channel names fold like identifiers (unquoted lowercases, quoted is
  *    byte-exact);
  *  - a session listening on a channel receives its own notifications;
  *  - delivery is asynchronous — the 'A' frame rides the listener's
  *    connection at the next message boundary (Netty serializes the
  *    cross-thread write onto the owner's event loop, and every buffered
  *    write holds only whole messages, so frames never interleave);
  *  - UNLISTEN * / DISCARD ALL / session close drop all registrations.
  * Under autocommit (this server has no transactions) NOTIFY delivers
  * immediately, which is PG's own behavior outside a transaction block.
  */
object PgNotify {
  // channel -> pids listening (both sides bounded by live sessions)
  private val listeners = new ConcurrentHashMap[String, java.util.Set[Integer]]()

  /** PG identifier rules for the channel token as parsed off the wire. */
  def foldChannel(token: String): String =
    if (token.startsWith("\"")) token.substring(1, token.length - 1)
    else token.toLowerCase

  def listen(pid: Int, channel: String): Unit =
    listeners.computeIfAbsent(channel, _ => ConcurrentHashMap.newKeySet[Integer]())
      .add(pid)

  def unlisten(pid: Int, channel: Option[String]): Unit = channel match {
    case Some(c) =>
      val s = listeners.get(c)
      if (s != null) { s.remove(Integer.valueOf(pid)); if (s.isEmpty) listeners.remove(c, s) }
    case None => unlistenAll(pid)
  }

  def unlistenAll(pid: Int): Unit =
    listeners.forEach { (c, s) =>
      s.remove(Integer.valueOf(pid)); if (s.isEmpty) listeners.remove(c, s)
    }

  /** Deliver to every listener's connection; returns the delivery count.
    * A listener whose session vanished between registration and delivery is
    * skipped (its close() already cleared the registry; this is the race
    * window).
    */
  def notify(senderPid: Int, channel: String, payload: String): Int = {
    val s = listeners.get(channel)
    if (s == null) return 0
    var n = 0
    s.forEach { pid =>
      SessionRegistry.get(pid).foreach { sess =>
        val sink = sess.notifySink
        if (sink != null) { sink(senderPid, channel, payload); n += 1 }
      }
    }
    n
  }

  /** pids currently listening on a channel (test observability). */
  private[server] def listenerPids(channel: String): Set[Int] = {
    val s = listeners.get(channel)
    if (s == null) Set.empty
    else { val b = Set.newBuilder[Int]; s.forEach(p => b += p.intValue()); b.result() }
  }

  /** The wire pid of the session owning this SparkSession, if it is a
    * server-managed one (library use of the commands outside the server is
    * a no-op rather than an error).
    */
  def pidOf(spark: SparkSession): Option[Int] = SessionRegistry.pidOfSession(spark)
}
