package graft.pg.server

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

/** Statement lifecycle: INITIALIZED -> RUNNING -> FINISHED / CANCELED /
  * ERROR, terminal CLOSED (reference OperationManager.scala:29-97,
  * ExecutorImpl.scala:68-91). Cancellation propagates through the Spark
  * job group carried by the owning session.
  */
object OpState extends Enumeration {
  val Initialized, Running, Finished, Canceled, Error, Closed = Value
}

final class Operation(val session: PgSession, val statement: String) {
  private val state = new AtomicReference[OpState.Value](OpState.Initialized)
  val jobGroup: String = session.nextJobGroup()
  @volatile var startedAt: Long = 0L

  def currentState: OpState.Value = state.get()

  /** Run `body` under this operation's job group with state tracking. */
  def run[T](body: => T): T = {
    state.set(OpState.Running)
    startedAt = System.currentTimeMillis()
    session.busy = true
    session.activeJobGroup = jobGroup
    val sc = session.spark.sparkContext
    sc.setJobGroup(jobGroup, statement.take(80), interruptOnCancel = true)
    // per-session fair-scheduler pool so one heavy statement cannot starve
    // concurrent sessions' jobs (reference ExecutorImpl.scala:131-145);
    // under the default FIFO scheduler the property is inert
    sc.setLocalProperty("spark.scheduler.pool", s"graft-pg-${session.pid}")
    try {
      val r = body
      state.compareAndSet(OpState.Running, OpState.Finished)
      r
    } catch {
      case e: Throwable =>
        if (state.get() != OpState.Canceled) state.set(OpState.Error)
        throw e
    } finally {
      session.busy = false
      session.touch() // a just-finished statement resets the idle clock
      sc.setLocalProperty("spark.scheduler.pool", null)
      sc.clearJobGroup()
      ServerStats.record(StmtEvent(session.pid, statement.take(200),
        state.get().toString, startedAt, System.currentTimeMillis() - startedAt))
    }
  }

  def cancel(): Unit = {
    if (state.compareAndSet(OpState.Running, OpState.Canceled)) {
      session.spark.sparkContext.cancelJobGroup(jobGroup)
    }
  }

  def close(): Unit = state.set(OpState.Closed)
}

/** Idle-session reaper (reference SparkSQLServiceManager idle checker,
  * SparkSQLServiceManager.scala:137-158): sessions quiet longer than the
  * timeout are closed and unregistered.
  */
final class SessionReaper(timeoutMs: Long, periodMs: Long = 10000) {
  private val exec = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-session-reaper"); t.setDaemon(true); t
  })

  def start(): Unit =
    exec.scheduleWithFixedDelay(() => SessionRegistry.reapIdle(timeoutMs),
      periodMs, periodMs, TimeUnit.MILLISECONDS)

  def stop(): Unit = exec.shutdownNow()
}
