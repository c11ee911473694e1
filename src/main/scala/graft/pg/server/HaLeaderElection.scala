package graft.pg.server

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.curator.framework.{CuratorFramework, CuratorFrameworkFactory}
import org.apache.curator.framework.recipes.leader.{LeaderLatch, LeaderLatchListener}
import org.apache.curator.retry.ExponentialBackoffRetry

/** ZooKeeper-backed active/standby coordination for the PG wire server
  * (SURVEY §2A A19).
  *
  * Reference behavior (`SQLServer.scala:209-237`): with
  * `spark.sql.server.recoveryMode=ZOOKEEPER` every launched server instance
  * joins a leader election under `<recoveryDir>/leader_election`; only the
  * elected leader proceeds past `doStart` (the rest block in `wait()`), and
  * a leader whose leadership is revoked exits with status -1 so a standby
  * can take over. The reference reaches Spark's package-private
  * `ZooKeeperLeaderElectionAgent` through an accessor shim in
  * `org.apache.spark.deploy.master` (`ZooKeeperLeaderElectionAgentAccessor
  * .scala:23-27`); that agent is itself a thin wrapper over Curator's
  * `LeaderLatch`, so the rebuild talks to the Curator recipe directly —
  * same election semantics, no private-API dependency.
  *
  * Scale posture: leader election carries no query traffic — ZooKeeper sees
  * one ephemeral znode per candidate server and a watch per standby,
  * regardless of data size or cluster width. Clients reach the active
  * instance via any multi-host libpq/JDBC URL
  * (`host=a,b target_session_attrs=read-write` style), which retries hosts
  * until one accepts — the same pattern the reference documents for its HA
  * mode.
  */
final class HaLeaderElection(
    zkUrl: String,
    /** election root; mirrors the reference's `<recoveryDir>/leader_election` */
    electionPath: String = "/graft-sql-server/leader_election",
    sessionTimeoutMs: Int = 15000,
    connectionTimeoutMs: Int = 15000,
    /** invoked when an ELECTED leader loses leadership (ZK session loss or
      * partition). The reference calls `System.exit(-1)`
      * (`SQLServer.scala:235-238`) so a standby takes over; the default does
      * the same, overridable for tests and embedded use.
      */
    onRevoked: () => Unit = () => System.exit(-1))
  extends AutoCloseable {

  private val client: CuratorFramework = CuratorFrameworkFactory.newClient(
    zkUrl, sessionTimeoutMs, connectionTimeoutMs,
    new ExponentialBackoffRetry(1000, 3))
  private val latch = new LeaderLatch(client, electionPath)
  private val elected = new CountDownLatch(1)
  private val wasLeader = new AtomicBoolean(false)
  private val closed = new AtomicBoolean(false)

  latch.addListener(new LeaderLatchListener {
    override def isLeader(): Unit = {
      wasLeader.set(true)
      elected.countDown()
    }
    override def notLeader(): Unit =
      // only a revocation (leader -> not leader) triggers the callback;
      // every candidate starts non-leader and that must not fire it
      if (wasLeader.getAndSet(false) && !closed.get()) onRevoked()
  })

  /** Join the election (non-blocking). */
  def start(): Unit = {
    client.start()
    latch.start()
  }

  /** Block until this instance is elected leader — the reference's
    * `synchronized { wait() }` gate before the server starts serving.
    * Returns false on timeout (still a candidate, likely standby).
    */
  def awaitLeadership(timeoutMs: Long = Long.MaxValue): Boolean =
    elected.await(math.min(timeoutMs, Long.MaxValue >> 1), TimeUnit.MILLISECONDS)

  def isLeader: Boolean = latch.hasLeadership

  /** Leave the election; if leader, leadership transfers to the next
    * candidate. Does not fire onRevoked (deliberate shutdown, not a fault).
    */
  override def close(): Unit = if (closed.compareAndSet(false, true)) {
    try latch.close()
    finally client.close()
  }
}
