package graft.pg.server

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.zookeeper.server.{ServerCnxnFactory, ZooKeeperServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.time.{Millis, Seconds, Span}

/** e2e leader election against an embedded ZooKeeper server (same recipe
  * the reference's FaultToleranceSuite exercises with docker-side ZK,
  * `FaultToleranceSuite.scala`): exactly one of two candidates leads, the
  * standby takes over when the leader steps down, and a deliberate close
  * never fires the revocation callback.
  */
class HaLeaderElectionSuite extends AnyFunSuite with Matchers
  with BeforeAndAfterAll with Eventually {

  private var cnxnFactory: ServerCnxnFactory = _
  private var zkUrl: String = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("graft-zk").toFile
    dir.deleteOnExit()
    val zks = new ZooKeeperServer(dir, dir, 2000)
    cnxnFactory = ServerCnxnFactory.createFactory(
      new InetSocketAddress("127.0.0.1", 0), 64)
    cnxnFactory.startup(zks)
    zkUrl = s"127.0.0.1:${cnxnFactory.getLocalPort}"
  }

  override def afterAll(): Unit = if (cnxnFactory != null) cnxnFactory.shutdown()

  implicit override val patienceConfig: PatienceConfig =
    PatienceConfig(timeout = Span(30, Seconds), interval = Span(100, Millis))

  test("exactly one of two candidates is elected; standby takes over on step-down") {
    val revocations = new AtomicInteger(0)
    val a = new HaLeaderElection(zkUrl, "/graft-test/election-1",
      onRevoked = () => revocations.incrementAndGet())
    val b = new HaLeaderElection(zkUrl, "/graft-test/election-1",
      onRevoked = () => revocations.incrementAndGet())
    try {
      a.start()
      a.awaitLeadership(timeoutMs = 30000) shouldBe true
      b.start()
      // b is a candidate but must NOT lead while a holds the latch
      b.awaitLeadership(timeoutMs = 1500) shouldBe false
      a.isLeader shouldBe true
      b.isLeader shouldBe false

      // leader steps down deliberately: standby must take over, and the
      // deliberate close must not be reported as a fault
      a.close()
      b.awaitLeadership(timeoutMs = 30000) shouldBe true
      b.isLeader shouldBe true
      revocations.get() shouldBe 0
    } finally {
      a.close(); b.close()
    }
  }

  test("leadership gates server startup like the reference doStart") {
    // model two launcher processes: each waits for leadership before
    // binding; only one binds at a time (reference SQLServer.scala:209-218)
    val started = new AtomicInteger(0)
    def launch(ha: HaLeaderElection): Thread = {
      val t = new Thread(() => {
        ha.start()
        if (ha.awaitLeadership(timeoutMs = 30000)) started.incrementAndGet()
      })
      t.setDaemon(true); t.start(); t
    }
    val a = new HaLeaderElection(zkUrl, "/graft-test/election-2")
    val b = new HaLeaderElection(zkUrl, "/graft-test/election-2")
    try {
      val ta = launch(a); val tb = launch(b)
      eventually { started.get() shouldBe 1 }
      // failover: whichever leads steps down, the other must start
      (if (a.isLeader) a else b).close()
      eventually { started.get() shouldBe 2 }
      ta.join(5000); tb.join(5000)
    } finally {
      a.close(); b.close()
    }
  }
}
