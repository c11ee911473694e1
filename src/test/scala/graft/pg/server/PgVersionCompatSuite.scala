package graft.pg.server

import scala.sys.process._

import graft.TestSpark

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Back-version compatibility smoke: the announced server_version is a
  * compat knob (reference SQLServerConf.scala:61-67, PsqlCommandsSuite
  * :27-400 drives psql meta commands against 7.4/8.4/9.6/10) — psql picks
  * version-appropriate catalog SQL from it, so the pg_catalog surface must
  * answer the query shapes of each announced era without error.
  */
class PgVersionCompatSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var server: PgWireServer = _
  private def port: Int = server.boundPort

  override def beforeAll(): Unit = {
    server = new PgWireServer(TestSpark.spark, port = 0)
    server.start()
    TestSpark.spark.sql("DROP TABLE IF EXISTS vercompat_t")
    TestSpark.spark.sql("CREATE TABLE vercompat_t (k INT, v STRING) USING parquet")
  }

  override def afterAll(): Unit = {
    TestSpark.spark.conf.unset("spark.graft.server.version")
    TestSpark.spark.sql("DROP TABLE IF EXISTS vercompat_t")
    if (server != null) server.stop()
  }

  /** run a psql meta command; returns (exitCode, stdout, stderr) */
  private def meta(cmd: String): (Int, String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Seq("psql", s"host=127.0.0.1 port=$port dbname=default user=graft",
      "-At", "-c", cmd).!(ProcessLogger(s => out.append(s).append('\n'),
      s => err.append(s).append('\n')))
    (rc, out.toString, err.toString)
  }

  for (version <- Seq("9.6.0", "10.5", "15.2")) {
    test(s"psql meta commands succeed with server_version $version") {
      TestSpark.spark.conf.set("spark.graft.server.version", version)
      // announced version reaches the client
      val (rcV, outV, _) = meta("SHOW ALL")
      // \l lists databases, \dt tables, \d describes, \df functions —
      // each issues version-gated catalog SQL
      for (cmd <- Seq("\\l", "\\dt", "\\d vercompat_t", "\\df")) {
        val (rc, out, err) = meta(cmd)
        assert(rc === 0, s"[$version] $cmd failed: $err")
        assert(!err.contains("ERROR"), s"[$version] $cmd stderr: $err")
      }
      val (rc, out, err) = meta("\\dt")
      assert(out.contains("vercompat_t"), s"[$version] \\dt must list the table, got: $out")
      val (rcD, outD, errD) = meta("\\d vercompat_t")
      assert(outD.contains("k") && outD.contains("v"),
        s"[$version] \\d must show columns, got: $outD / $errD")
    }
  }
}
