package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.pg.server.PgWireServer

/** Wire-path benchmark: runs the official TPC-H/TPC-DS texts THROUGH a live
  * PgWireServer in the reference's own benchmark choreography — extended
  * protocol, cursor mode, fetchSize 100000, autocommit off (reference
  * examples/tpcds/.../TPCDSQueryBenchmark.scala:341-345 drives the server
  * via pgjdbc exactly so) — next to the direct in-process path on the SAME
  * session, recording per-query wire-vs-direct overhead.
  *
  * Two extra hardenings over Bench:
  *  - every query is timed N iterations per path (default 3,
  *    SPARK_GRAFT_WIRE_ITERS) and the record carries min/avg/stdev — the
  *    reference reports multi-iteration results
  *    (TPCDSQueryBenchmark.scala:196-200) and min is robust against this
  *    host's documented degradation bursts;
  *  - results are verified, not trusted: the wire rows' concatenated
  *    DataRow payloads are MD5'd and compared against the direct plan's
  *    executeCollect rendered through the server's OWN RowCodec writer —
  *    byte equality, every query, every iteration.
  *
  * Emits one JSON line (raw FD, sbt-proof like Bench) and writes the full
  * per-query record to bench_wire.json.
  */
object BenchWire {

  /** The 22 TPC-H official-text entries (oracle = the official SQL). */
  private val TpchOfficial: Seq[String] = Seq(
    "q100_tpch_q3", "q101_tpch_q4", "q102_tpch_q10", "q103_tpch_q18",
    "q104_tpch_q5", "q105_tpch_q21", "q148_tpch_q7", "q149_tpch_q8",
    "q150_tpch_q9", "q151_tpch_q13", "q152_tpch_q14", "q153_tpch_q15",
    "q154_tpch_q16", "q155_tpch_q17", "q156_tpch_q19", "q157_tpch_q20",
    "q158_tpch_q22", "q223_tpch_q6", "q244_tpch_q2", "q245_tpch_q11",
    "q246_tpch_q12", "q247_tpch_q22")

  /** Official entries in battery order: TPC-H texts then the DS battery. */
  def officialEntries: Seq[QE] = {
    val byName = SparkEntry.all.map(e => e.name -> e).toMap
    val tpch = TpchOfficial.map(n => byName.getOrElse(n,
      sys.error(s"official entry $n missing from SparkEntry")))
    val ds = SparkEntry.all.filter(_.name.matches("q\\d+_ds_q\\d+"))
    tpch ++ ds
  }

  /** Minimal blocking PG V3 client in pgjdbc's cursor-mode choreography.
    * First round batches Parse+Bind+Describe+Execute+Sync in one write
    * (exactly pgjdbc's QueryExecutorImpl flow); follow-up rounds are
    * Execute+Sync against the still-open named portal. Shared with the
    * concurrency bench (BenchWireConc).
    */
  private[graft] final class WireClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
    private val os = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16))

    private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
    private def i16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).putShort(v.toShort).array()
    private def i32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()

    def connect(): Unit = {
      val body = cstr("user") ++ cstr("graft") ++ cstr("database") ++
        cstr("default") :+ 0.toByte
      os.writeInt(8 + body.length)
      os.writeInt(196608)
      os.write(body)
      os.flush()
      drain((_, _) => ())
    }

    private def put(tpe: Char, payload: Array[Byte]): Unit = {
      os.writeByte(tpe)
      os.writeInt(4 + payload.length)
      os.write(payload)
    }

    def simpleQuery(sql: String): Unit = {
      put('Q', cstr(sql)); os.flush()
      drain((t, p) => if (t == 'E') throw new IllegalStateException(
        s"server error on '$sql': ${new String(p, UTF_8)}"))
    }

    def parseBindDescribeExecute(stmt: String, portal: String, sql: String,
        fetchSize: Int): Unit = {
      put('P', cstr(stmt) ++ cstr(sql) ++ i16(0))
      put('B', cstr(portal) ++ cstr(stmt) ++ i16(0) ++ i16(0) ++ i16(0))
      put('D', Array[Byte]('P'.toByte) ++ cstr(portal))
      put('E', cstr(portal) ++ i32(fetchSize))
      put('S', Array.empty)
      os.flush()
    }

    def executeRound(portal: String, fetchSize: Int): Unit = {
      put('E', cstr(portal) ++ i32(fetchSize))
      put('S', Array.empty)
      os.flush()
    }

    def closeAll(stmt: String, portal: String): Unit = {
      put('C', Array[Byte]('P'.toByte) ++ cstr(portal))
      put('C', Array[Byte]('S'.toByte) ++ cstr(stmt))
      put('S', Array.empty)
      os.flush()
      drain((_, _) => ())
    }

    /** Read messages to ReadyForQuery, streaming each to `onMsg`. */
    def drain(onMsg: (Char, Array[Byte]) => Unit): Unit = {
      var done = false
      while (!done) {
        val tpe = in.readByte().toChar
        val len = in.readInt()
        val payload = new Array[Byte](len - 4)
        in.readFully(payload)
        onMsg(tpe, payload)
        if (tpe == 'Z') done = true
      }
    }

    def close(): Unit = {
      try { put('X', Array.empty); os.flush() } catch { case _: Throwable => }
      sock.close()
    }
  }

  private final case class WireResult(rows: Long, md5: String, suspensions: Int)

  /** One full cursor-mode execution of `sql`: returns row count, the MD5 of
    * all DataRow payload bytes in order, and the suspension-round count.
    */
  private def runWire(c: WireClient, sql: String, fetchSize: Int): WireResult = {
    val md = MessageDigest.getInstance("MD5")
    var rows = 0L
    var suspensions = 0
    var complete = false
    var err: String = null
    def onMsg(t: Char, p: Array[Byte]): Unit = t match {
      case 'D' => rows += 1; md.update(p)
      case 's' => suspensions += 1
      case 'C' => complete = true
      case 'E' => err = new String(p, UTF_8)
      case _ => ()
    }
    c.parseBindDescribeExecute("S_bw", "P_bw", sql, fetchSize)
    c.drain(onMsg)
    while (!complete && err == null) {
      c.executeRound("P_bw", fetchSize)
      c.drain(onMsg)
    }
    c.closeAll("S_bw", "P_bw")
    if (err != null) throw new IllegalStateException(s"wire error: $err")
    WireResult(rows, md.digest().map("%02x".format(_)).mkString, suspensions)
  }

  /** Direct-path reference: execute `sql` in-process and render every row
    * through the server's own text RowCodec writer (int16 ncols + fields —
    * the exact DataRow payload bytes), so the wire hash must match
    * byte-for-byte.
    */
  private def directDigest(spark: SparkSession, sql: String): (Long, String) = {
    val df = spark.sql(sql)
    val schema = df.schema
    val writer = graft.pg.wire.RowCodec.rowWriter(
      schema, Seq.fill(schema.length)(false))
    val md = MessageDigest.getInstance("MD5")
    var buf = ByteBuffer.allocate(1 << 16)
    val rows = df.queryExecution.executedPlan.executeCollect()
    rows.foreach { r =>
      var done = false
      while (!done) {
        buf.clear()
        try {
          buf.putShort(schema.length.toShort)
          writer(r, buf)
          done = true
        } catch {
          case _: java.nio.BufferOverflowException =>
            buf = ByteBuffer.allocate(buf.capacity() * 2)
        }
      }
      md.update(buf.array(), 0, buf.position())
    }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private def stats(xs: Seq[Double]): (Double, Double, Double) = {
    val mn = xs.min
    val avg = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - avg) * (x - avg)).sum / xs.size)
    (mn, avg, sd)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_WIRE_ITERS", "3").toInt
    val fetchSize = sys.env.getOrElse("SPARK_GRAFT_WIRE_FETCH", "100000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // temp views for the direct path + main.* catalog views for the CTE
    // shadow texts; bare-name catalog TABLES (not views) so the server's
    // per-connection newSession() clones (shared external catalog,
    // isolated temp views) resolve the same tables a metastore-registered
    // deployment would. TABLE matters: a catalog VIEW re-expands to
    // parquet.`path` on every analysis — file re-listing + footer schema
    // re-inference per referenced table per query, ~0.8s of pure fixed
    // cost on an 8-table TPC-H text — while a catalog table's resolved
    // relation lands in the session's relation cache after first use.
    Tables.all.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $n")
      spark.sql(s"CREATE TABLE $n USING parquet LOCATION '$sfDir/$n.parquet'")
    }
    // temp views registered AFTER the tables: DROP TABLE resolves (and
    // would drop) a same-named temp view first
    Tables.views(spark, sfDir)

    val server = new PgWireServer(spark, port = 0)
    server.start()
    val entries = officialEntries
    System.err.println(s"[bench-wire] ${entries.size} official texts, " +
      s"$iters iters, fetchSize=$fetchSize, port=${server.boundPort}")

    val c = new WireClient(server.boundPort)
    c.connect()
    // the reference connects with autocommit=false: pgjdbc opens the
    // transaction before the first cursor-mode query
    c.simpleQuery("BEGIN")

    // one untimed warmup of each path (JIT/codegen/session setup)
    entries.headOption.foreach { e =>
      val sql = e.oracle.get
      directDigest(spark, sql)
      runWire(c, sql, fetchSize)
    }

    final case class Rec(name: String, rows: Long, suspensions: Int,
        direct: Seq[Double], wire: Seq[Double], hashOk: Boolean)
    val recs = mutable.ArrayBuffer.empty[Rec]
    entries.foreach { e =>
      val sql = e.oracle.getOrElse(sys.error(s"${e.name} has no SQL text"))
      try {
        val directTimes = mutable.ArrayBuffer.empty[Double]
        val wireTimes = mutable.ArrayBuffer.empty[Double]
        var rows = -1L
        var suspensions = 0
        var hashOk = true
        var directMd5 = ""
        (0 until iters).foreach { i =>
          val t0 = System.nanoTime()
          val (dRows, dMd5) = directDigest(spark, sql)
          directTimes += (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val w = runWire(c, sql, fetchSize)
          wireTimes += (System.nanoTime() - t1) / 1e9
          if (i == 0) { rows = dRows; suspensions = w.suspensions; directMd5 = dMd5 }
          if (w.rows != dRows || w.md5 != dMd5) hashOk = false
          spark.catalog.clearCache()
        }
        recs += Rec(e.name, rows, suspensions, directTimes.toSeq, wireTimes.toSeq, hashOk)
        val (dm, _, _) = stats(recs.last.direct)
        val (wm, _, _) = stats(recs.last.wire)
        System.err.println(f"[bench-wire] ${e.name} rows=$rows direct=$dm%.3fs " +
          f"wire=$wm%.3fs overhead=${(wm / dm - 1) * 100}%.1f%% hashOk=$hashOk")
      } catch {
        case ex: Throwable =>
          System.err.println(s"[bench-wire] ${e.name} FAILED: ${ex.getMessage}")
          recs += Rec(e.name, -1, 0, Nil, Nil, hashOk = false)
      }
    }
    c.simpleQuery("COMMIT")
    c.close()
    server.stop()

    val ok = recs.filter(_.rows >= 0)
    val allHashOk = ok.forall(_.hashOk) && ok.size == recs.size
    def j(xs: Seq[Double]): String = {
      val (mn, avg, sd) = stats(xs)
      f"""{"min":$mn%.4f,"avg":$avg%.4f,"stdev":$sd%.4f}"""
    }
    val perQuery = recs.map { r =>
      if (r.rows < 0) s""""${r.name}":{"error":true}"""
      else s""""${r.name}":{"rows":${r.rows},"suspensions":${r.suspensions},""" +
        s""""direct":${j(r.direct)},"wire":${j(r.wire)},"hash_ok":${r.hashOk}}"""
    }.mkString("{", ",", "}")
    val dirTotal = ok.map(_.direct.min).sum
    val wireTotal = ok.map(_.wire.min).sum
    val full =
      s"""{"metric":"wire_total","value":$wireTotal,"unit":"sec","direct_total":$dirTotal,""" +
        s""""overhead_pct":${(wireTotal / dirTotal - 1) * 100},"n_queries":${recs.size},""" +
        s""""n_ok":${ok.size},"all_hash_ok":$allHashOk,"iters":$iters,""" +
        s""""fetch_size":$fetchSize,"sf":"$sfDir","queries":$perQuery}"""
    val rawOut = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    rawOut.println(full)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_wire.json"), full + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
