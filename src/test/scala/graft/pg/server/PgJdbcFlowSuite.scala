package graft.pg.server

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import graft.TestSpark

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** pgjdbc-flow emulation: replays the EXACT extended-protocol message
  * sequences the real PostgreSQL JDBC driver (42.2.x) emits, over a raw V3
  * socket. The reference's third verification layer drives the actual
  * pgjdbc jar (reference TEST/PgJdbcSuite.scala:1144-1226 — the cursor ×
  * incrementalCollect matrix); that jar is not in this sandbox's offline
  * cache, so the driver's wire behavior is scripted here from pgjdbc's
  * public source (QueryExecutorImpl, SimpleQuery, PgDatabaseMetaData,
  * TypeInfoCache):
  *
  *   - connection startup with pgjdbc's full parameter set, then the
  *     driver's first statement (`SET extra_float_digits = 3`)
  *   - `executeQuery` one-shot batch: Parse("")/Bind/Describe(P)/Execute/Sync
  *   - the prepareThreshold=5 switch to a named statement (S_1) with
  *     Describe(S)-driven ParameterDescription consumption, then
  *     Bind/Execute-only reuse rounds (no re-Parse)
  *   - binary result mode after the named prepare (per-column format codes)
  *   - the fetchSize cursor loop: Execute(fetchSize)/Sync per round trip,
  *     portal surviving Sync, Close(portal) at ResultSet.close()
  *   - the DatabaseMetaData query corpus (getTypeInfo / getSchemas /
  *     getTables / getColumns / getPrimaryKeys) and TypeInfoCache's
  *     parameterized type-lookup query, verbatim as pgjdbc emits them
  */
class PgJdbcFlowSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var server: PgWireServer = _
  private def port: Int = server.boundPort

  override def beforeAll(): Unit = {
    server = new PgWireServer(TestSpark.spark, port = 0)
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  // ---- a raw V3 client shaped like pgjdbc's QueryExecutorImpl ----

  private class Jdbc42Client {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(sock.getInputStream)
    private val os = new DataOutputStream(sock.getOutputStream)

    def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
    private def i16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).putShort(v.toShort).array()
    private def i32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()

    val parameterStatus = mutable.Map.empty[String, String]
    var txStatus: Char = ' '

    /** pgjdbc's startup packet: the parameter list ConnectionFactoryImpl
      * sends for a 9.0+ server (user, database, client_encoding, DateStyle,
      * TimeZone, extra_float_digits, application_name).
      */
    def connect(extraFloatDigits: String = "2"): Seq[(Char, Array[Byte])] = {
      val body =
        cstr("user") ++ cstr("graft") ++
          cstr("database") ++ cstr("default") ++
          cstr("client_encoding") ++ cstr("UTF8") ++
          cstr("DateStyle") ++ cstr("ISO") ++
          cstr("TimeZone") ++ cstr("America/New_York") ++
          // 42.2 sends 2; 42.7 raised its 9.0+ default to 3
          cstr("extra_float_digits") ++ cstr(extraFloatDigits) ++
          cstr("application_name") ++ cstr("PostgreSQL JDBC Driver") :+ 0.toByte
      os.writeInt(8 + body.length)
      os.writeInt(196608)
      os.write(body)
      os.flush()
      drainUntilReady()
    }

    def send(tpe: Char, payload: Array[Byte]): Unit = {
      os.writeByte(tpe)
      os.writeInt(4 + payload.length)
      os.write(payload)
      os.flush()
    }

    def parse(stmt: String, sql: String, paramOids: Seq[Int] = Nil): Unit =
      send('P', cstr(stmt) ++ cstr(sql) ++ i16(paramOids.length) ++
        paramOids.flatMap(i32).toArray)

    /** Bind with text params and per-column result format codes (pgjdbc
      * sends one code per column once it knows the row description).
      */
    def bind(portal: String, stmt: String, params: Seq[String] = Nil,
        resultFormats: Seq[Int] = Nil): Unit = {
      val paramBytes = params.flatMap { p =>
        val b = p.getBytes(UTF_8); i32(b.length) ++ b
      }.toArray
      send('B', cstr(portal) ++ cstr(stmt) ++
        i16(0) ++ // all params text
        i16(params.length) ++ paramBytes ++
        i16(resultFormats.length) ++ resultFormats.flatMap(i16).toArray)
    }

    def describeStatement(name: String): Unit =
      send('D', Array[Byte]('S'.toByte) ++ cstr(name))
    def describePortal(name: String): Unit =
      send('D', Array[Byte]('P'.toByte) ++ cstr(name))
    def execute(portal: String, maxRows: Int): Unit =
      send('E', cstr(portal) ++ i32(maxRows))
    def closePortal(name: String): Unit =
      send('C', Array[Byte]('P'.toByte) ++ cstr(name))
    def closeStatement(name: String): Unit =
      send('C', Array[Byte]('S'.toByte) ++ cstr(name))
    def sync(): Seq[(Char, Array[Byte])] = { send('S', Array.empty); drainUntilReady() }

    def drainUntilReady(): Seq[(Char, Array[Byte])] = {
      val msgs = mutable.ArrayBuffer.empty[(Char, Array[Byte])]
      var done = false
      while (!done) {
        val tpe = in.readByte().toChar
        val len = in.readInt()
        val payload = new Array[Byte](len - 4)
        in.readFully(payload)
        if (tpe == 'S' && payload.nonEmpty) {
          val parts = new String(payload, UTF_8).split('\u0000')
          if (parts.length >= 2) parameterStatus(parts(0)) = parts(1)
        }
        msgs += ((tpe, payload))
        if (tpe == 'Z') { txStatus = payload(0).toChar; done = true }
      }
      msgs.toSeq
    }

    /** pgjdbc's Statement.executeQuery over the unnamed statement: one batch
      * of Parse/Bind/Describe(portal)/Execute/Sync. Returns the full reply.
      */
    def oneShot(sql: String, params: Seq[String] = Nil,
        paramOids: Seq[Int] = Nil): Seq[(Char, Array[Byte])] = {
      parse("", sql, paramOids)
      bind("", "", params)
      describePortal("")
      execute("", 0)
      sync()
    }

    /** Text cells of every DataRow in a reply. */
    def rows(msgs: Seq[(Char, Array[Byte])]): Seq[Seq[String]] =
      msgs.filter(_._1 == 'D').map { case (_, p) =>
        val b = ByteBuffer.wrap(p)
        val ncols = b.getShort.toInt
        (0 until ncols).map { _ =>
          val len = b.getInt
          if (len == -1) null
          else { val v = new Array[Byte](len); b.get(v); new String(v, UTF_8) }
        }
      }

    /** (name, typeOid, formatCode) per field of the reply's RowDescription. */
    def fields(msgs: Seq[(Char, Array[Byte])]): Seq[(String, Int, Int)] = {
      val p = msgs.find(_._1 == 'T').getOrElse(fail("no RowDescription"))._2
      val b = ByteBuffer.wrap(p)
      val nf = b.getShort.toInt
      (0 until nf).map { _ =>
        val name = new StringBuilder
        var c = b.get()
        while (c != 0) { name.append(c.toChar); c = b.get() }
        b.getInt // table oid
        b.getShort // attnum
        val oid = b.getInt
        b.getShort // typlen
        b.getInt // typmod
        val fmt = b.getShort.toInt
        (name.toString, oid, fmt)
      }
    }

    /** Declared param type oids from a ParameterDescription. */
    def paramOids(msgs: Seq[(Char, Array[Byte])]): Seq[Int] = {
      val p = msgs.find(_._1 == 't').getOrElse(fail("no ParameterDescription"))._2
      val b = ByteBuffer.wrap(p)
      val np = b.getShort.toInt
      (0 until np).map(_ => b.getInt)
    }

    def commandTags(msgs: Seq[(Char, Array[Byte])]): Seq[String] =
      msgs.filter(_._1 == 'C').map(m => new String(m._2, UTF_8).trim.stripSuffix("\u0000"))

    def types(msgs: Seq[(Char, Array[Byte])]): String = msgs.map(_._1).mkString

    def close(): Unit = { send('X', Array.empty); sock.close() }
  }

  private def withClient[A](f: Jdbc42Client => A): A = {
    val c = new Jdbc42Client
    c.connect()
    try f(c) finally c.close()
  }

  // ---- connection lifecycle ----

  test("startup: pgjdbc parameter set is accepted and answered") {
    val c = new Jdbc42Client
    val msgs = c.connect()
    try {
      val ts = c.types(msgs)
      assert(ts.startsWith("R"), s"AuthenticationOk first, got $ts")
      assert(msgs.exists(_._1 == 'K'), "BackendKeyData required (pgjdbc stores it for cancel)")
      assert(c.txStatus === 'I', "ReadyForQuery must report idle")
      // pgjdbc reads these ParameterStatus values at connect
      assert(c.parameterStatus.contains("server_version"))
      assert(c.parameterStatus("client_encoding") === "UTF8")
      assert(c.parameterStatus.get("integer_datetimes").contains("on"),
        "pgjdbc's binary timestamp codec requires integer_datetimes=on")
      assert(c.parameterStatus.get("standard_conforming_strings").contains("on"))

      // the driver's first statement on a 9.0+ server
      val r = c.oneShot("SET extra_float_digits = 3")
      assert(c.commandTags(r) === Seq("SET"), s"got ${c.commandTags(r)}")
      assert(!r.exists(_._1 == 'E'))
    } finally c.close()
  }

  test("isValid(): empty extended query completes without error") {
    withClient { c =>
      val r = c.oneShot("")
      assert(!r.exists(_._1 == 'E'), "empty query must not error")
      assert(r.last._1 === 'Z')
    }
  }

  // ---- statement execution flows ----

  test("executeQuery: unnamed one-shot batch replies in pgjdbc's expected order") {
    withClient { c =>
      val r = c.oneShot(
        "SELECT l_returnflag, count(*) AS n " +
          s"FROM parquet.`${TestSpark.sfDir}/lineitem.parquet` " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
      val ts = c.types(r)
      // ParseComplete, BindComplete, RowDescription, rows, CommandComplete, Ready
      assert(ts.matches("12TD+CZ"), s"reply sequence was $ts")
      assert(c.fields(r).map(_._1) === Seq("l_returnflag", "n"))
      val got = c.rows(r)
      assert(got.length === 3 && got.head.head === "A")
      assert(c.commandTags(r).head === s"SELECT 3")
    }
  }

  test("prepareThreshold: 5th execution switches to named statement S_1, then reuses it") {
    withClient { c =>
      val sql = "SELECT $1 + 10 AS v"
      // executions 1-4: unnamed statement each time
      (1 to 4).foreach { k =>
        val r = c.oneShot(sql, params = Seq(k.toString), paramOids = Seq(23))
        assert(c.rows(r) === Seq(Seq((k + 10).toString)))
      }
      // execution 5: pgjdbc promotes to a named server-side statement —
      // Parse(S_1) + Describe(S_1) consumed for ParameterDescription +
      // RowDescription, then Bind/Execute
      c.parse("S_1", sql, Seq(23))
      c.describeStatement("S_1")
      c.bind("", "S_1", Seq("5"))
      c.execute("", 0)
      val r5 = c.sync()
      assert(c.types(r5).matches("1tT2D+CZ"),
        s"named-prepare reply was ${c.types(r5)}")
      assert(c.paramOids(r5) === Seq(23), "declared int4 param must describe as oid 23")
      assert(c.rows(r5) === Seq(Seq("15")))
      // executions 6-8: Bind/Execute ONLY — the named statement is reused
      // across Syncs with no re-Parse (the server must keep S_1 alive)
      (6 to 8).foreach { k =>
        c.bind("", "S_1", Seq(k.toString))
        c.execute("", 0)
        val r = c.sync()
        val ts = c.types(r)
        assert(!ts.contains('1'), s"reuse round must not re-Parse, got $ts")
        assert(c.rows(r) === Seq(Seq((k + 10).toString)))
      }
      // Statement.close(): Close(S) frees the named statement
      c.closeStatement("S_1")
      val rc = c.sync()
      assert(rc.exists(_._1 == '3'), "CloseComplete expected")
      // binding the closed statement now fails (and Sync recovers)
      c.bind("", "S_1", Seq("9"))
      c.execute("", 0)
      val re = c.sync()
      assert(re.exists(_._1 == 'E'), "bind on a closed statement must error")
      assert(re.last._1 === 'Z')
    }
  }

  test("binary-mode switch: named statement results flip to binary format codes") {
    withClient { c =>
      val sql = "SELECT CAST($1 AS BIGINT) * 2 AS v, 'txt' AS s"
      c.parse("S_2", sql, Seq(20))
      c.describeStatement("S_2")
      c.sync()
      // pgjdbc requests binary for OIDs its binary codec supports (int8)
      // and text for the rest — per-column result format codes
      c.bind("", "S_2", Seq("21"), resultFormats = Seq(1, 0))
      c.describePortal("")
      c.execute("", 0)
      val r = c.sync()
      assert(c.fields(r).map(_._3) === Seq(1, 0),
        "RowDescription format codes must echo the Bind request")
      val data = r.find(_._1 == 'D').get._2
      val b = ByteBuffer.wrap(data)
      assert(b.getShort === 2)
      assert(b.getInt === 8, "int8 binary cell is 8 bytes")
      assert(b.getLong === 42L)
      val slen = b.getInt
      val sv = new Array[Byte](slen); b.get(sv)
      assert(new String(sv, UTF_8) === "txt")
      c.closeStatement("S_2"); c.sync()
    }
  }

  test("fetchSize cursor loop: Execute/Sync per round, portal survives Sync") {
    withClient { c =>
      // pgjdbc requires autocommit off for cursor mode and emits BEGIN first
      val rb = c.oneShot("BEGIN")
      assert(c.commandTags(rb) === Seq("BEGIN"))
      // ResultSet round 1: the full batch with Execute(maxRows=fetchSize)
      c.parse("", "SELECT id FROM range(7) ORDER BY id")
      c.bind("C_1", "")
      c.describePortal("C_1")
      c.execute("C_1", 2)
      val r1 = c.sync()
      assert(c.types(r1).matches("12TDDsZ"), s"round 1 was ${c.types(r1)}")
      assert(c.rows(r1).map(_.head) === Seq("0", "1"))
      // rounds 2..n: pgjdbc sends ONLY Execute + Sync — the portal must
      // survive the Sync boundary (this is the exact sequence from
      // QueryExecutorImpl.fetch; reference PgJdbcSuite.scala:1144-1190
      // proves the same loop via the real driver)
      c.execute("C_1", 2)
      val r2 = c.sync()
      assert(c.types(r2).matches("DDsZ"), s"round 2 was ${c.types(r2)}")
      assert(c.rows(r2).map(_.head) === Seq("2", "3"))
      c.execute("C_1", 2)
      val r3 = c.sync()
      assert(c.rows(r3).map(_.head) === Seq("4", "5"))
      c.execute("C_1", 2)
      val r4 = c.sync()
      assert(c.types(r4).matches("DCZ"), s"final round was ${c.types(r4)}")
      assert(c.rows(r4).map(_.head) === Seq("6"))
      assert(c.commandTags(r4).head === "SELECT 7",
        "CommandComplete carries the TOTAL row count")
      // ResultSet.close(): Close(portal)
      c.closePortal("C_1")
      val rc = c.sync()
      assert(rc.exists(_._1 == '3'))
      // resumed Execute on the closed portal errors; Sync recovers
      c.execute("C_1", 2)
      val re = c.sync()
      assert(re.exists(_._1 == 'E') && re.last._1 === 'Z')
      c.oneShot("COMMIT")
    }
  }

  test("setMaxRows: Execute(maxRows) then Close without draining") {
    withClient { c =>
      c.parse("", "SELECT id FROM range(10) ORDER BY id")
      c.bind("", "")
      c.execute("", 1)
      val r = c.sync()
      assert(c.rows(r).map(_.head) === Seq("0"), "exactly maxRows rows")
      assert(r.exists(_._1 == 's'), "suspended, not complete")
      c.closePortal("")
      val rc = c.sync()
      assert(rc.exists(_._1 == '3'))
      // the statement stays usable for the next executeQuery
      val r2 = c.oneShot("SELECT 1 AS one")
      assert(c.rows(r2) === Seq(Seq("1")))
    }
  }

  // ---- DatabaseMetaData query corpus (verbatim pgjdbc 42.2.x SQL) ----

  test("DatabaseMetaData.getTypeInfo corpus query") {
    withClient { c =>
      val r = c.oneShot(
        "SELECT t.typname,t.oid FROM pg_catalog.pg_type t " +
          "JOIN pg_catalog.pg_namespace n ON (t.typnamespace = n.oid) " +
          "WHERE n.nspname != 'pg_toast'")
      assert(!r.exists(_._1 == 'E'), "getTypeInfo query must run")
      val byName = c.rows(r).map(x => x.head -> x(1)).toMap
      assert(byName("int4") === "23" && byName("int8") === "20" &&
        byName("varchar") === "1043" && byName("numeric") === "1700")
    }
  }

  test("DatabaseMetaData.getSchemas corpus query") {
    withClient { c =>
      val r = c.oneShot(
        "SELECT nspname AS TABLE_SCHEM, NULL AS TABLE_CATALOG FROM pg_catalog.pg_namespace " +
          "WHERE nspname <> 'pg_toast' AND (nspname !~ '^pg_temp_' " +
          "OR nspname = (pg_catalog.current_schemas(true))[1]) AND (nspname !~ '^pg_toast_temp_' " +
          "OR nspname = replace((pg_catalog.current_schemas(true))[1], 'pg_temp_', 'pg_toast_temp_')) " +
          "ORDER BY TABLE_SCHEM")
      assert(!r.exists(_._1 == 'E'), "getSchemas query must run")
      assert(c.rows(r).map(_.head).contains("spark"))
    }
  }

  test("DatabaseMetaData.getTables corpus query finds a catalog view") {
    TestSpark.spark.sql("CREATE OR REPLACE VIEW jdbcflow_v AS SELECT 1 AS a, 'x' AS b")
    try withClient { c =>
      val r = c.oneShot(
        """SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, c.relname AS TABLE_NAME,
          | CASE n.nspname ~ '^pg_' OR n.nspname = 'information_schema'
          | WHEN true THEN CASE
          |  WHEN n.nspname = 'pg_catalog' OR n.nspname = 'information_schema' THEN CASE c.relkind
          |   WHEN 'r' THEN 'SYSTEM TABLE' WHEN 'v' THEN 'SYSTEM VIEW' WHEN 'i' THEN 'SYSTEM INDEX' ELSE NULL END
          |  WHEN n.nspname = 'pg_toast' THEN CASE c.relkind
          |   WHEN 'r' THEN 'SYSTEM TOAST TABLE' WHEN 'i' THEN 'SYSTEM TOAST INDEX' ELSE NULL END
          |  ELSE CASE c.relkind WHEN 'r' THEN 'TEMPORARY TABLE' WHEN 'p' THEN 'TEMPORARY TABLE'
          |   WHEN 'i' THEN 'TEMPORARY INDEX' WHEN 'S' THEN 'TEMPORARY SEQUENCE' WHEN 'v' THEN 'TEMPORARY VIEW' ELSE NULL END
          | END
          | WHEN false THEN CASE c.relkind
          |  WHEN 'r' THEN 'TABLE' WHEN 'p' THEN 'PARTITIONED TABLE' WHEN 'i' THEN 'INDEX'
          |  WHEN 'S' THEN 'SEQUENCE' WHEN 'v' THEN 'VIEW' WHEN 'c' THEN 'TYPE'
          |  WHEN 'f' THEN 'FOREIGN TABLE' WHEN 'm' THEN 'MATERIALIZED VIEW' ELSE NULL END
          | ELSE NULL END AS TABLE_TYPE, d.description AS REMARKS
          | FROM pg_catalog.pg_namespace n, pg_catalog.pg_class c
          | LEFT JOIN pg_catalog.pg_description d ON (c.oid = d.objoid AND d.objsubid = 0)
          | LEFT JOIN pg_catalog.pg_class dc ON (d.classoid=dc.oid AND dc.relname='pg_class')
          | LEFT JOIN pg_catalog.pg_namespace dn ON (dn.oid=dc.relnamespace AND dn.nspname='pg_catalog')
          | WHERE c.relnamespace = n.oid
          |  AND (false OR ( c.relkind = 'v' AND n.nspname <> 'pg_catalog' AND n.nspname <> 'information_schema' )
          |       OR ( c.relkind = 'r' AND n.nspname !~ '^pg_' AND n.nspname <> 'information_schema' ))
          |  AND c.relname LIKE E'jdbcflow_v'
          | ORDER BY TABLE_TYPE,TABLE_SCHEM,TABLE_NAME""".stripMargin)
      assert(!r.exists(_._1 == 'E'),
        s"getTables query must run: ${new String(r.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8)}")
      val got = c.rows(r)
      assert(got.length === 1, s"exactly the created view, got $got")
      assert(got.head(1) === "spark" && got.head(2) === "jdbcflow_v" && got.head(3) === "VIEW")
    } finally TestSpark.spark.sql("DROP VIEW IF EXISTS jdbcflow_v")
  }

  test("DatabaseMetaData.getColumns corpus query lists the view's columns") {
    TestSpark.spark.sql("CREATE OR REPLACE VIEW jdbcflow_c AS SELECT 1 AS id, 'x' AS txt")
    try withClient { c =>
      val r = c.oneShot(
        """SELECT * FROM (SELECT n.nspname,c.relname,a.attname,a.atttypid,
          | a.attnotnull OR (t.typtype = 'd' AND t.typnotnull) AS attnotnull,
          | a.atttypmod,a.attlen,
          | row_number() OVER (PARTITION BY a.attrelid ORDER BY a.attnum) AS attnum,
          | nullif(a.attidentity, '') as attidentity,
          | pg_catalog.pg_get_expr(def.adbin, def.adrelid) AS adsrc,
          | dsc.description,t.typbasetype,t.typtype
          | FROM pg_catalog.pg_namespace n
          | JOIN pg_catalog.pg_class c ON (c.relnamespace = n.oid)
          | JOIN pg_catalog.pg_attribute a ON (a.attrelid=c.oid)
          | JOIN pg_catalog.pg_type t ON (a.atttypid = t.oid)
          | LEFT JOIN pg_catalog.pg_attrdef def ON (a.attrelid=def.adrelid AND a.attnum = def.adnum)
          | LEFT JOIN pg_catalog.pg_description dsc ON (c.oid=dsc.objoid AND a.attnum = dsc.objsubid)
          | LEFT JOIN pg_catalog.pg_class dc ON (dc.oid=dsc.classoid AND dc.relname='pg_description')
          | LEFT JOIN pg_catalog.pg_namespace dn ON (dc.relnamespace=dn.oid AND dn.nspname='pg_catalog')
          | WHERE c.relkind in ('r','p','v','f','m') and a.attnum > 0 AND NOT a.attisdropped ) c
          | WHERE true AND c.relname LIKE E'jdbcflow_c' ORDER BY nspname,c.relname,attnum""".stripMargin)
      assert(!r.exists(_._1 == 'E'),
        s"getColumns query must run: ${new String(r.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8)}")
      val got = c.rows(r)
      assert(got.map(_(2)) === Seq("id", "txt"), s"column names, got $got")
      assert(got.map(_(3)) === Seq("23", "1043"), "atttypid int4 + varchar")
      assert(got.map(_(7)) === Seq("1", "2"), "1-based attnum ordinals")
    } finally TestSpark.spark.sql("DROP VIEW IF EXISTS jdbcflow_c")
  }

  test("DatabaseMetaData.getPrimaryKeys corpus query (expandarray) runs empty") {
    withClient { c =>
      val r = c.oneShot(
        """SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, ct.relname AS TABLE_NAME,
          | a.attname AS COLUMN_NAME, (i.keys).n AS KEY_SEQ, ci.relname AS PK_NAME
          | FROM pg_catalog.pg_class ct
          | JOIN pg_catalog.pg_attribute a ON (ct.oid = a.attrelid)
          | JOIN pg_catalog.pg_namespace n ON (ct.relnamespace = n.oid)
          | JOIN (SELECT i.indexrelid, i.indrelid, i.indisprimary,
          |              information_schema._pg_expandarray(i.indkey) AS keys
          |       FROM pg_catalog.pg_index i) i
          |   ON (a.attnum = (i.keys).x AND a.attrelid = i.indrelid)
          | JOIN pg_catalog.pg_class ci ON (ci.oid = i.indexrelid)
          | WHERE true AND ct.relname = E'lineitem' AND i.indisprimary
          | ORDER BY table_name, pk_name, key_seq""".stripMargin)
      assert(!r.exists(_._1 == 'E'),
        s"getPrimaryKeys query must run: ${new String(r.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8)}")
      // Spark tables declare no PKs — truthfully zero rows, but the query
      // itself (SRF expansion + composite access) must execute
      assert(c.rows(r).isEmpty)
      assert(c.commandTags(r).head === "SELECT 0")
    }
  }

  test("executeBatch: pipelined Bind/Execute rounds under one Sync") {
    // pgjdbc's addBatch/executeBatch sends Parse once, then one Bind+Execute
    // per batch row, and a SINGLE Sync at the end — the whole batch rides in
    // one network write (PgJdbcSuite's batch-insert path in the reference).
    // Every round must answer BindComplete + CommandComplete, with exactly
    // one ReadyForQuery at the end, and an error in round k must skip the
    // remaining rounds until Sync (pgjdbc surfaces BatchUpdateException).
    withClient { c =>
      c.send('Q', c.cstr("DROP TABLE IF EXISTS jdbc_batch_t"))
      c.drainUntilReady()
      val created = c.oneShot(
        "CREATE TABLE jdbc_batch_t (id INT, name STRING) USING parquet")
      assert(!created.exists(_._1 == 'E'),
        new String(created.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8))
      try {
        c.parse("S_ins", "INSERT INTO jdbc_batch_t VALUES ($1, $2)", Seq(23, 1043))
        c.describeStatement("S_ins")
        val batch = Seq("1" -> "alpha", "2" -> "beta", "3" -> "gamma", "4" -> "delta")
        batch.foreach { case (id, name) =>
          c.bind("", "S_ins", Seq(id, name))
          c.execute("", 1) // pgjdbc passes its fetchSize; commands ignore it
        }
        val r = c.sync()
        assert(!r.exists(_._1 == 'E'),
          s"batch must succeed: ${new String(r.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8)}")
        // 1 ParseComplete, ParameterDescription + NoData for the Describe,
        // then per round BindComplete + CommandComplete, one ReadyForQuery
        assert(c.types(r) === "1tn" + "2C" * batch.size + "Z")
        assert(c.paramOids(r) === Seq(23, 1043))
        val tags = c.commandTags(r)
        assert(tags.size === batch.size)
        // real written-row counts in the tag — pgjdbc's executeBatch builds
        // its update-count array from these
        assert(tags === Seq.fill(batch.size)("INSERT 0 1"), tags.toString)
        // the rows actually landed, in executable order
        val check = c.oneShot("SELECT id, name FROM jdbc_batch_t ORDER BY id")
        assert(c.rows(check) ===
          Seq(Seq("1", "alpha"), Seq("2", "beta"), Seq("3", "gamma"), Seq("4", "delta")))
        // error mid-batch: pipelined frames after the failure are skipped
        // until Sync — exactly one ErrorResponse, no partial execution after
        c.bind("", "S_ins", Seq("5", "epsilon"))
        c.execute("", 1)
        c.bind("", "S_ins", Seq("not_an_int", "zeta"))
        c.execute("", 1)
        c.bind("", "S_ins", Seq("7", "eta"))
        c.execute("", 1)
        val e = c.sync()
        assert(e.count(_._1 == 'E') === 1, c.types(e))
        // round 5 completed before the failure; round 7 was skipped
        val after = c.oneShot("SELECT count(*) AS n FROM jdbc_batch_t WHERE id >= 5")
        assert(c.rows(after) === Seq(Seq("1")))
        c.closeStatement("S_ins"); c.sync()
      } finally {
        c.send('Q', c.cstr("DROP TABLE IF EXISTS jdbc_batch_t"))
        c.drainUntilReady()
      }
    }
  }

  test("EXPLAIN ANALYZE over the extended protocol (DBeaver's explain action)") {
    withClient { c =>
      // GUI clients prepare EXPLAIN ANALYZE like any statement: Describe
      // must answer the one-column QUERY PLAN schema before Execute, and
      // Execute runs the inner statement ($1 binds included) and streams
      // the ran plan with metrics
      c.parse("S_ea", "EXPLAIN ANALYZE SELECT max(id * $1) FROM range(0, 1000, 1, 4)", Seq(23))
      c.describeStatement("S_ea")
      c.bind("", "S_ea", Seq("3"))
      c.execute("", 0)
      val r = c.sync()
      assert(!r.exists(_._1 == 'E'),
        s"EA must prepare+run: ${new String(r.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8)}")
      assert(c.fields(r).map(_._1) === Seq("QUERY PLAN"))
      val lines = c.rows(r).map(_.head)
      assert(lines.exists(_.contains("HashAggregate")), lines.toString)
      assert(lines.exists(_.contains("numOutputRows=")), lines.toString)
      assert(lines.last.startsWith("Execution Time:"), lines.toString)
      assert(c.commandTags(r) === Seq("EXPLAIN"))
      c.closeStatement("S_ea"); c.sync()
    }
  }

  test("TypeInfoCache type-lookup query ($1-parameterized, subscripted schemas)") {
    withClient { c =>
      val sql =
        """SELECT typinput='array_in'::regproc as is_array, typtype, typname
          | FROM pg_catalog.pg_type
          | LEFT JOIN (select ns.oid as nspoid, ns.nspname, r.r
          |   from pg_namespace as ns
          |   join (select s.r, (current_schemas(false))[s.r] as nspname
          |         from generate_series(1, array_upper(current_schemas(false), 1)) as s(r)) as r
          |   using ( nspname )
          | ) as sp ON sp.nspoid = typnamespace
          | WHERE typname = $1 ORDER BY sp.r, pg_type.oid DESC LIMIT 1""".stripMargin
      c.parse("S_t", sql, Seq(1043))
      c.describeStatement("S_t")
      c.bind("", "S_t", Seq("int4"))
      c.execute("", 0)
      val r = c.sync()
      assert(!r.exists(_._1 == 'E'),
        s"TypeInfoCache query must run: ${new String(r.find(_._1 == 'E').map(_._2).getOrElse(Array.empty), UTF_8)}")
      assert(c.rows(r) === Seq(Seq("f", "b", "int4")))
      // the named statement is reused for every type lookup
      c.bind("", "S_t", Seq("_int4"))
      c.execute("", 0)
      val r2 = c.sync()
      assert(c.rows(r2) === Seq(Seq("t", "b", "_int4")), "array types report is_array")
      c.closeStatement("S_t"); c.sync()
    }
  }

  // ---- pgjdbc 42.7.x choreography deltas (scripted — the real jar is
  // absent from the offline cache, see VERDICT round-9 item 1). Two flows
  // changed materially between 42.2 and 42.7: the describeOnly round that
  // PgPreparedStatement.getMetaData() issues before any execution, and
  // binary transfer of date/timestamp once the driver has described the
  // statement (42.7 enables binaryTransfer for those oids by default). ----

  test("42.7 describeOnly: Parse+Describe(S)+Sync yields metadata, no rows") {
    withClient { c =>
      c.parse("S_d7", "SELECT CAST('2021-02-03' AS DATE) AS d, " +
        "CAST('2021-02-03 04:05:06' AS TIMESTAMP) AS ts, 42 AS n")
      c.describeStatement("S_d7")
      val r = c.sync()
      assert(r.exists(_._1 == 't'), "ParameterDescription must answer describeOnly")
      assert(r.exists(_._1 == 'T'), "RowDescription must answer describeOnly")
      assert(!r.exists(_._1 == 'D'), "describeOnly must NOT execute")
      assert(!r.exists(_._1 == 'C'), "describeOnly must NOT complete a command")
      // the driver then executes the SAME prepared statement in a second
      // round — the statement must have survived the Sync
      c.bind("", "S_d7")
      c.execute("", 0)
      val r2 = c.sync()
      assert(c.rows(r2) === Seq(Seq("2021-02-03", "2021-02-03 04:05:06", "42")))
      c.closeStatement("S_d7"); c.sync()
    }
  }

  test("42.7 binary dates: second-execution binary result formats decode " +
    "to the first execution's text values") {
    withClient { c =>
      val sql = "SELECT CAST('1999-12-31' AS DATE) AS d, " +
        "CAST('2004-10-19 10:23:54' AS TIMESTAMP) AS ts"
      c.parse("S_b7", sql)
      c.describeStatement("S_b7")
      // first execution: all-text (pgjdbc's behavior before it has seen
      // the row description)
      c.bind("", "S_b7")
      c.execute("", 0)
      val text = c.rows(c.sync()).head
      assert(text === Seq("1999-12-31", "2004-10-19 10:23:54"))
      // second execution: 42.7 marks date/timestamp oids binary-capable
      // and sends per-column result format 1
      c.bind("", "S_b7", Nil, resultFormats = Seq(1, 1))
      c.execute("", 0)
      val r = c.sync()
      val row = r.find(_._1 == 'D').map(_._2).getOrElse(fail("no DataRow"))
      val b = java.nio.ByteBuffer.wrap(row)
      assert(b.getShort === 2)
      // binary DATE: int32 days since 2000-01-01 (PG epoch)
      assert(b.getInt === 4)
      val days = b.getInt
      assert(java.time.LocalDate.of(2000, 1, 1).plusDays(days.toLong)
        === java.time.LocalDate.parse("1999-12-31"), s"binary date days=$days")
      // binary TIMESTAMP: int64 micros since 2000-01-01 00:00:00
      assert(b.getInt === 8)
      val micros = b.getLong
      val ts = java.time.LocalDateTime.of(2000, 1, 1, 0, 0)
        .plusNanos(micros * 1000L)
      assert(ts === java.time.LocalDateTime.parse("2004-10-19T10:23:54"),
        s"binary timestamp micros=$micros")
      c.closeStatement("S_b7"); c.sync()
    }
  }

  test("42.7 startup: extra_float_digits=3 parameter set is accepted") {
    // 42.7 raised its default extra_float_digits from 2 to 3 for 9.0+
    // servers; the startup GUC must seed without error and the session
    // must answer queries normally afterwards
    val c = new Jdbc42Client
    val msgs = c.connect(extraFloatDigits = "3")
    try {
      assert(msgs.exists(_._1 == 'Z'), "startup must reach ReadyForQuery")
      assert(!msgs.exists(_._1 == 'E'), "startup must not error")
      c.parse("", "SELECT 1 AS one")
      c.bind("", "")
      c.execute("", 0)
      assert(c.rows(c.sync()) === Seq(Seq("1")))
    } finally c.close()
  }
}
