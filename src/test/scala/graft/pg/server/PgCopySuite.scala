package graft.pg.server

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.sys.process._

import graft.TestSpark

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** COPY subprotocol end-to-end through real psql `\copy` (the reference
  * decodes these messages but throws "Not supported yet",
  * protocol.scala:679-698 — here both directions work), plus unit coverage
  * of the statement/format parsers.
  */
class PgCopySuite extends AnyFunSuite with BeforeAndAfterAll {

  private var server: PgWireServer = _
  private def port: Int = server.boundPort

  override def beforeAll(): Unit = {
    server = new PgWireServer(TestSpark.spark, port = 0)
    server.start()
    TestSpark.spark.sql("DROP TABLE IF EXISTS copy_t")
    TestSpark.spark.sql("CREATE TABLE copy_t (k INT, v STRING, d DOUBLE) USING parquet")
  }

  override def afterAll(): Unit = {
    TestSpark.spark.sql("DROP TABLE IF EXISTS copy_t")
    if (server != null) server.stop()
  }

  private def psql(cmd: String): String =
    Seq("psql", s"host=127.0.0.1 port=$port dbname=default user=graft",
      "-At", "-c", cmd).!!.trim

  test("\\copy FROM text format round-trips incl. NULL and escapes") {
    val f = Files.createTempFile("copy_in", ".tsv")
    Files.write(f, "1\talpha\t1.5\n2\t\\N\t2.5\n3\twith\\ttab\t\\N\n".getBytes(UTF_8))
    val tag = psql(s"\\copy copy_t from ${f.toString}")
    assert(tag === "COPY 3")
    assert(psql("SELECT count(*) FROM copy_t WHERE v IS NULL") === "1")
    assert(psql("SELECT count(*) FROM copy_t WHERE d IS NULL") === "1")
    assert(psql("SELECT v FROM copy_t WHERE k = 3") === "with\ttab")
    Files.delete(f)
  }

  test("\\copy FROM csv with header and quoted fields") {
    psql("TRUNCATE TABLE copy_t")
    val f = Files.createTempFile("copy_in", ".csv")
    Files.write(f,
      "k,v,d\n10,\"hello, world\",0.5\n11,\"say \"\"hi\"\"\",\n".getBytes(UTF_8))
    val tag = psql(s"\\copy copy_t from ${f.toString} with (format csv, header true)")
    assert(tag === "COPY 2")
    assert(psql("SELECT v FROM copy_t WHERE k = 10") === "hello, world")
    assert(psql("SELECT v FROM copy_t WHERE k = 11") === "say \"hi\"")
    assert(psql("SELECT count(*) FROM copy_t WHERE d IS NULL") === "1")
  }

  test("COPY table TO STDOUT streams text format with \\N nulls") {
    psql("TRUNCATE TABLE copy_t")
    psql("INSERT INTO copy_t VALUES (1, 'a', 1.5), (2, NULL, 2.5)")
    val out = Seq("psql", s"host=127.0.0.1 port=$port dbname=default user=graft",
      "-c", "COPY (SELECT * FROM copy_t ORDER BY k) TO STDOUT").!!
    assert(out === "1\ta\t1.5\n2\t\\N\t2.5\n")
  }

  test("COPY (query) TO STDOUT csv renders booleans/quotes PG-style") {
    val out = Seq("psql", s"host=127.0.0.1 port=$port dbname=default user=graft",
      "-c", "COPY (SELECT 1 AS a, true AS b, 'x,y' AS c) TO STDOUT WITH (FORMAT csv)").!!
    assert(out === "1,t,\"x,y\"\n")
  }

  test("COPY FROM a server-side file rejects with a clear error") {
    val r = Seq("psql", s"host=127.0.0.1 port=$port dbname=default user=graft",
      "-At", "-c", "COPY copy_t FROM '/etc/passwd'").!(ProcessLogger(_ => ()))
    assert(r != 0)
    assert(psql("SELECT 1") === "1") // connection path still healthy
  }

  test("statement parser handles the COPY grammar") {
    import PgCopy._
    assert(parse("SELECT 1").isEmpty)
    assert(parse("COPY t FROM STDIN") ===
      Some(CopyIn("t", Nil, CopyOptions())))
    assert(parse("copy t (a, b) from stdin with csv header") ===
      Some(CopyIn("t", Seq("a", "b"),
        CopyOptions(csv = true, delimiter = ',', nullStr = "", header = true))))
    assert(parse("COPY t TO STDOUT (FORMAT csv, DELIMITER ';', NULL 'nil')") ===
      Some(CopyOut(Left("t"), Nil,
        CopyOptions(csv = true, delimiter = ';', nullStr = "nil"))))
    assert(parse("COPY (SELECT a FROM t WHERE x > 1) TO STDOUT") ===
      Some(CopyOut(Right("SELECT a FROM t WHERE x > 1"), Nil, CopyOptions())))
    intercept[IllegalArgumentException](parse("COPY t FROM 'file.csv'"))
  }

  test("COPY binary round-trips typed rows incl. numeric, timestamp, NULLs") {
    psql("DROP TABLE IF EXISTS copy_bin")
    psql("DROP TABLE IF EXISTS copy_bin2")
    psql("CREATE TABLE copy_bin (k INT, v STRING, d DOUBLE, " +
      "ts TIMESTAMP, n DECIMAL(10,2)) USING parquet")
    psql("CREATE TABLE copy_bin2 (k INT, v STRING, d DOUBLE, " +
      "ts TIMESTAMP, n DECIMAL(10,2)) USING parquet")
    psql("INSERT INTO copy_bin VALUES " +
      "(1, 'alpha', 1.5, TIMESTAMP '2024-03-01 12:34:56.789012', 1234.56), " +
      "(2, NULL, NULL, NULL, NULL), " +
      "(3, 'utf8 é', -0.25, TIMESTAMP '1999-12-31 23:59:59', -0.01)")
    val f = Files.createTempFile("copy_bin", ".pgb")
    val tagOut = psql(s"\\copy (SELECT * FROM copy_bin ORDER BY k) to ${f.toString} with (format binary)")
    assert(tagOut === "COPY 3")
    // the file must open with the PGCOPY signature
    val head = Files.readAllBytes(f).take(11)
    assert(head.toSeq === "PGCOPY\n".getBytes(UTF_8).toSeq ++ Seq(0xFF.toByte, '\r'.toByte, '\n'.toByte, 0x00.toByte))
    val tagIn = psql(s"\\copy copy_bin2 from ${f.toString} with (format binary)")
    assert(tagIn === "COPY 3")
    val before = psql("SELECT k, v, d, ts, n FROM copy_bin ORDER BY k")
    val after = psql("SELECT k, v, d, ts, n FROM copy_bin2 ORDER BY k")
    assert(after === before)
    assert(before.contains("1234.56") && before.contains("12:34:56.789012"))
    psql("DROP TABLE copy_bin"); psql("DROP TABLE copy_bin2")
    Files.deleteIfExists(f)
  }

  test("binary copy-in parser survives arbitrary frame splits") {
    TestSpark.spark.sql("DROP TABLE IF EXISTS copy_bin_chunk")
    TestSpark.spark.sql(
      "CREATE TABLE copy_bin_chunk (k INT, n DECIMAL(10,2)) USING parquet")
    try {
      // build a binary stream: header + 3 tuples + trailer
      val bb = java.nio.ByteBuffer.allocate(1024)
      bb.put(PgCopy.BinaryCopy.header)
      def tuple(k: Int, n: Option[String]): Unit = {
        bb.putShort(2)
        bb.putInt(4); bb.putInt(k)
        n match {
          case Some(s) =>
            val enc = graft.pg.wire.PgNumeric.toBytes(new java.math.BigDecimal(s))
            bb.putInt(enc.length); bb.put(enc)
          case None => bb.putInt(-1)
        }
      }
      tuple(1, Some("10.50")); tuple(2, None); tuple(3, Some("-99.99"))
      bb.put(PgCopy.BinaryCopy.Trailer)
      bb.flip()
      val stream = new Array[Byte](bb.remaining()); bb.get(stream)
      // feed in pathological 3-byte chunks: tuples span frames
      val st = new PgCopy.CopyInSession(TestSpark.spark,
        PgCopy.CopyIn("copy_bin_chunk", Nil, PgCopy.CopyOptions(binary = true)))
      stream.grouped(3).foreach(st.feed)
      assert(st.finish() === 3L)
      val got = TestSpark.spark.sql(
        "SELECT k, n FROM copy_bin_chunk ORDER BY k").collect()
      assert(got.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
      assert(got(0).getDecimal(1).toString === "10.50")
      assert(got(1).isNullAt(1))
      assert(got(2).getDecimal(1).toString === "-99.99")
    } finally TestSpark.spark.sql("DROP TABLE IF EXISTS copy_bin_chunk")
  }

  test("binary format option parsing and conflicts") {
    import PgCopy._
    assert(parse("COPY t FROM STDIN WITH (FORMAT binary)") ===
      Some(CopyIn("t", Nil, CopyOptions(binary = true))))
    assert(parse("COPY t TO STDOUT BINARY") ===
      Some(CopyOut(Left("t"), Nil, CopyOptions(binary = true))))
    intercept[IllegalArgumentException](
      parse("COPY t FROM STDIN WITH (FORMAT binary, HEADER true)"))
    intercept[IllegalArgumentException](
      parse("COPY t FROM STDIN WITH (FORMAT binary, DELIMITER ',')"))
  }

  test("text/csv line parsers: null-before-unescape semantics") {
    assert(PgCopy.parseTextLine("a\t\\N\tb", '\t', "\\N").toSeq === Seq("a", null, "b"))
    // literal backslash-N survives as the two-char string
    assert(PgCopy.parseTextLine("\\\\N", '\t', "\\N").toSeq === Seq("\\N"))
    assert(PgCopy.parseTextLine("x\\ty", '\t', "\\N").toSeq === Seq("x\ty"))
    assert(PgCopy.parseCsvLine("a,,\"\"", ',', "").toSeq === Seq("a", null, ""))
    assert(PgCopy.parseCsvLine("\"a,b\",\"c\"\"d\"", ',', "").toSeq ===
      Seq("a,b", "c\"d"))
  }
}
