package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hive-format table support (reference SSP:359-657 visitCreateHiveTable):
  * the server boots Hive-enabled in the reference; here we prove the same
  * capability on Spark 4 with a local derby metastore — CREATE TABLE
  * STORED AS, INSERT, partitioned writes, read-back.
  */
class HiveFormatSuite extends AnyFunSuite {

  private lazy val hive: Option[SparkSession] =
    try {
      // getOrCreate would reuse the suite-wide in-memory-catalog session;
      // clear the defaults so the builder creates a fresh SparkSession (and
      // SharedState) with the hive catalog on the shared context.
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val wh = java.nio.file.Files.createTempDirectory("graft_hive_wh").toString
      val s =
        try SparkSession.builder()
          .master("local[4]")
          .appName("graft-hive")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.warehouse.dir", wh)
          .config("javax.jdo.option.ConnectionURL",
            s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
          .config("spark.ui.enabled", "false")
          .enableHiveSupport()
          .getOrCreate()
        finally {
          prevDefault.foreach(SparkSession.setDefaultSession)
          prevActive.foreach(SparkSession.setActiveSession)
        }
      s.sql("SELECT 1").collect() // force session init
      assume(s.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive")
      Some(s)
    } catch { case _: Throwable => None }

  test("CREATE TABLE ... STORED AS PARQUET + INSERT + read back") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    s.sql("DROP TABLE IF EXISTS hfmt")
    s.sql("CREATE TABLE hfmt (k INT, v STRING) STORED AS PARQUET")
    s.sql("INSERT INTO hfmt VALUES (1, 'a'), (2, 'b')")
    val rows = s.sql("SELECT k, v FROM hfmt ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((1, "a"), (2, "b")))
  }

  test("Hive UDTF via CREATE TEMPORARY FUNCTION + LATERAL VIEW") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    s.sql("CREATE OR REPLACE TEMPORARY FUNCTION explode_words AS " +
      "'graft.functions.ExplodeWordsUDTF'")
    val rows = s.sql(
      "SELECT w FROM (SELECT 'spark sql server' AS t) LATERAL VIEW explode_words(t) e AS w ORDER BY w")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("server", "spark", "sql"))
  }

  test("TRUNCATE TABLE empties a managed table") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    s.sql("DROP TABLE IF EXISTS htrunc")
    s.sql("CREATE TABLE htrunc (k INT) STORED AS PARQUET")
    s.sql("INSERT INTO htrunc VALUES (1), (2)")
    assert(s.table("htrunc").count() === 2)
    s.sql("TRUNCATE TABLE htrunc")
    assert(s.table("htrunc").count() === 0)
  }

  test("FROM-first multi-insert writes two tables in one statement") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    s.sql("DROP TABLE IF EXISTS mi_a")
    s.sql("DROP TABLE IF EXISTS mi_b")
    s.sql("CREATE TABLE mi_a (k INT) STORED AS PARQUET")
    s.sql("CREATE TABLE mi_b (k INT) STORED AS PARQUET")
    s.sql("CREATE OR REPLACE TEMPORARY VIEW mi_src AS SELECT explode(sequence(1, 10)) AS k")
    s.sql("""FROM mi_src
             INSERT INTO mi_a SELECT k WHERE k <= 3
             INSERT INTO mi_b SELECT k WHERE k > 8""")
    assert(s.table("mi_a").count() === 3)
    assert(s.table("mi_b").count() === 2)
  }

  test("LOAD DATA LOCAL INPATH into a text-format table") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    val f = java.nio.file.Files.createTempFile("graft_load", ".txt")
    java.nio.file.Files.write(f, "11one\n21two\n".getBytes("UTF-8"))
    s.sql("DROP TABLE IF EXISTS hload")
    s.sql("CREATE TABLE hload (k INT, v STRING) STORED AS TEXTFILE")
    s.sql(s"LOAD DATA LOCAL INPATH '${f.toAbsolutePath}' INTO TABLE hload")
    assert(s.sql("SELECT k FROM hload ORDER BY k").collect().map(_.getInt(0)).toSeq
      === Seq(1, 2))
    // OVERWRITE replaces rather than appends
    val f2 = java.nio.file.Files.createTempFile("graft_load2", ".txt")
    java.nio.file.Files.write(f2, "91nine\n".getBytes("UTF-8"))
    s.sql(s"LOAD DATA LOCAL INPATH '${f2.toAbsolutePath}' OVERWRITE INTO TABLE hload")
    assert(s.sql("SELECT k FROM hload").collect().map(_.getInt(0)).toSeq === Seq(9))
  }

  test("MSCK REPAIR TABLE discovers partitions added outside the metastore") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    val loc = java.nio.file.Files.createTempDirectory("graft_msck").toString
    s.sql("DROP TABLE IF EXISTS hmsck")
    s.sql(s"CREATE EXTERNAL TABLE hmsck (v STRING) PARTITIONED BY (day STRING) " +
      s"STORED AS PARQUET LOCATION '$loc'")
    // write a partition directory directly to storage, bypassing the metastore
    import s.implicits._
    Seq("x", "y").toDF("v").write.parquet(s"$loc/day=2024-02-01")
    assert(s.sql("SHOW PARTITIONS hmsck").count() === 0)
    s.sql("MSCK REPAIR TABLE hmsck")
    assert(s.sql("SHOW PARTITIONS hmsck").collect().map(_.getString(0)).toSeq
      === Seq("day=2024-02-01"))
    assert(s.sql("SELECT v FROM hmsck WHERE day='2024-02-01' ORDER BY v")
      .collect().map(_.getString(0)).toSeq === Seq("x", "y"))
  }

  test("DELETE/UPDATE/MERGE parse; v1 tables reject at analysis (like the reference)") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    s.sql("DROP TABLE IF EXISTS hdml")
    s.sql("CREATE TABLE hdml (k INT, v STRING) STORED AS PARQUET")
    val parser = s.sessionState.sqlParser
    // the reference only parses these (AB:358-475); execution needs a v2
    // source with ACID support, so the v1 path must fail at ANALYSIS with a
    // clear error, not at parse
    Seq(
      "DELETE FROM hdml WHERE k = 1",
      "UPDATE hdml SET v = 'z' WHERE k = 1",
      """MERGE INTO hdml t USING (SELECT 1 AS k, 'a' AS v) s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""").foreach { sql =>
      parser.parsePlan(sql) // must not throw
      // Spark 4 rejects with AnalysisException for DELETE but
      // SparkUnsupportedOperationException for UPDATE/MERGE — both carry a
      // SQLSTATE via SparkThrowable, so intercept the common interface.
      val e = intercept[Throwable with org.apache.spark.SparkThrowable](s.sql(sql))
      assert(e.getMessage.toUpperCase.contains("SUPPORT"), s"unexpected error for: $sql")
    }
  }

  test("Hive TRANSFORM: delimited script form executes; serde form parses with hive") {
    // the reference parses TRANSFORM then rejects it at execution
    // (AB:575-581,631-679); Spark 4 exceeds that: the default
    // ROW FORMAT DELIMITED script transform actually runs
    val s = TestSpark.spark
    val out = s.sql("SELECT TRANSFORM(id) USING 'cat' AS (out STRING) FROM range(3)")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out === Seq("0", "1", "2"))
    // the SERDE form requires hive support to even parse. The parser reads
    // the catalog implementation through the SHARED SparkContext conf, and
    // enableHiveSupport (any earlier hive.get use in this suite) writes
    // "hive" there for the whole JVM — so the non-hive rejection is only
    // observable before that. Running the suite alone exposed the order
    // dependence; assert rejection only while the context is hive-free.
    if (s.sparkContext.getConf
        .get("spark.sql.catalogImplementation", "in-memory") != "hive") {
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s.sessionState.sqlParser.parsePlan(
          """SELECT TRANSFORM(a) ROW FORMAT SERDE
            'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe'
            USING 'cat' AS (out STRING) FROM t""")
      }
    }
    assume(hive.isDefined, "hive support unavailable in this environment")
    // in hive mode the serde form gets PAST parsing (sql() sets the active
    // session, which the parser's hive-mode check reads): failure moves to
    // analysis on the nonexistent table
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      hive.get.sql(
        """SELECT TRANSFORM(a) ROW FORMAT SERDE
          'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe'
          USING 'cat' AS (out STRING) FROM graft_no_such_table""")
    }
    assert(e.getErrorClass.contains("TABLE_OR_VIEW_NOT_FOUND"), e.getMessage)
  }

  test("partitioned Hive table with static partition insert") {
    assume(hive.isDefined, "hive support unavailable in this environment")
    val s = hive.get
    s.sql("DROP TABLE IF EXISTS hpart")
    s.sql("CREATE TABLE hpart (v STRING) PARTITIONED BY (day STRING) STORED AS PARQUET")
    s.sql("INSERT INTO hpart PARTITION (day='2024-01-01') VALUES ('x')")
    s.sql("INSERT INTO hpart PARTITION (day='2024-01-02') VALUES ('y')")
    assert(s.sql("SHOW PARTITIONS hpart").count() === 2)
    // partition pruning: only one partition scanned
    val one = s.sql("SELECT v FROM hpart WHERE day = '2024-01-02'")
    assert(one.collect().map(_.getString(0)).toSeq === Seq("y"))
    val scan = one.queryExecution.executedPlan.toString
    assert(!scan.contains("2024-01-01"), "pruned partition must not appear in the scan")
  }
}
