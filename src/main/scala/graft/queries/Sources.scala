package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format round-trips beyond parquet (q77): CSV, JSON (incl. a
  * nested struct), and ORC, each written from the driver tables, read back
  * through the format's own reader, and aggregated to a DuckDB-oracle-exact
  * result computed over the ORIGINAL parquet — proving the write+read path
  * loses nothing. The reference serves any Spark-readable format the same
  * way (its SQL layer delegates scans to Spark); these entries pin that
  * capability with value-level checks.
  *
  * Only bigint/double columns cross the text formats (CSV/JSON): Java
  * double text round-trips bit-exactly, while timestamp text formats are
  * engine-config-dependent — the columnar ORC entry carries the timestamp.
  */
object Sources {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  val entries: Seq[QE] = Seq(
    // CSV: header + explicit read schema (no inference pass — schema
    // inference is a second full scan at 100 TB and type-guesses).
    QE("q86_csv_roundtrip", Some("""
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice > 300000
      GROUP BY o_custkey ORDER BY o_custkey"""),
      (s, d) => {
        val dir = tmp("graft_csv")
        Tables.df(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite").option("header", "true").csv(dir)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
          StructField("o_totalprice", DoubleType)))
        s.read.schema(schema).option("header", "true").csv(dir)
          .filter(col("o_totalprice") > 300000)
          .groupBy("o_custkey")
          .agg(Q.dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
          .orderBy("o_custkey")
      }),

    // JSON with a NESTED struct: the measure round-trips inside a struct
    // field and is re-extracted after read — the semi-structured path.
    QE("q87_json_roundtrip", Some("""
      SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM lineitem WHERE l_quantity >= 25
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => {
        val dir = tmp("graft_json")
        Tables.df(s, d, "lineitem")
          .select(col("l_returnflag"),
            struct(col("l_quantity").as("qty"), col("l_extendedprice").as("price")).as("m"))
          .write.mode("overwrite").json(dir)
        s.read.schema("l_returnflag STRING, m STRUCT<qty: DOUBLE, price: DOUBLE>")
          .json(dir)
          .filter(col("m.qty") >= 25)
          .groupBy("l_returnflag")
          .agg(Q.dsum(col("m.price")).as("total"), count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      }),

    // ORC: the other columnar format — carries the timestamp column and
    // keeps predicate pushdown + column pruning at the scan (same posture
    // as the parquet entries).
    QE("q88_orc_roundtrip", Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY yr ORDER BY yr"""),
      (s, d) => {
        val dir = tmp("graft_orc")
        Tables.df(s, d, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
          .write.mode("overwrite").orc(dir)
        s.read.orc(dir)
          .filter(col("o_orderstatus") === "F")
          .groupBy(year(col("o_orderdate")).cast(IntegerType).as("yr"))
          .agg(Q.dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
          .orderBy("yr")
      }),

    // Hive-style partitioned layout + partition PRUNING — the data-layout
    // lever that matters most at 100 TB: orders written partitioned by
    // order year, read back with a year predicate that must resolve at
    // PLANNING time (the scan's PartitionFilters) so non-matching
    // directories are never listed, opened, or read. The oracle applies
    // the same year filter to the original parquet — proving the
    // partition column round-trips losslessly through the directory
    // encoding. QueriesSmokeSuite pins the pruning itself (partition
    // count in the executed scan).
    QE("q159_partition_pruning", Some("""
      SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY mon ORDER BY mon"""),
      (s, d) => {
        val dir = partitionedOrdersDir(s, d)
        s.read.parquet(dir)
          .filter(col("yr") === 1997)
          .groupBy(month(col("o_orderdate")).cast(IntegerType).as("mon"))
          .agg(Q.dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
          .orderBy("mon")
      }),

    // Multi-format federation: ONE plan unions a CSV source (1996 slice)
    // with an ORC source (1997 slice) and aggregates across both — the
    // lakehouse reality where history and fresh data live in different
    // formats. Each branch's filter/pruning runs in its own format reader;
    // the union is zero-cost (no shuffle) and the aggregate shuffles the
    // combined partials once.
    QE("q183_multi_format_union", Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1 ORDER BY yr"""),
      (s, d) => {
        def slice(y: Int) = Tables.df(s, d, "orders")
          .filter(year(col("o_orderdate")) === y)
          .select(col("o_orderkey"), col("o_totalprice"),
            lit(y).cast(IntegerType).as("yr"))
        val csvDir = tmp("graft_fed_csv")
        slice(1996).write.mode("overwrite").option("header", "true").csv(csvDir)
        val orcDir = tmp("graft_fed_orc")
        slice(1997).write.mode("overwrite").orc(orcDir)
        val csvSchema = StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType),
          StructField("yr", IntegerType)))
        s.read.schema(csvSchema).option("header", "true").csv(csvDir)
          .unionByName(s.read.orc(orcDir))
          .groupBy("yr")
          .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("total"))
          .orderBy("yr")
      }),

    // DYNAMIC partition overwrite: rewrite ONLY the partitions present in
    // the incoming batch (here the 'click' slice, values doubled), leaving
    // sibling partitions untouched — the idempotent daily-restatement
    // pattern for partitioned 100 TB tables (static mode would wipe the
    // whole table root; blind append would duplicate the restated day).
    // The read-back proves exactly one partition changed. Doubling an
    // exact 2-decimal double is exact, so the oracle reproduces the
    // restated values bit-for-bit.
    QE("q218_dynamic_partition_overwrite", Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(12,2)) * 2
                    ELSE CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS total
      FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, d) => {
        val ev = Tables.df(s, d, "events")
          .select(col("event_id"), col("value"), col("event_type"))
        val dir = tmp("graft_dpo")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
        val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite").partitionBy("event_type").parquet(dir)
        finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        s.read.parquet(dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total"))
          .orderBy("event_type")
      }),

    // MALFORMED-CSV handling: a seventh of the lines are garbage. The two
    // survivable read postures, contrasted in one output: PERMISSIVE keeps
    // every line and captures the raw text of bad ones in the corrupt
    // column (audit path), DROPMALFORMED silently sheds them (throughput
    // path). FAILFAST — the third mode — is what a 100 TB ingest must NOT
    // run with. Oracle: the same %7 rule computed relationally.
    QE("q237_csv_malformed", Some("""
      WITH src AS (SELECT o_orderkey, o_totalprice,
                          CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS bad
                   FROM orders WHERE o_orderkey < 2000)
      SELECT 'dropmalformed' AS mode, COUNT(*) AS n,
             CAST(SUM(CASE WHEN bad = 0 THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                  AS DOUBLE) AS total
      FROM src WHERE bad = 0
      UNION ALL
      SELECT 'permissive_corrupt', CAST(SUM(bad) AS BIGINT), NULL
      FROM src
      ORDER BY mode"""),
      (s, d) => {
        val dir = tmp("graft_badcsv")
        Tables.df(s, d, "orders").filter(col("o_orderkey") < 2000)
          // malformed = a field whose TYPE CONVERSION fails (a short line
          // merely gets null-padded, which Spark does not count as
          // malformed — pinned here by using unparseable tokens instead)
          .select(when(col("o_orderkey") % 7 === 0,
              concat(lit("X"), col("o_orderkey"), lit(",YBAD")))
            .otherwise(concat_ws(",", col("o_orderkey"), col("o_totalprice")))
            .as("value"))
          .write.mode("overwrite").text(dir)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType),
          StructField("_corrupt", StringType)))
        val permissive = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(dir)
        val dropped = s.read.schema(StructType(schema.fields.dropRight(1)))
          .option("mode", "DROPMALFORMED")
          .csv(dir)
        dropped.agg(lit("dropmalformed").as("mode"), count(lit(1)).as("n"),
            Q.dsum(col("o_totalprice")).as("total"))
          // the scan must reference a data column next to the corrupt one
          // (Spark disallows corrupt-column-only queries on raw files)
          .unionByName(permissive.agg(lit("permissive_corrupt").as("mode"),
            count(when(col("_corrupt").isNotNull && col("o_orderkey").isNull, 1))
              .as("n"),
            lit(null).cast(DoubleType).as("total")))
          .orderBy("mode")
      }),

    // Line-oriented TEXT source: the rawest ingestion format (log files,
    // one-doc-per-line dumps) — write the corpus as text, read it back as
    // `value` lines, recompute lengths. The driver corpus is newline-free
    // so lines round-trip 1:1; a real log pipeline would follow this scan
    // with the same parsing expressions (split/regexp) the other entries
    // exercise. Oracle: the same profile straight off the table.
    QE("q232_text_source", Some("""
      SELECT length(text) AS len, COUNT(*) AS n
      FROM documents GROUP BY len ORDER BY len"""),
      (s, d) => {
        val dir = tmp("graft_text")
        Tables.df(s, d, "documents").select(col("text"))
          .write.mode("overwrite").text(dir)
        s.read.text(dir)
          .groupBy(length(col("value")).cast(LongType).as("len"))
          .agg(count(lit(1)).as("n"))
          .orderBy("len")
      }),

    // SCHEMA EVOLUTION on a parquet directory: v1 files carry (custkey,
    // total), later v2 files add a `channel` column; `mergeSchema` unifies
    // the footprints and v1 rows surface NULL channel — the lakehouse
    // reality where a 100 TB table's schema widens mid-life and old files
    // are never rewritten. (mergeSchema costs a footer read per file at
    // planning; production pins the merged schema in a metastore instead —
    // the read-side semantics are what is exercised here.) Oracle: the
    // same union with explicit NULL padding.
    QE("q229_schema_evolution", Some("""
      WITH v1 AS (SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS total,
                         CAST(NULL AS VARCHAR) AS channel
                  FROM orders WHERE o_orderkey % 2 = 0),
      v2 AS (SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS total,
                    CASE WHEN o_orderkey % 4 = 1 THEN 'web' ELSE 'store' END AS channel
             FROM orders WHERE o_orderkey % 2 = 1)
      SELECT channel, COUNT(*) AS n,
             CAST(SUM(CAST(total AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
      GROUP BY channel ORDER BY channel NULLS FIRST"""),
      (s, d) => {
        val dir = tmp("graft_evo")
        val o = Tables.df(s, d, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_custkey"), col("o_totalprice").as("total"))
          .write.mode("overwrite").parquet(s"$dir/v=1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_custkey"), col("o_totalprice").as("total"),
            when(col("o_orderkey") % 4 === 1, "web").otherwise("store").as("channel"))
          .write.mode("overwrite").parquet(s"$dir/v=2")
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy("channel")
          .agg(count(lit(1)).as("n"), Q.dsum(col("total")).as("total"))
          .orderBy(col("channel").asc_nulls_first)
      }),

    // JDBC source AND sink (embedded Derby — the only RDBMS in this
    // environment): write a projected slice out over JDBC, read it back
    // with a predicate that must reach the remote side as a pushed-down
    // WHERE (the JDBC reader ships filters; .explain shows PushedFilters),
    // then aggregate in Spark. At scale the same path partitions the read
    // by a numeric column (partitionColumn/num Partitions) so each executor
    // opens its own cursor slice; a single embedded cursor is the test
    // stand-in. Oracle: the equivalent relational pipeline.
    QE("q222_jdbc_roundtrip", Some("""
      SELECT o_custkey, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE o_totalprice > 200000.0
      GROUP BY o_custkey ORDER BY o_custkey"""),
      (s, d) => {
        val db = tmp("graft_jdbc") + "/ordersdb"
        val url = s"jdbc:derby:$db;create=true"
        Tables.df(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.mode("overwrite")
          .format("jdbc").option("url", url)
          .option("dbtable", "ORDERS_SLICE")
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          // the sf1 scale-up run flagged this entry 14.6x at 10x data; a
          // 10x executeBatch was A/B-measured and did NOT move it (20.1s ->
          // 19.7s): embedded Derby's logged btree insert is the floor, not
          // JDBC round trips. Kept at 10000 as the correct client posture;
          // the real scale answer (BENCH_LOCAL.md) is that JDBC sinks are
          // for dimension-sized exports, never fact mass.
          .option("batchsize", "10000")
          .save()
        s.read.format("jdbc").option("url", url)
          .option("dbtable", "ORDERS_SLICE")
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          .load()
          .filter(col("o_totalprice") > 200000.0)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("total"))
          .orderBy("o_custkey")
      }))

  /** One partitioned copy of orders per (session, source dir) — the write
    * is layout setup, not the measured operation (same reasoning as q46's
    * bucketed DDL running untimed in Bench's warmup).
    */
  private val partitionedDirs =
    java.util.Collections.synchronizedMap(
      new java.util.HashMap[String, String]())

  private[graft] def partitionedOrdersDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    partitionedDirs.synchronized {
      partitionedDirs.computeIfAbsent(d, { _ =>
        val dir = tmp("graft_part")
        Tables.df(s, d, "orders")
          .withColumn("yr", year(col("o_orderdate")))
          .write.mode("overwrite").partitionBy("yr").parquet(dir)
        dir
      })
    }
}
