package graft.pg

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** pg_catalog emulation: the 17 system tables + 29-row pg_type seed PG
  * clients probe for metadata (reference catalog.scala:87-118,280-379).
  * Registered as session temp views; the wire-server milestone will expose
  * them under a `pg_catalog` database as well.
  */
object PgCatalog {

  /** (oid, typname, typlen, typelem, typinput) — reference catalog.scala:284-316. */
  val pgTypes: Seq[(Int, String, Int, Int, String)] = Seq(
    (16, "bool", 1, 0, "boolin"),
    (17, "bytea", -1, 0, "byteain"),
    (18, "char", 1, 0, "charin"),
    (19, "name", 64, 18, "namein"),
    (20, "int8", 8, 0, "int8in"),
    (21, "int2", 2, 0, "int2in"),
    (23, "int4", 4, 0, "int4in"),
    (27, "tid", 6, 0, "tidin"),
    (700, "float4", 4, 0, "float4in"),
    (701, "float8", 8, 0, "float8in"),
    (1000, "_bool", -1, 16, "array_in"),
    (1005, "_int2", -1, 21, "array_in"),
    (1007, "_int4", -1, 23, "array_in"),
    (1015, "_varchar", -1, 1043, "array_in"),
    (1016, "_int8", -1, 20, "array_in"),
    (1021, "_float4", -1, 700, "array_in"),
    (1022, "_float8", -1, 701, "array_in"),
    (1043, "varchar", -1, 0, "varcharin"),
    (1082, "date", -1, 0, "datein"),
    (1114, "timestamp", 8, 0, "timestampin"),
    (1115, "_timestamp", -1, 1114, "array_in"),
    (1182, "_date", -1, 1082, "array_in"),
    (1186, "interval", -1, 0, "interval_in"),
    (1187, "_interval", -1, 1186, "array_in"),
    (1231, "_numeric", -1, 1700, "array_in"),
    (1700, "numeric", -1, 0, "numericin"),
    (6200, "byte", 1, 0, "bytein"),
    (6201, "map", -1, 0, "mapin"),
    (6202, "struct", -1, 0, "structin"))

  /** Textual type name -> OID for `'name'::regtype` literal resolution
    * (see PgRewrite): the seeded types plus the pseudo-types psql's \df
    * queries compare prorettype against (fixed PG OIDs from pg_type.dat).
    */
  val typeOidByName: Map[String, Int] =
    pgTypes.map { case (oid, name, _, _, _) => name -> oid }.toMap ++ Map(
      "text" -> 25, "oid" -> 26, "record" -> 2249, "cstring" -> 2275,
      "any" -> 2276, "anyarray" -> 2277, "void" -> 2278, "trigger" -> 2279,
      "language_handler" -> 2280, "internal" -> 2281, "anyelement" -> 2283,
      "event_trigger" -> 3838)

  val defaultNamespaceOid = 2200
  val defaultNamespace = "spark"
  val userRoleOid = 10

  /** Fastpath-callable functions (FunctionCall 'F' → FunctionCallResponse):
    * (oid, proname, arg type oids, result type oid). OIDs sit in PG's user
    * range (≥16384); clients discover them by name from pg_proc — the same
    * lookup libpq's large-object fastpath setup performs. The reference
    * decodes the 'F' message but then throws "Not supported yet"
    * (protocol.scala:506-533); here the call executes for real against the
    * session's function registry, so these rows also seed pg_proc (which
    * doubles as real `\df` output).
    */
  val fastpathFunctions: Seq[(Int, String, Seq[Int], Int)] = Seq(
    (16384, "current_schema", Nil, 1043),
    (16385, "pg_backend_pid", Nil, 23),
    (16386, "pg_encoding_to_char", Seq(23), 1043),
    (16387, "pg_get_userbyid", Seq(23), 1043),
    (16388, "format_type", Seq(23, 23), 1043),
    (16389, "pg_table_is_visible", Seq(23), 16),
    (16390, "graft_stat", Seq(1043), 20),
    (16391, "upper", Seq(1043), 1043),
    (16392, "length", Seq(1043), 23),
    (16393, "version", Nil, 1043))

  def fastpathByOid(oid: Int): Option[(String, Seq[Int], Int)] =
    fastpathFunctions.find(_._1 == oid).map(f => (f._2, f._3, f._4))

  def typeNameOf(oid: Int): String =
    pgTypes.find(_._1 == oid).map(_._2).getOrElse("unknown")

  private final case class AttrSnapshot(key: Seq[String], at: Long, rows: Seq[Row])
  private val attrCache = new java.util.concurrent.atomic.AtomicReference[AttrSnapshot]
  private val AttrCacheTtlNanos = 10L * 1000 * 1000 * 1000

  private def emptyView(spark: SparkSession, name: String, ddl: String): Unit =
    spark.createDataFrame(
      new java.util.ArrayList[Row](), StructType.fromDDL(ddl))
      .createOrReplaceTempView(name)

  /** Register all pg_catalog views on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import spark.implicits._

    pgTypes.map { case (oid, name, len, elem, input) =>
      (oid, name, "b", len, false, elem, ",", input, 0, 0, 0, defaultNamespaceOid)
    }.toDF("oid", "typname", "typtype", "typlen", "typnotnull", "typelem",
      "typdelim", "typinput", "typrelid", "typbasetype", "typcollation", "typnamespace")
      .createOrReplaceTempView("pg_type")

    Seq((defaultNamespaceOid, defaultNamespace))
      .toDF("oid", "nspname").createOrReplaceTempView("pg_namespace")
    Seq((userRoleOid, "spark-user")).toDF("oid", "rolname")
      .createOrReplaceTempView("pg_roles")
    Seq(("spark-user", userRoleOid)).toDF("usename", "usesysid")
      .createOrReplaceTempView("pg_user")
    Seq(("default", userRoleOid, 6, "C", "C", "c"))
      .toDF("datname", "datdba", "encoding", "datcollate", "datctype",
        // PG 15's \l also reads the locale-provider columns
        "datlocprovider")
      .withColumn("datacl", org.apache.spark.sql.functions.lit(null)
        .cast("array<string>"))
      .withColumn("daticulocale", org.apache.spark.sql.functions.lit(null)
        .cast("string"))
      .createOrReplaceTempView("pg_database")

    // Static empties the JDBC drivers probe (reference catalog.scala:87-118).
    emptyView(spark, "pg_attrdef", "adrelid INT, adnum SHORT, adbin STRING")
    emptyView(spark, "pg_constraint",
      "oid INT, confupdtype STRING, confdeltype STRING, conname STRING, " +
        "condeferrable BOOLEAN, condeferred BOOLEAN, conkey ARRAY<INT>, " +
        "confkey ARRAY<INT>, confrelid INT, conrelid INT, contype STRING")
    emptyView(spark, "pg_depend", "objid INT, classid INT, refobjid INT, refclassid INT")
    emptyView(spark, "pg_description",
      "objoid INT, classoid INT, objsubid INT, description STRING")
    emptyView(spark, "pg_index",
      // indkey is PG's int2vector of indexed column numbers; pgjdbc's
      // getPrimaryKeys expands it via information_schema._pg_expandarray
      "oid INT, indrelid INT, indexrelid INT, indisprimary BOOLEAN, " +
        "indkey ARRAY<SMALLINT>")
    emptyView(spark, "pg_inherits",
      "inhrelid INT, inhparent INT, inhseqno INT, inhdetachpending BOOLEAN")
    emptyView(spark, "pg_policy",
      "polname STRING, polrelid INT, polcmd STRING, polroles STRING, " +
        "polqual STRING, polwithcheck STRING")
    emptyView(spark, "pg_collation", "oid INT, collname STRING")
    // access methods: \dt on PG>=12 LEFT JOINs this (rows survive, am null)
    emptyView(spark, "pg_am", "oid INT, amname STRING")
    // lock monitor: admin tools (DBeaver, pgAdmin) probe it when browsing
    // sessions; there is no lock manager, so zero rows is the truth
    emptyView(spark, "pg_locks",
      "locktype STRING, database INT, relation INT, pid INT, mode STRING, " +
        "granted BOOLEAN, virtualtransaction STRING, virtualxid STRING")
    // seeded (not empty) since round 5: the fastpath registry is the source
    // of truth, so FunctionCall clients can resolve OIDs by name and \df
    // shows real rows. prokind replaced proisagg/proiswindow in PG 11; \df
    // on new announced versions reads it.
    fastpathFunctions.map { case (oid, name, argOids, retOid) =>
      (oid, name, retOid, argOids, defaultNamespaceOid, false, false, false, "f")
    }.toDF("oid", "proname", "prorettype", "proargtypes", "pronamespace",
      "proisagg", "proiswindow", "proretset", "prokind")
      .createOrReplaceTempView("pg_proc")

    // Runtime tables, populated from the live catalog so psql \d works:
    // pg_class with the reference's full 21-column schema
    // (catalog.scala:217-219) and pg_attribute rows per visible column.
    val tbls = spark.catalog.listTables().collect()
    val classRows = tbls.zipWithIndex.map { case (tbl, idx) =>
      Row(10000 + idx, 0, tbl.name, 0, "p",
        // Catalog.tableType is MANAGED/EXTERNAL/VIEW/TEMPORARY
        if (tbl.tableType == "MANAGED" || tbl.tableType == "EXTERNAL") "r" else "v",
        defaultNamespaceOid, userRoleOid, null, 0.toShort, 0,
        false, false, false, false, false, "d", 0.toShort, false, false, null, 0)
    }
    // the per-table listColumns sweep is the expensive part on a large
    // metastore (one RPC per table); connection storms — pools opening N
    // connections at once — would repeat it N times, so reuse the sweep
    // while the visible table list is unchanged (TTL-bounded so ALTERs
    // surface across connections within seconds)
    val attrKey = tbls.map(t => t.name + "/" + t.tableType).toSeq
    val classSchema = StructType.fromDDL(
      "oid INT, reltablespace INT, relname STRING, reloftype INT, " +
        "relpersistence STRING, relkind STRING, relnamespace INT, relowner INT, " +
        "relacl ARRAY<STRING>, relchecks SHORT, reltoastrelid INT, " +
        "relhasindex BOOLEAN, relhasrules BOOLEAN, relhastriggers BOOLEAN, " +
        "relrowsecurity BOOLEAN, relforcerowsecurity BOOLEAN, relreplident STRING, " +
        "reltriggers SHORT, relhasoids BOOLEAN, relispartition BOOLEAN, relpartbound STRING, " +
        "relam INT") // access-method oid, referenced by \dt on PG>=12
    spark.createDataFrame(java.util.Arrays.asList(classRows: _*), classSchema)
      .createOrReplaceTempView("pg_class")
    val attrRows = {
      val cached = attrCache.get()
      if (cached != null && cached.key == attrKey &&
        System.nanoTime() - cached.at < AttrCacheTtlNanos) cached.rows
      else {
        val rows: Seq[Row] = tbls.zipWithIndex.toSeq.flatMap { case (tbl, idx) =>
          scala.util.Try(spark.catalog.listColumns(tbl.name).collect()).toOption
            .getOrElse(Array.empty[org.apache.spark.sql.catalog.Column])
            .zipWithIndex.map { case (c, ci) =>
              val oid = oidOfTypeName(c.dataType)
              Row(0, 10000 + idx, c.name, oid, !c.nullable, false, -1,
                typeLenOfOid(oid), ci + 1, "", false, 0, "")
            }
        }
        attrCache.set(AttrSnapshot(attrKey, System.nanoTime(), rows))
        rows
      }
    }
    spark.createDataFrame(java.util.Arrays.asList(attrRows: _*),
      StructType.fromDDL(
        "oid INT, attrelid INT, attname STRING, atttypid INT, attnotnull BOOLEAN, " +
          "atthasdef BOOLEAN, atttypmod INT, attlen INT, attnum INT, " +
          "attidentity STRING, attisdropped BOOLEAN, attcollation INT, " +
          "attgenerated STRING")) // '' = plain column, referenced by \d on PG>=12
      .createOrReplaceTempView("pg_attribute")

    // information_schema emulation (beyond-reference): many BI tools query
    // information_schema, not pg_catalog. Backed by the SAME live snapshot
    // as pg_class/pg_attribute; PgRewrite fuses the qualifier, so
    // information_schema.tables resolves to information_schema_tables.
    Seq(("default", defaultNamespace, "spark-user"))
      .toDF("catalog_name", "schema_name", "schema_owner")
      .createOrReplaceTempView("information_schema_schemata")
    val isTable = (t: org.apache.spark.sql.catalog.Table) =>
      t.tableType == "MANAGED" || t.tableType == "EXTERNAL"
    val infoTableRows = tbls.map { t =>
      Row("default", defaultNamespace, t.name,
        if (isTable(t)) "BASE TABLE" else "VIEW")
    }
    spark.createDataFrame(java.util.Arrays.asList(infoTableRows: _*),
      StructType.fromDDL("table_catalog STRING, table_schema STRING, " +
        "table_name STRING, table_type STRING"))
      .createOrReplaceTempView("information_schema_tables")
    val infoViewRows = tbls.filterNot(isTable).map { t =>
      Row("default", defaultNamespace, t.name, null)
    }
    spark.createDataFrame(java.util.Arrays.asList(infoViewRows.toSeq: _*),
      StructType.fromDDL("table_catalog STRING, table_schema STRING, " +
        "table_name STRING, view_definition STRING"))
      .createOrReplaceTempView("information_schema_views")
    // columns re-derive from the cached pg_attribute sweep (attrelid-10000 =
    // table index) — no second listColumns RPC storm
    val nameByIdx = tbls.zipWithIndex.map { case (t, i) => i -> t.name }.toMap
    val infoColRows = attrRows.map { r =>
      Row("default", defaultNamespace, nameByIdx(r.getInt(1) - 10000),
        r.getString(2), r.getInt(8), null,
        if (r.getBoolean(4)) "NO" else "YES", typeNameOf(r.getInt(3)))
    }
    spark.createDataFrame(java.util.Arrays.asList(infoColRows: _*),
      StructType.fromDDL("table_catalog STRING, table_schema STRING, " +
        "table_name STRING, column_name STRING, ordinal_position INT, " +
        "column_default STRING, is_nullable STRING, data_type STRING"))
      .createOrReplaceTempView("information_schema_columns")

    PgFunctions.register(spark)
  }

  /** Catalog relations whose backing feature (row-level security, logical
    * replication, extended statistics, rules/triggers) has no Spark
    * counterpart. psql's hidden `\d` queries over them use PG-only syntax —
    * `ARRAY(SELECT ...)`, `= ANY(...)`, regtype casts — that Spark cannot
    * parse, and the truthful answer is always zero rows (psql renders those
    * sections only when ntuples > 0). SELECTs touching them short-circuit
    * to an empty result server-side.
    */
  private val featureAbsentRe =
    ("(?is)\\bpg_(policy|policies|publication(_rel|_namespace)?|" +
      "statistic_ext(_data)?|rewrite|trigger|event_trigger|rules|matviews)\\b").r

  def isFeatureAbsentQuery(sql: String): Boolean = {
    val t = sql.trim
    (t.regionMatches(true, 0, "SELECT", 0, 6) || t.regionMatches(true, 0, "WITH", 0, 4)) &&
      featureAbsentRe.findFirstIn(sql).isDefined
  }

  /** Spark catalog column dataType string -> PG oid. */
  def oidOfTypeName(dt: String): Int = {
    val t = dt.toLowerCase
    if (t.startsWith("decimal")) 1700
    else if (t.startsWith("array<string")) 1015
    else if (t.startsWith("array<float")) 1021
    else if (t.startsWith("array<double")) 1022
    else if (t.startsWith("array<interval")) 1187
    else if (t.startsWith("array<int")) 1007
    else if (t.startsWith("array<bigint")) 1016
    else if (t.startsWith("array<smallint")) 1005
    // nested/other arrays render as text (reference punt, catalog.scala:206)
    else if (t.startsWith("array")) 1043
    else if (t.startsWith("map") || t.startsWith("struct")) 6201
    else t match {
      case "int" | "integer" => 23
      case "bigint" | "long" => 20
      case "smallint" | "short" => 21
      case "tinyint" | "byte" => 6200
      case "double" => 701
      case "float" | "real" => 700
      case "string" | "varchar" => 1043
      case "boolean" => 16
      case "date" => 1082
      case "timestamp" | "timestamp_ntz" => 1114
      case "binary" => 17
      case "interval" => 1186
      case _ => 1043
    }
  }

  private def typeLenOfOid(oid: Int): Int = graft.pg.wire.PgTypes.typeLenOf(oid)

  /** DuckDB oracle for the pg_type scan: the same seed rows as inline VALUES
    * (generated from the same Seq, so consistent by construction).
    */
  def pgTypeOracle: String = {
    val rows = pgTypes.map { case (oid, name, len, elem, input) =>
      s"($oid, '$name', $len, $elem, '$input')"
    }.mkString(",\n        ")
    s"""SELECT * FROM (VALUES
        $rows) AS t(oid, typname, typlen, typelem, typinput)
      ORDER BY oid"""
  }
}
