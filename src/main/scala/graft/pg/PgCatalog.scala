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

  val defaultNamespaceOid = 2200
  val defaultNamespace = "spark"
  val userRoleOid = 10

  def typeNameOf(oid: Int): String =
    pgTypes.find(_._1 == oid).map(_._2).getOrElse("unknown")

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
    Seq(("default", userRoleOid, 6, "C", "C"))
      .toDF("datname", "datdba", "encoding", "datcollate", "datctype")
      .createOrReplaceTempView("pg_database")

    // Runtime table: current catalog tables as pg_class rows.
    val tables = spark.catalog.listTables().collect().zipWithIndex.map {
      case (tbl, idx) =>
        (10000 + idx, tbl.name, if (tbl.tableType == "VIEW") "v" else "r",
          defaultNamespaceOid, userRoleOid)
    }.toSeq
    tables.toDF("oid", "relname", "relkind", "relnamespace", "relowner")
      .createOrReplaceTempView("pg_class")

    // Static empties the JDBC drivers probe (reference catalog.scala:87-118).
    emptyView(spark, "pg_attrdef", "adrelid INT, adnum SHORT, adbin STRING")
    emptyView(spark, "pg_constraint",
      "oid INT, confupdtype STRING, confdeltype STRING, conname STRING, " +
        "condeferrable BOOLEAN, condeferred BOOLEAN, conkey ARRAY<INT>, " +
        "confkey ARRAY<INT>, confrelid INT, conrelid INT, contype STRING")
    emptyView(spark, "pg_depend", "objid INT, classid INT, refobjid INT, refclassid INT")
    emptyView(spark, "pg_description",
      "objoid INT, classoid INT, objsubid INT, description STRING")
    emptyView(spark, "pg_index", "oid INT, indrelid INT, indexrelid INT, indisprimary BOOLEAN")
    emptyView(spark, "pg_inherits", "inhrelid INT, inhparent INT, inhseqno INT")
    emptyView(spark, "pg_policy",
      "polname STRING, polrelid INT, polcmd STRING, polroles STRING, " +
        "polqual STRING, polwithcheck STRING")
    emptyView(spark, "pg_collation", "oid INT, collname STRING")
    emptyView(spark, "pg_attribute",
      "oid INT, attrelid INT, attname STRING, atttypid INT, attnotnull BOOLEAN, " +
        "atthasdef BOOLEAN, atttypmod INT, attlen INT, attnum INT, " +
        "attidentity STRING, attisdropped BOOLEAN, attcollation INT")
    emptyView(spark, "pg_proc",
      "oid INT, proname STRING, prorettype INT, proargtypes ARRAY<INT>, " +
        "pronamespace INT, proisagg BOOLEAN, proiswindow BOOLEAN, proretset BOOLEAN")

    PgFunctions.register(spark)
  }

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
