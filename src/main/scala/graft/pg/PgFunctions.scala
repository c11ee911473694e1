package graft.pg

import org.apache.spark.sql.SparkSession

/** The 16 PG system functions clients call during metadata discovery,
  * registered through the public `spark.udf.register` API (semantics mirror
  * reference catalog.scala:223-245).
  */
object PgFunctions {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("array_to_string",
      (ar: Seq[String], delim: String) => if (ar != null) ar.mkString(delim) else "")
    u.register("array_in", () => "array_in")
    u.register("format_type", // boxed typemod: psql passes both INT and NULL
      (oid: Int, _: java.lang.Integer) => PgCatalog.typeNameOf(oid))
    u.register("obj_description", (_: Int, _: String) => "")
    u.register("current_schemas", (_: Boolean) => Seq(PgCatalog.defaultNamespace))
    u.register("pg_encoding_to_char", (enc: Int) => if (enc == 6) "UTF8" else "")
    u.register("pg_get_userbyid", (_: Int) => "spark-user")
    // psql calls pg_get_expr with 2 or 3 args; accept any arity
    org.apache.spark.sql.graft.Internals.registerExprFunction(spark, "pg_get_expr",
      _ => org.apache.spark.sql.catalyst.expressions.Literal(""))
    u.register("pg_table_is_visible", (_: Int) => true)
    u.register("pg_function_is_visible", (_: Int) => true)
    u.register("array_upper", (ar: Seq[String], _: Int) => if (ar != null) ar.size else 0)
    u.register("pg_get_function_arguments", (_: Int) => "")
    u.register("pg_get_function_result", (_: Int) => "")
    u.register("oidvectortypes",
      (oids: Seq[Int]) => if (oids != null) oids.map(PgCatalog.typeNameOf).mkString(", ") else "")
    u.register("ANY", (ar: Seq[String]) => if (ar != null && ar.nonEmpty) ar.head else "")
    u.register("regtype", (oid: Int) => PgCatalog.typeNameOf(oid))
    // modern psql sends these on startup / in \-commands
    u.register("set_config", (_: String, v: String, _: Boolean) => v)
    u.register("current_schema", () => PgCatalog.defaultNamespace)
    u.register("pg_backend_pid", () => 0)
    // server observability (reference SQLServerListener counters)
    u.register("graft_stat", (name: String) => graft.pg.server.ServerStats.get(name))
  }
}
