package graft.pg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The injectParser extension path (reference SQLServerEnv.scala:73-97):
  * a session built with [[PgExtensions]] parses the PG dialect through
  * plain `spark.sql`, no PgDialect.sql wrapper needed.
  */
class PgExtensionsSuite extends AnyFunSuite {

  private lazy val extended: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new PgExtensions)
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("spark.sql speaks the PG dialect once the parser is injected") {
    assert(extended.sql("SELECT 42::text AS s").collect().head.getString(0) === "42")
    assert(extended.sql("SELECT 'abc' ~ 'a.*' AS m").collect().head.getBoolean(0))
    assert(extended.sql("SELECT * FROM generate_series(1, 3)").count() === 3)
    assert(extended.sql("SELECT substring('spark sql' from 7) AS s")
      .collect().head.getString(0) === "sql")
  }

  test("BEGIN parses to the no-op command through the injected parser") {
    assert(extended.sql("BEGIN").collect().isEmpty)
  }

  test("standard SQL still delegates untouched") {
    assert(extended.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) === 2)
  }
}
