package graft.pg.server

import org.apache.spark.sql.api.java.UDF1

/** Identity UDF backing the `udf/` corpus tranche. The upstream sql-tests
  * harness substitutes `udf(...)` with a String => String identity UDF
  * (Spark's IntegratedUDFTestUtils.TestScalaUDF) so every wrapped corpus
  * file exercises UDF planning without changing values; this is the same
  * shape, registered through SQL (`CREATE TEMPORARY FUNCTION udf AS ...`)
  * so the whole path flows through the wire server like a real client's.
  * Arguments implicitly cast to string, so results are deterministic.
  */
class IdentityStringUDF extends UDF1[String, String] {
  override def call(x: String): String = x
}
