package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer plumbing: ANALYZE TABLE feeds table and column
  * statistics into Catalyst, and with CBO enabled the optimizer derives
  * row counts and filter selectivities from them — the machinery that
  * picks broadcast sides and join orders at 100 TB, where file size alone
  * misestimates filtered dimensions by orders of magnitude.
  */
class CboSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ANALYZE TABLE statistics drive CBO row counts and filter selectivity") {
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS cbo_t")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql(
        "CREATE TABLE cbo_t USING parquet AS " +
          "SELECT id AS k, CAST(id % 100 AS INT) AS bucket FROM range(10000)")
      spark.sql("ANALYZE TABLE cbo_t COMPUTE STATISTICS FOR COLUMNS k, bucket")

      // table-level stats: the optimizer knows the exact row count
      val full = spark.table("cbo_t").queryExecution.optimizedPlan.stats
      assert(full.rowCount.contains(BigInt(10000)),
        s"ANALYZE row count must reach the optimizer, got ${full.rowCount}")

      // column-level stats: an equality filter on a 100-distinct-value
      // column must be estimated near 1% of the table, not 100%
      val filtered = spark.table("cbo_t").filter("bucket = 7")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined, "filtered estimate must exist under CBO")
      val est = filtered.rowCount.get
      assert(est < BigInt(1000),
        s"selectivity from column stats must shrink the estimate, got $est")

      // DESCRIBE EXTENDED surfaces the stats to users
      val desc = spark.sql("DESCRIBE TABLE EXTENDED cbo_t")
        .collect().map(_.mkString("|")).mkString("\n")
      assert(desc.contains("10000 rows") || desc.contains("rowCount"),
        s"stats must appear in DESCRIBE EXTENDED:\n$desc")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS cbo_t")
    }
  }
}
