package graft.tmp
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    def q(sql: String): Unit =
      try out.println("PROBE " + sql.take(60).replace("\n"," ") + " => " + spark.sql(sql).collect().mkString("|"))
      catch { case e: Throwable => out.println("PROBE FAIL " + sql.take(60) + " => " + e.getMessage.take(120)) }
    q("SELECT CAST(EXTRACT(DOW FROM DATE '2026-08-15') AS INT)")       // Saturday
    q("SELECT CAST(EXTRACT(DOW FROM DATE '2026-08-16') AS INT)")       // Sunday
    q("SELECT CAST(EXTRACT(QUARTER FROM DATE '2026-08-15') AS INT)")
    q("SELECT CAST(SUBSTRING('Brand#13' FROM 7) AS INT)")
    q("SELECT 'mfg#' || CAST(CAST(17 AS INT) AS VARCHAR(8))")
    q("SELECT CAST(FLOOR(1234 * 1.0 / 7) AS BIGINT)")
    q("SELECT DATE '1999-02-22' + INTERVAL 30 DAY")
    q("SELECT CAST(ROUND(CAST(123.45 AS DOUBLE) * 100) AS BIGINT)")
    q("SELECT 7 / 2")  // int division semantics
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.createOrReplaceTempView("li")
    q("SELECT count(*) FROM li WHERE l_quantity <> FLOOR(l_quantity)")
    spark.stop()
  }
}
