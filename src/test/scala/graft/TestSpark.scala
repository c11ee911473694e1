package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  // overridable for the local scale-up check (plan asserts re-run at sf1
  // via SPARK_GRAFT_TEST_SF=/tmp/graft_sf1); default is the driver's
  // smallest shipped SF
  val sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
}
