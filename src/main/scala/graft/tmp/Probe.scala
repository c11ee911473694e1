package graft.tmp
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("p05_ngram_jaccard")(spark, d).count()
      out.println(f"PROBE capped $d pairs=$n time=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
