package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe (guide §1): decompose an entry's wall time into
  * DataFrame build, analysis, optimization+physical planning, and execution
  * — run twice so one-time costs (codegen, memo fills) separate from steady
  * state. Not part of the bench/verify contract.
  *
  * Usage: runMain graft.ProfFixed <sfDir> <name...>
  */
object ProfFixed {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    // one untimed session warmup
    byName("q01_pricing_summary").fn(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { n =>
      val q = byName(n)
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.analyzed
        val tAna = ms(t1)
        val t2 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = ms(t2)
        val t3 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = ms(t3)
        spark.catalog.clearCache()
        println(f"[fixed] $n rep=$rep build=$tBuild%.0f analyze=$tAna%.0f " +
          f"plan=$tPlan%.0f exec=$tExec%.0f total=${tBuild + tAna + tPlan + tExec}%.0f ms")
      }
    }
    spark.stop()
  }
}
