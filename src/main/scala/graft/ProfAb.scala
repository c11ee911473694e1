package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe (guide §1): alternate a system-property toggle between
  * repeated runs of ONE entry inside a single JVM, so time-correlated host
  * bursts hit both variants equally; compare per-variant minima.
  *
  * Usage: runMain graft.ProfAb <sfDir> <entry> <propKey> <reps> [valA] [valB]
  */
object ProfAb {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, entry, propKey, repsS) = args.take(4)
    val reps = repsS.toInt
    val (valA, valB) = (args.lift(4).getOrElse("true"), args.lift(5).getOrElse("false"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.all.find(_.name == entry).get
    // untimed warmup of the entry itself (steady-state comparison)
    q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val times = Seq.fill(reps)(Seq(valA, valB)).flatten.map { v =>
      System.setProperty(propKey, v)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[ab] $propKey=$v $secs%.2fs")
      (v, secs)
    }
    val (onT, offT) =
      (times.filter(_._1 == valA).map(_._2), times.filter(_._1 == valB).map(_._2))
    println(f"[ab] min on=${onT.min}%.2f off=${offT.min}%.2f " +
      f"median A=${onT.sorted.apply(onT.size / 2)}%.2f B=${offT.sorted.apply(offT.size / 2)}%.2f")
    spark.stop()
  }
}
