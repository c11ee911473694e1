package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement probe (guide §1): run selected streaming entries with a
  * StreamingQueryListener attached and print, per entry, the wall-clock
  * split between trigger execution (from StreamingQueryProgress.durationMs)
  * and everything outside the stream (staging writes, query start/stop,
  * sink collect). Not part of the bench/verify contract.
  *
  * Usage: runMain graft.ProfStream <sfDir> <name...>
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        progress.add(s"START ${System.nanoTime()}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        progress.add(
          s"TRIGGER batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${d}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        progress.add(s"END ${System.nanoTime()}")
    })

    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val selected: Seq[QE] =
      if (names.isEmpty) SparkEntry.all
      else args.drop(1).toSeq.map(byName) // arg order = run order (first-use costs)
    selected.foreach { q =>
      progress.clear()
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener events are async; give them a moment to land
      Thread.sleep(300)
      println(f"== ${q.name} wall=${secs}%.2fs")
      progress.forEach(s => println("   " + s))
    }
    spark.stop()
  }
}
