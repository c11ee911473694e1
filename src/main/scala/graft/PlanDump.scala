package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for selected entries to files — the
  * optimization rounds' plan-evidence artifact (plans/rNN/<name>_before.txt /
  * _after.txt). Streaming entries are skipped: their QE fn EXECUTES the
  * stream (the returned frame is the drained sink), so "the plan" would be
  * the memory-sink scan, not the streamed computation.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [namePrefix...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val prefixes = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val selected = SparkEntry.all
      .filterNot(q => Bench.isStreaming(q.name))
      .filter(q => prefixes.isEmpty || prefixes.exists(q.name.startsWith))
    selected.foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${q.name}_$suffix.txt"),
          txt.getBytes(UTF_8))
        System.err.println(s"[plandump] ${q.name} ok")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
