package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Materialized-star A/B bench for the official TPC-DS battery (round-10
  * ask 7): the battery's oracle contract forces every query text to carry
  * the full derivation prefix, so each run re-derives the fact tables from
  * lineitem JOIN orders — one shuffle per query that a real deployment
  * would pay ONCE. This bench writes every star CTE to parquet once per
  * dataset dir, registers the materialization as temp views, and runs the
  * SAME official bodies against them (a body that continues the WITH chain
  * is re-rooted as its own WITH), timing both paths and verifying
  * identical results in-JVM.
  *
  * The gate path is untouched: DsOfficial entries keep the CTE prefix so
  * the DuckDB oracle runs the identical text.
  */
object DsStarBench {

  /** Top-level CTE names in the prefix, in definition order. */
  private def starTables(prefix: String): Seq[String] =
    """(?m)^(?:WITH )?(\w+) AS \($""".r
      .findAllMatchIn(prefix).map(_.group(1)).toSeq

  private def stats(xs: Seq[Double]): Double = xs.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_STAR_ITERS", "2").toInt
    val starDir = sys.env.getOrElse("SPARK_GRAFT_STAR_DIR", "/tmp/graft_star")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.views(spark, sfDir)

    val prefix = graft.queries.DsOfficial.prefixSql
    // base_sales is derivation-internal: no official body references it
    val tables = starTables(prefix).filterNot(_ == "base_sales")
    val t0 = System.nanoTime()
    tables.foreach { t =>
      spark.sql(prefix + s"\nSELECT * FROM $t")
        .write.mode("overwrite").parquet(s"$starDir/$t")
    }
    val buildSecs = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[star] materialized ${tables.size} tables in $buildSecs%.1fs")

    final case class Rec(name: String, full: Double, star: Double, same: Boolean)
    val recs = mutable.ArrayBuffer.empty[Rec]
    def timeNoop(sql: String): Double = {
      val s0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s0) / 1e9
    }
    // Register the materialization once. The full-prefix path is immune to
    // the shadowing: a text's own CTE names always win over same-named
    // views, and the prefix reads base data via main.* only.
    tables.foreach(t =>
      spark.read.parquet(s"$starDir/$t").createOrReplaceTempView(t))
    graft.queries.DsOfficial.bodies.foreach { case (name, body) =>
      val fullSql = prefix + body
      val bodySql =
        if (body.trim.startsWith(",")) "WITH " + body.trim.drop(1) else body
      try {
        val full = (0 until iters).map(_ => timeNoop(fullSql)).min
        val star = (0 until iters).map(_ => timeNoop(bodySql)).min
        val same = {
          val a = spark.sql(fullSql).collect().map(_.toString).sorted
          val b = spark.sql(bodySql).collect().map(_.toString).sorted
          java.util.Arrays.equals(a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
        }
        recs += Rec(name, full, star, same)
        System.err.println(f"[star] $name full=$full%.3fs star=$star%.3fs " +
          f"speedup=${full / star}%.2fx same=$same")
      } catch {
        case e: Throwable =>
          System.err.println(s"[star] $name FAILED: ${e.getMessage}")
          recs += Rec(name, -1, -1, same = false)
      }
    }
    val ok = recs.filter(_.full >= 0)
    val perQuery = recs.map { r =>
      if (r.full < 0) s""""${r.name}":{"error":true}"""
      else f""""${r.name}":{"full":${r.full}%.4f,"star":${r.star}%.4f,"same":${r.same}}"""
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"star_total","full_total":${ok.map(_.full).sum},""" +
        s""""star_total":${ok.map(_.star).sum},"build_secs":$buildSecs,""" +
        s""""n_ok":${ok.size},"n_queries":${recs.size},""" +
        s""""all_same":${ok.nonEmpty && ok.forall(_.same)},"sf":"$sfDir","queries":$perQuery}"""
    val rawOut = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    rawOut.println(full)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_star.json"), full + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
