package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Access to the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All operators read through here so that schema quirks are handled in one
  * place. Reads are plain `spark.read.parquet` so Catalyst keeps predicate
  * pushdown / column pruning on the scans.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS); Spark has no
    * nanosecond timestamp type. We read it via the long-nanos escape hatch and
    * normalize to a microsecond TimestampType column so every downstream
    * operator sees a plain timestamp. `div` is exact long division — a double
    * `/` here would lose 1µs on ~12% of rows because nanos ~1.7e18 > 2^53.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    if (df.schema.exists(f => f.name == "ts" && f.dataType == LongType)) {
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Deterministically opt into the long-nanos read rather than
      // try/catch-ing (which would mask unrelated read failures).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(path))
    } else spark.read.parquet(path)
  }

  // weak keys: long-lived servers create a session per connection — a
  // strong map would pin every closed session's state in memory forever
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  /** Register all tables as temp views (idempotent per session+dir) so that
    * SQL-text operators can refer to them by name.
    */
  def views(spark: SparkSession, sfDir: String): Unit = {
    val dirs = registered.computeIfAbsent(spark,
      _ => new java.util.HashSet[String]())
    // synchronized so a concurrent caller never returns before the winner
    // has finished creating every view
    dirs.synchronized {
      if (dirs.add(sfDir)) {
        all.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
      }
    }
  }
}
