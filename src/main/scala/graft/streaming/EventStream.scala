package graft.streaming

import java.util.UUID

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the reference has no
  * streaming at all (SURVEY.md §2B "Streaming: none"), so this is net-new
  * capability mapped to the idiomatic Spark constructs — readStream file
  * source, event-time watermark, tumbling window aggregation, memory sink.
  *
  * Scale posture: the windowed aggregation is keyed state bounded by the
  * watermark (late data beyond 2 hours is dropped and its state evicted);
  * partial aggregation happens map-side before the state-store shuffle.
  */
object EventStream {

  /** Run the stream over the static events parquet until all available data
    * is processed, then return the result table. Because every row arrives
    * before the watermark advances past it, the result equals the batch
    * aggregation — which is exactly what the DuckDB oracle checks.
    */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // the file stores ts as TIMESTAMP(NANOS); stream-read it as raw longs
    // (Tables.df sets the legacy conf) and normalize like the batch path
    val normalized = Tables.df(spark, sfDir, "events").schema
    val rawSchema = StructType(normalized.map(f =>
      if (f.name == "ts") f.copy(dataType = LongType) else f))
    val sink = "stream_sink_" + UUID.randomUUID().toString.replace("-", "")

    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total"))

    val q = stream.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(sink).orderBy("win_start", "event_type")
  }
}
