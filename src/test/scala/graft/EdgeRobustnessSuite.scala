package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 advisor-fix regressions: edge inputs that used to crash or leak.
  *
  *  - p16's stats UDF NPE'd on a NULL `text` (the oracle SQL yields NULL
  *    fractions for that document, so the Spark side must too).
  *  - The late-data and union-stream stagings crashed on
  *    `firstParquet(...).get` when a staged subset was EMPTY (no on-time
  *    rows / a feed with zero events of its type) because partitionBy only
  *    writes directories for values present in the data.
  *  - Tables' relation memo used weak session keys whose values strongly
  *    referenced the key (never collectible); lifetime is now explicit via
  *    Tables.invalidate, called by the wire server per closed connection.
  */
class EdgeRobustnessSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A miniature sf dir with just the tables a test needs. */
  private def miniDir(): java.nio.file.Path =
    Files.createTempDirectory("graft_edge_sf")

  private def writeEvents(dir: java.nio.file.Path, rows: Seq[Row]): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("p16 stats survive a NULL text document (NULL fractions, no NPE)") {
    val dir = miniDir()
    try {
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      spark.createDataFrame(java.util.Arrays.asList(
          Row(1L, "a b a"), Row(2L, null)), schema)
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("documents.parquet").toString)
      val out = SparkEntry.queries("p16_repetition_quality")(spark, dir.toString)
        .collect()
      assert(out.length == 2)
      val nullDoc = out.find(_.getLong(0) == 2L).get
      assert(nullDoc.isNullAt(1) && nullDoc.isNullAt(2) && nullDoc.isNullAt(3),
        s"NULL text must yield NULL stats (oracle behavior), got $nullDoc")
      val real = out.find(_.getLong(0) == 1L).get
      assert(math.abs(real.getDouble(1) - 2.0 / 3.0) < 1e-12)
    } finally Tables.invalidate(spark)
  }

  test("late-data staging tolerates an empty on-time subset (single event)") {
    val dir = miniDir()
    try {
      writeEvents(dir, Seq(Row(1L, 10L, ts("2024-03-01T00:00:00Z"), "click", 1.0)))
      // one event: the on-time subset (ts >= cutoff = lo + 1ms) is EMPTY.
      // Round 10 crashed in staging (firstParquet(...).get on the missing
      // partition dir); with the empty-subset fallback the staging survives
      // and the run ends at the entry's own LOUD late-rows invariant
      // instead (Spark only counts a late row as watermark-dropped when its
      // window's state was previously evicted — with no on-time rows no
      // state ever exists — which is also what the pre-round-10 per-subset
      // writes produced on this degenerate input).
      val e = intercept[IllegalArgumentException] {
        streaming.EventStream.lateDataWindowedCounts(spark, dir.toString)
      }
      assert(e.getMessage.contains("late-data entry must actually drop rows"),
        s"expected the entry's invariant, got: ${e.getMessage}")
    } finally Tables.invalidate(spark)
  }

  test("union staging tolerates a feed with zero events of its type") {
    val dir = miniDir()
    try {
      writeEvents(dir, Seq( // clicks only — the error feed subset is EMPTY
        Row(1L, 10L, ts("2024-03-01T00:10:00Z"), "click", 1.0),
        Row(2L, 11L, ts("2024-03-01T00:20:00Z"), "click", 2.0)))
      val out = streaming.EventStream.unionTypedStreams(spark, dir.toString)
        .collect()
      assert(out.map(_.getLong(2)).sum == 2L,
        s"expected the 2 click events to aggregate, got ${out.mkString(";")}")
    } finally Tables.invalidate(spark)
  }

  test("Tables.invalidate drops the session's relation memo") {
    val dir = TestSpark.sfDir
    val a = Tables.df(spark, dir, "region")
    assert(Tables.df(spark, dir, "region") eq a, "memo must return same plan")
    Tables.invalidate(spark)
    val b = Tables.df(spark, dir, "region")
    assert(!(b eq a), "invalidate must force a rebuild")
    assert(b.count() == a.count())
  }
}
