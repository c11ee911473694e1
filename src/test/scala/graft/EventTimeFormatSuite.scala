package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Format-drift tripwire for the driver-generated `events.parquet`.
  *
  * Round 5 post-mortem: the driver silently switched `events.ts` from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ between rounds; the repo's
  * nanos-only normalization no-op'd, every event timestamp collapsed 1000x
  * into 1970, and the entire event-time operator family (q92/q94/q95/q98/q99/
  * q120) went red at the driver gate without a single local test failing.
  * This suite is the test that would have caught it at build time: it pins
  * the POST-normalization contract every event-time operator relies on —
  * `ts` is session-zone TimestampType with values in the generated data's
  * real range — at every scale factor the driver ships, plus one
  * streaming-vs-batch row-count equivalence so a stream-only scaling bug
  * (the round-5 failure mode) cannot hide behind a healthy batch path.
  */
class EventTimeFormatSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(d => s"/root/testdata/$d")
    .filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("driver testdata dirs are present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf*/events.parquet found")
  }

  for (dir <- sfDirs) {
    test(s"normalized events.ts is TimestampType in real range ($dir)") {
      val ev = Tables.df(spark, dir, "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"post-normalization ts type is ${ev.schema("ts").dataType}")
      val row = ev.agg(
        min(col("ts")).as("lo"), max(col("ts")).as("hi"),
        count(lit(1)).as("n")).head()
      val (lo, hi) = (row.getTimestamp(0).toInstant, row.getTimestamp(1).toInstant)
      val y2000 = java.time.Instant.parse("2000-01-01T00:00:00Z")
      val future = java.time.Instant.parse("2100-01-01T00:00:00Z")
      assert(row.getLong(2) > 0, s"$dir/events.parquet is empty")
      // a nanos-read-as-micros bug lands in 1970; a micros-read-as-nanos
      // bug lands tens of millennia out — both trip these bounds
      assert(lo.isAfter(y2000), s"min ts $lo collapsed before 2000 — mis-scaled read")
      assert(hi.isBefore(future), s"max ts $hi is past 2100 — mis-scaled read")
      Tables.assertSaneEventTime(ev) // the production tripwire agrees
    }
  }

  test("streaming window counts equal batch formulation (sf0.001)") {
    val dir = TestSpark.sfDir
    val streamed = streaming.EventStream.windowedCounts(spark, dir)
    val batch = Tables.df(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // row-count equality is the drift-sensitive part: the round-5 bug
    // dilated windows 1000x, collapsing thousands of window groups into 2
    assert(streamed.count() == batch.count(),
      "streaming path disagrees with batch on window-group count — " +
        "stream-side ts scaling drifted")
  }
}
