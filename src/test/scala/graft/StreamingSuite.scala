package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming operator runs in APPEND mode, where a window's row is only
  * emitted once the watermark passes its end — so this suite proves the
  * bounded-replay flush works end-to-end: every window (including the final
  * ones inside the watermark delay, which complete/append-without-flush
  * setups silently drop or hold) appears exactly once and equals the batch
  * aggregation.
  */
class StreamingSuite extends AnyFunSuite {

  test("append-mode windowed stream equals the batch aggregation") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.windowedCounts(s, TestSpark.sfDir).collect().toSeq
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .orderBy("win_start", "event_type")
      .collect().toSeq
    assert(streamed.size === batch.size,
      s"append mode must emit every window exactly once (got ${streamed.size}, want ${batch.size})")
    assert(streamed === batch)
  }

  test("threshold alerts: one alert per user, at the exact crossing event") {
    val s = TestSpark.spark
    val alerts =
      graft.streaming.EventStream.thresholdAlerts(s, TestSpark.sfDir).collect().toSeq
    assert(alerts.nonEmpty)
    assert(alerts.map(_.getLong(0)).distinct.size === alerts.size, "one alert per user")
    assert(alerts.forall(_.getDouble(3) > 500.0), "cum must exceed the threshold")
    // re-run is deterministic (state machine + event-time ordering)
    val again =
      graft.streaming.EventStream.thresholdAlerts(s, TestSpark.sfDir).collect().toSeq
    assert(alerts.map(_.toString) === again.map(_.toString))
    // value-equality INCLUDING the alert timestamp against the batch window
    // formulation (q94's oracle shape) — the round-5 data drift produced
    // right rows with 1970 timestamps, which only a ts-inclusive compare
    // catches
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .withColumn("cum",
        sum(col("value").cast(DecimalType(12, 2))).over(w).cast(DoubleType))
      .filter(col("cum") > 500.0)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("user_id", "event_id", "ts", "cum")
      .orderBy("user_id")
      .collect().toSeq
    assert(alerts.map(_.toString) === batch.map(_.toString),
      "streamed alerts (incl. ts) must equal the batch window formulation")
  }

  test("append-mode session stream equals the batch session_window result") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.sessionizedCounts(s, TestSpark.sfDir).collect().toSeq
    val batch = SparkEntry.queries("q97_sessionize")(s, TestSpark.sfDir).collect().toSeq
    assert(streamed.size === batch.size,
      s"session stream must emit every session exactly once (got ${streamed.size}, want ${batch.size})")
    assert(streamed === batch)
  }

  test("stream-stream join equals the batch self-join") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.clickErrorJoin(s, TestSpark.sfDir).collect().toSeq
    val ev = Tables.df(s, TestSpark.sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("error_id"), col("ts").as("ets"))
    val batch = clicks.join(errors,
        col("cu") === col("eu") && col("ets") >= col("cts") &&
          col("ets") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select("click_id", "error_id").orderBy("click_id", "error_id")
      .collect().toSeq
    assert(streamed.size === batch.size,
      s"join must emit each match exactly once (got ${streamed.size}, want ${batch.size})")
    assert(streamed === batch)
  }

  test("watermarked streaming dedup equals the batch distinct key set") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.streamDedup(s, TestSpark.sfDir).collect().toSeq
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
      .collect().toSeq
    assert(streamed.size === batch.size,
      s"dedup must emit each key exactly once (got ${streamed.size}, want ${batch.size})")
    assert(streamed === batch)
  }

  test("stream-static enrichment join equals the batch join + aggregation") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.enrichedSegmentSpend(s, TestSpark.sfDir).collect().toSeq
    val dim = Tables.df(s, TestSpark.sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .filter(col("event_type") === "purchase")
      .join(dim, Seq("user_id"))
      .groupBy(date_trunc("day", col("ts")).as("day_start"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .orderBy("day_start", "c_mktsegment")
      .collect().toSeq
    assert(streamed.size === batch.size,
      s"append mode must emit each (day, segment) exactly once " +
        s"(got ${streamed.size}, want ${batch.size})")
    assert(streamed === batch)
  }

  test("foreachBatch epoch-addressed file sink equals the batch aggregation") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.dailyTypeTotals(s, TestSpark.sfDir).collect().toSeq
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .orderBy("day_start", "event_type")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size === batch.size,
      s"epoch layout read-back must hold each (day, type) exactly once " +
        s"(got ${streamed.size}, want ${batch.size})")
    assert(streamed === batch)
  }

  test("transformWithState record-breaking events equal the batch window form") {
    val s = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    val streamed =
      graft.streaming.EventStream.recordBreakingEvents(s, TestSpark.sfDir).collect().toSeq
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .withColumn("prev_max", max(col("value")).over(w))
      .filter(col("prev_max").isNull || col("value") > col("prev_max"))
      .select("user_id", "event_id", "ts", "value")
      .orderBy("user_id", "event_id")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size === batch.size,
      s"record events must match the window formulation " +
        s"(got ${streamed.size}, want ${batch.size})")
    assert(streamed.map(_.toString) === batch.map(_.toString))
    // re-run is deterministic (RocksDB state + event-time ordering)
    val again =
      graft.streaming.EventStream.recordBreakingEvents(s, TestSpark.sfDir).collect().toSeq
    assert(streamed.map(_.toString) === again.map(_.toString))
  }

  test("windowed stream resumes from checkpoint across a restart, exactly once") {
    val s = TestSpark.spark
    import java.nio.file.Files
    val staging = Files.createTempDirectory("graft_ckpt_staging")
    val outDir = Files.createTempDirectory("graft_ckpt_out")
    val ckpt = Files.createTempDirectory("graft_ckpt_state")
    try {
      val norm = Tables.df(s, TestSpark.sfDir, "events")
        .select("ts", "event_type", "value")
      val cut = "2024-01-16"
      // phase 1 data: the first half of the timeline only
      norm.filter(col("ts") < lit(cut).cast("timestamp"))
        .coalesce(1).write.mode("overwrite")
        .parquet(staging.resolve("chunk=1").toString)
      def runOnce(): Unit = {
        val q = s.readStream.schema(norm.schema)
          .option("recursiveFileLookup", "true").parquet(staging.toString)
          .withWatermark("ts", "2 hours")
          .filter(col("ts") < lit("2090-01-01").cast("timestamp"))
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("win_start"), col("event_type"), col("n"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
            batch.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      runOnce() // phase 1: early windows emit, boundary windows stay in state
      // phase 2: later half + a far-future flush row, then RESTART from the
      // same checkpoint — recovered state must finish the boundary windows
      // without re-emitting phase-1 output
      val flush = s.sql(
        "SELECT TIMESTAMP '2099-01-01 00:00:00' AS ts, '__flush__' AS event_type, 0.0 AS value")
      norm.filter(col("ts") >= lit(cut).cast("timestamp")).union(flush)
        .coalesce(1).write.mode("overwrite")
        .parquet(staging.resolve("chunk=2").toString)
      runOnce()
      val streamed = s.read.option("recursiveFileLookup", "true")
        .parquet(outDir.toString)
        .select("win_start", "event_type", "n")
      val batch = Tables.df(s, TestSpark.sfDir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(streamed.count() === batch.count(),
        "restart must emit every window exactly once (no loss, no re-emit)")
      assert(streamed.orderBy("win_start", "event_type").collect().toSeq ===
        batch.orderBy("win_start", "event_type").collect().toSeq)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p)) Files.list(p).forEach(rm)
        Files.deleteIfExists(p)
      }
      Seq(staging, outDir, ckpt).foreach(rm)
    }
  }

  test("stream-stream LEFT OUTER join emits unmatched clicks exactly once") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.clickErrorLeftJoin(s, TestSpark.sfDir).collect().toSeq
    val ev = Tables.df(s, TestSpark.sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("error_id"), col("ts").as("ets"))
    val batch = clicks.join(errors,
        col("cu") === col("eu") && col("ets") >= col("cts") &&
          col("ets") <= col("cts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("click_id"), col("error_id"))
      .orderBy(col("click_id"), col("error_id").asc_nulls_first)
      .collect().toSeq
    assert(streamed.exists(_.isNullAt(1)),
      "outer rows (clicks with no error within the hour) must be emitted")
    assert(streamed.size === batch.size &&
      streamed.map(_.toString) === batch.map(_.toString),
      s"left-outer stream must equal the batch left join " +
        s"(got ${streamed.size}, want ${batch.size})")
    // every click appears at least once — matched or null-padded
    val nClicks = clicks.count()
    assert(streamed.map(_.getLong(0)).distinct.size.toLong === nClicks,
      "every click must appear in the outer join output")
  }

  test("event-time timers fire one inactivity audit per user with exact totals") {
    val s = TestSpark.spark
    val audits =
      graft.streaming.EventStream.inactivityAudit(s, TestSpark.sfDir).collect().toSeq
    val batch = Tables.df(s, TestSpark.sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("ts").as("last_ts"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total_value"))
      .orderBy("user_id")
      .collect().toSeq
    assert(audits.nonEmpty)
    assert(audits.map(_.getLong(0)).distinct.size === audits.size,
      "exactly one audit per user (timer re-armed, fired once)")
    assert(audits.size === batch.size &&
      audits.map(_.toString) === batch.map(_.toString),
      "timer-emitted audits must equal the batch per-user aggregate " +
        "(µs-precision last_ts included)")
  }

  test("stream-stream RIGHT OUTER join keeps every error exactly once") {
    val s = TestSpark.spark
    val streamed =
      graft.streaming.EventStream.clickErrorRightJoin(s, TestSpark.sfDir).collect().toSeq
    val ev = Tables.df(s, TestSpark.sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("error_id"), col("ts").as("ets"))
    val batch = clicks.join(errors,
        col("cu") === col("eu") && col("ets") >= col("cts") &&
          col("ets") <= col("cts") + expr("INTERVAL 1 HOUR"), "right_outer")
      .select(col("click_id"), col("error_id"))
      .orderBy(col("error_id"), col("click_id").asc_nulls_first)
      .collect().toSeq
    assert(streamed.map(_.toString) === batch.map(_.toString),
      s"right-outer stream must equal the batch right join " +
        s"(got ${streamed.size}, want ${batch.size})")
    // every error appears — matched to a preceding click or null-padded
    assert(streamed.map(_.getLong(1)).distinct.size.toLong === errors.count(),
      "every error must appear in the right-outer output")
  }

  test("late data arriving after eviction is dropped, not re-emitted") {
    val s = TestSpark.spark
    // the operator asserts numRowsDroppedByWatermark > 0 internally
    val streamed =
      graft.streaming.EventStream.lateDataWindowedCounts(s, TestSpark.sfDir)
        .collect().toSeq
    val ev = Tables.df(s, TestSpark.sfDir, "events")
    val b = ev.agg(min("ts").as("lo"), max("ts").as("hi")).head()
    val cutoff = new java.sql.Timestamp(
      b.getTimestamp(0).getTime +
        ((b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 4 + 1))
    val batch = ev.filter(col("ts") >= lit(cutoff))
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("win_start", "event_type")
      .collect().toSeq
    assert(streamed.map(_.toString) === batch.map(_.toString),
      "post-eviction late rows must be rejected; output = on-time aggregate " +
        s"(got ${streamed.size} windows, want ${batch.size})")
    // and every window key appears exactly once (append exactly-once held)
    assert(streamed.map(r => (r.get(0), r.getString(1))).distinct.size === streamed.size)
  }

  test("multi-batch stream (maxFilesPerTrigger=1) equals the single-trigger result") {
    val s = TestSpark.spark
    // the operator itself asserts >=3 data-carrying micro-batches ran
    val multi =
      graft.streaming.EventStream.multiBatchWindowedCounts(s, TestSpark.sfDir)
        .collect().toSeq
    val single =
      graft.streaming.EventStream.windowedCounts(s, TestSpark.sfDir).collect().toSeq
    assert(multi.size === single.size && multi.map(_.toString) === single.map(_.toString),
      "watermark advancement across micro-batches must not change results " +
        s"(got ${multi.size}, want ${single.size})")
  }
}
