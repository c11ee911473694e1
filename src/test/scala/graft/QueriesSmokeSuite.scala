package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs every SparkEntry operator at sf0.001: non-empty schema, successful
  * execution, and rows > 0 for the entries where the data guarantees output.
  */
class QueriesSmokeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Entries that may legitimately return zero rows at sf0.001. The five
  // round-9 vacuously-green entries (q15/q54/q55/q190/p15) were de-vacuated
  // in round 10 — predicates tuned so each yields rows at EVERY SF — and
  // must stay out of this list.
  private val mayBeEmpty = Set(
    "q13_join_full", "q20_group_having", "q60_in_subquery", "q84_pg_params",
    "p03_minhash_neardup", "p05_ngram_jaccard")

  // Tripwire for Bench.isStreaming's name heuristic: onQueryStarted fires
  // synchronously with start(), so the per-entry delta tells exactly
  // whether an entry ran a StreamingQuery — both misclassification
  // directions (a streaming entry the bench would double-time, and a
  // "…stream…"-named batch entry the bench would single-time) fail loudly.
  private val streamStarts = new java.util.concurrent.atomic.AtomicInteger
  private lazy val listenerReady: Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        streamStarts.incrementAndGet()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
  }

  SparkEntry.all.foreach { q =>
    test(q.name) {
      listenerReady
      val before = streamStarts.get()
      val df = q.fn(spark, TestSpark.sfDir)
      assert(df.schema.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      val started = streamStarts.get() - before
      if (Bench.isStreaming(q.name)) {
        assert(started > 0,
          s"${q.name} is bench-flagged streaming but started no StreamingQuery")
      } else {
        assert(started === 0,
          s"${q.name} started $started StreamingQueries but Bench.isStreaming " +
            "doesn't flag it — it would be double-timed in bench pass 2")
      }
    }
  }

  test("entry names containing 'stream' all match the anchored convention") {
    val offenders = SparkEntry.all.map(_.name)
      .filter(n => n.contains("stream") && !Bench.isStreaming(n))
    assert(offenders.isEmpty,
      s"$offenders contain 'stream' without matching qNN_stream[_...] — " +
        "rename to the convention or classify explicitly in Bench.StreamingName")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key matches a query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("bucketed join plans without a shuffle exchange") {
    val df = SparkEntry.queries("q46_bucketed_join")(spark, TestSpark.sfDir)
    df.count() // materialize so AQE finalizes
    val plan = df.queryExecution.executedPlan.toString
    val joinRegion = plan.split("HashAggregate").head
    assert(!plan.contains("CartesianProduct"))
    // the join itself must read the bucketed layout directly — the only
    // acceptable exchange is the one AFTER aggregation for the final sort
    assert("Exchange hashpartitioning\\(l_orderkey".r.findFirstIn(plan).isEmpty &&
      "Exchange hashpartitioning\\(o_orderkey".r.findFirstIn(plan).isEmpty,
      s"bucketed join must not shuffle its inputs:\n$plan")
  }

  test("scale guards: no crossJoin/collect in pipeline operator plans") {
    for (name <- Seq("p03_minhash_neardup", "p05_ngram_jaccard", "p07_ann_lsh",
        "q96_asof_join", "q98_range_join", "p21_seq_packing",
        "p32_boilerplate_spans", "p33_token_rarity")) {
      val plan = SparkEntry.queries(name)(spark, TestSpark.sfDir)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("Cartesian"), s"$name must not plan a cartesian product")
    }
  }

  test("workload-shape plans: dims broadcast, top-k stays TakeOrdered") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
    // Q3/Q10/Q18: a LIMIT over ORDER BY must plan as TakeOrderedAndProject
    // (per-partition top-k + driver merge), never a global sort
    for (n <- Seq("q100_tpch_q3", "q102_tpch_q10", "q103_tpch_q18"))
      assert(plan(n).contains("TakeOrderedAndProject"), s"$n must plan top-k")
    // Q5: every dimension rides a broadcast join; the only sort-merge or
    // shuffled-hash join allowed is the orders-lineitem fact join
    val q5 = plan("q104_tpch_q5")
    assert("BroadcastHashJoin".r.findAllIn(q5).size >= 4,
      s"q104 dims must broadcast:\n$q5")
    assert(!q5.contains("CartesianProduct") && !q5.contains("BroadcastNestedLoop"))
    // the bucketed range join stays an equi-join on the time bin
    val q98 = plan("q98_range_join")
    assert(!q98.contains("BroadcastNestedLoop") && !q98.contains("CartesianProduct"),
      s"q98 must bucket into an equi-join:\n$q98")
  }

  test("DS-shape plans: single-scan linearizations hold") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
    // q110 linearizes the DS q74 self-join to conditional aggregation: the
    // whole query must stay ONE fact scan + ONE hash shuffle + top-k
    val q110 = plan("q110_ds_yoy_growth")
    assert("FileScan".r.findAllIn(q110).size == 1, s"q110 must scan once:\n$q110")
    assert("Exchange hashpartitioning".r.findAllIn(q110).size == 1,
      s"q110 must shuffle once:\n$q110")
    assert(q110.contains("TakeOrderedAndProject"), s"q110 must plan top-k:\n$q110")
    // q112 collapses DS q88's 8 scalar subqueries into one pass
    val q112 = plan("q112_ds_multi_conditional")
    assert("FileScan".r.findAllIn(q112).size == 1, s"q112 must scan once:\n$q112")
    // q214 likewise: the 4 timeband scalar subqueries become one scan of
    // conditional counts
    val q214 = plan("q214_ds_timeband_report")
    assert("FileScan".r.findAllIn(q214).size == 1, s"q214 must scan once:\n$q214")
    // q116's disjunctive EXISTS must decorrelate to joins, not a nested loop
    // over the fact side
    val q116 = plan("q116_ds_exists_or")
    assert(!q116.contains("CartesianProduct"), s"q116 must decorrelate:\n$q116")
    // q118's global rank must run over the aggregated per-part table: the
    // single-partition exchange may carry only post-aggregate attributes
    val q118 = plan("q118_ds_return_ratio_rank")
    assert("FileScan".r.findAllIn(q118).size == 1, s"q118 must scan once:\n$q118")
    assert(q118.contains("Window"), s"q118 must plan a rank window:\n$q118")
    // q121's rank window must consume the rollup AGGREGATE (Expand feeds
    // HashAggregate feeds Window), never fact rows, and the rank<=3 filter
    // must push into the sort as a WindowGroupLimit
    val q121 = plan("q121_ds_rollup_rank")
    assert(q121.contains("Expand"), s"q121 must plan a rollup Expand:\n$q121")
    assert(q121.contains("WindowGroupLimit"),
      s"q121 must push rank<=3 into WindowGroupLimit:\n$q121")
    assert(q121.contains("BroadcastHashJoin"), s"q121 dim must broadcast:\n$q121")
    // q129 linearizes DS q64's CTE self-join: both fact tables are scanned
    // exactly ONCE (the DS original pays two passes over each)
    val q129 = plan("q129_ds_repeat_purchase")
    assert("FileScan".r.findAllIn(q129).size == 2, s"q129 must scan each fact once:\n$q129")
    assert(!q129.contains("CartesianProduct"), s"q129 must stay equi-join:\n$q129")
    // q130 collapses DS q78's four channel-year passes into one scan + one
    // custkey shuffle
    val q130 = plan("q130_ds_channel_anticorr")
    assert("FileScan".r.findAllIn(q130).size == 1, s"q130 must scan once:\n$q130")
    assert("Exchange hashpartitioning".r.findAllIn(q130).size == 1,
      s"q130 must shuffle once:\n$q130")
    // q131's three windows all consume the aggregated series, with the
    // nation dim broadcast — no window may sit below the aggregate
    val q131 = plan("q131_ds_monthly_deviation")
    assert(q131.contains("Window"), s"q131 must plan windows:\n$q131")
    assert(q131.contains("BroadcastHashJoin"), s"q131 dims must broadcast:\n$q131")
    assert(!q131.contains("CartesianProduct"), s"q131 must stay equi-join:\n$q131")
    assert(q131.indexOf("Window") < q131.indexOf("HashAggregate"),
      s"q131 windows must run over the aggregate (window above agg in plan):\n$q131")
    // q136's banding cascades two aggregations off ONE orders scan — the
    // DS original's HAVING + self-join would scan twice
    val q136 = plan("q136_ds_order_bands")
    assert("FileScan".r.findAllIn(q136).size == 1, s"q136 must scan once:\n$q136")
    // q137's share gate reuses its own rollup via an unpartitioned window:
    // the fact side is scanned and aggregated exactly once, dims broadcast
    val q137 = plan("q137_ds_region_share")
    assert("orders\\.parquet".r.findAllIn(q137).size == 1,
      s"q137 must aggregate the fact side once:\n$q137")
    assert("BroadcastHashJoin".r.findAllIn(q137).size >= 2,
      s"q137 dims must broadcast:\n$q137")
    assert(q137.contains("Window"), s"q137 total must come from a window:\n$q137")
    // q138 is one conditional-agg pass over events: single scan, single
    // hash shuffle on user_id
    val q138 = plan("q138_ds_ampm_ratio")
    assert("FileScan".r.findAllIn(q138).size == 1, s"q138 must scan once:\n$q138")
    assert("Exchange hashpartitioning".r.findAllIn(q138).size == 1,
      s"q138 must shuffle once:\n$q138")
    // q142's round-trip join must probe the per-(cust, part, year)
    // AGGREGATE on both sides — pre-agg rows, never raw facts — and stay
    // an equi-join; each branch's year filter pushes to its scan (year
    // partition pruning at scale)
    val q142 = plan("q142_ds_cross_year")
    assert(!q142.contains("CartesianProduct") && !q142.contains("BroadcastNestedLoop"),
      s"q142 must stay equi-join:\n$q142")
    assert("HashAggregate".r.findAllIn(q142).size >= 4,
      s"q142 both round-trip sides must pre-aggregate:\n$q142")
    // q143's nation mean rides a window OVER the per-customer aggregate
    // (never a correlated re-plan of the fact join); window above agg
    val q143 = plan("q143_ds_return_outliers")
    assert(q143.contains("Window"), s"q143 mean must come from a window:\n$q143")
    assert(q143.indexOf("Window") < q143.indexOf("HashAggregate"),
      s"q143 window must consume the aggregate:\n$q143")
    assert(!q143.contains("CartesianProduct"), s"q143 must stay equi-join:\n$q143")
    // q144: one conditional-agg scan; rank<=10 pushes into WindowGroupLimit
    val q144 = plan("q144_ds_return_rank")
    assert("FileScan".r.findAllIn(q144).size == 1, s"q144 must scan once:\n$q144")
    assert(q144.contains("WindowGroupLimit"),
      s"q144 must push rank<=10 into WindowGroupLimit:\n$q144")
    // q145: eight census buckets from ONE scan (the DS original pays eight)
    val q145 = plan("q145_ds_hour_census")
    assert("FileScan".r.findAllIn(q145).size == 1, s"q145 must scan once:\n$q145")
  }

  test("partitioned read prunes to one year's directories at planning time") {
    val df = SparkEntry.queries("q159_partition_pruning")(spark, TestSpark.sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"),
      s"q159 year predicate must be a partition filter, not a data filter:\n$plan")
    // the pruned scan must read strictly fewer partitions than exist
    // (1995-2001 => 7 year directories, one survives)
    val m = "partition count: (\\d+)".r.findFirstMatchIn(plan)
    assert(m.forall(_.group(1).toInt == 1),
      s"q159 must read exactly one year partition:\n$plan")
  }

  test("closing pipeline plans: projection shuffle-free, budget cut broadcast") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
    // p53: the projection is pure per-row expression work — no join, no
    // aggregate, no shuffle besides the final output sort
    val p53 = plan("p53_random_projection")
    assert(!p53.contains("Join") && !p53.contains("HashAggregate"),
      s"p53 must stay expression-only:\n$p53")
    // the ONLY exchange allowed is the range partitioning for the output
    // sort — the projection itself moves no data
    assert("Exchange".r.findAllIn(p53).size == 1,
      s"p53 must not shuffle before the output sort:\n$p53")
    // p54: the corpus side joins only BROADCAST sides (bucket table +
    // budget scalar) — a sort-merge join here would mean the global-sort
    // formulation snuck back in
    val p54 = plan("p54_token_budget_select")
    assert("BroadcastExchange".r.findAllIn(p54).size >= 2,
      s"p54 bucket table and budget must broadcast:\n$p54")
    assert(!p54.contains("SortMergeJoin"), s"p54 must not shuffle-join:\n$p54")
    // p55: the vocab cap must plan as per-partition top-k + driver merge,
    // and the token stream must partial-aggregate map-side
    val p55 = plan("p55_vocab_coverage")
    assert(p55.contains("TakeOrderedAndProject"), s"p55 cap must be top-k:\n$p55")
    assert("HashAggregate".r.findAllIn(p55).size >= 2,
      s"p55 frequencies must partial-aggregate:\n$p55")
    // p56/p57: one scan each, partial+final hash aggregation on the
    // (label,dim)/(dim) keys
    for (n <- Seq("p56_label_centroids", "p57_dim_health")) {
      val p = plan(n)
      assert("FileScan".r.findAllIn(p).size == 1, s"$n must scan once:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$n must partial-aggregate:\n$p")
    }
  }

  test("TPC-H completion plans: dims broadcast, windows over aggregates") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
    // Q7/Q8/Q9: every dimension broadcasts; the only shuffle joins are
    // fact-fact on the order key
    for ((n, minBc) <- Seq("q148_tpch_q7" -> 3, "q149_tpch_q8" -> 5, "q150_tpch_q9" -> 3)) {
      val p = plan(n)
      assert("BroadcastHashJoin".r.findAllIn(p).size >= minBc, s"$n dims must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n must stay equi-join:\n$p")
    }
    // Q13: the zero-order bucket requires the OUTER join to survive planning
    val q151 = plan("q151_tpch_q13")
    assert(q151.contains("LeftOuter"), s"q151 left join must survive:\n$q151")
    // Q15: the max gate is a window over the per-supplier aggregate —
    // lineitem is scanned once, never re-aggregated for the scalar
    val q153 = plan("q153_tpch_q15")
    assert("lineitem\\.parquet".r.findAllIn(q153).size == 1,
      s"q153 must scan lineitem once:\n$q153")
    assert(q153.contains("Window"), s"q153 max must ride a window:\n$q153")
    // Q16: the complaints exclusion is a broadcast anti-join
    val q154 = plan("q154_tpch_q16")
    assert(q154.contains("LeftAnti"), s"q154 must plan an anti-join:\n$q154")
    // Q17: the correlated per-part average decorrelates to a window over
    // the brand-restricted rows — one lineitem scan total
    val q155 = plan("q155_tpch_q17")
    assert("lineitem\\.parquet".r.findAllIn(q155).size == 1,
      s"q155 must scan lineitem once:\n$q155")
    assert(q155.contains("Window"), s"q155 avg must ride a window:\n$q155")
    // Q19: the disjunction must not break the partkey equi-join
    val q156 = plan("q156_tpch_q19")
    assert(q156.contains("BroadcastHashJoin") && !q156.contains("CartesianProduct"),
      s"q156 must stay a broadcast equi-join:\n$q156")
    // Q20: dominance test = window over the (supp, part) aggregate
    val q157 = plan("q157_tpch_q20")
    assert("lineitem\\.parquet".r.findAllIn(q157).size == 1,
      s"q157 must scan lineitem once:\n$q157")
    // (plan-string index ordering is unusable here: the DISTINCT above the
    // window is itself a HashAggregate) — one scan + a window is the
    // single-pass evidence
    assert(q157.contains("Window"), s"q157 share must ride a window:\n$q157")
    // Q22: dormant filter is an anti-join; the global-average gate joins a
    // broadcast 1-row aggregate
    val q158 = plan("q158_tpch_q22")
    assert(q158.contains("LeftAnti"), s"q158 must plan an anti-join:\n$q158")
  }

  test("DS-shape plans VI: one-pass conditional aggregates hold") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
    // q165: both year-series come from ONE orders pass (q59's reference
    // formulation joins two channel CTEs — two fact scans)
    val q165 = plan("q165_ds_weekday_compare")
    assert("orders\\.parquet".r.findAllIn(q165).size == 1,
      s"q165 must scan orders once:\n$q165")
    assert(!q165.contains("CartesianProduct"), s"q165 must stay equi-join:\n$q165")
    // q166: the 12-column month matrix is one scan + one shuffle of
    // 25-row partial states; nation broadcasts
    val q166 = plan("q166_ds_monthly_matrix")
    assert("orders\\.parquet".r.findAllIn(q166).size == 1,
      s"q166 must scan orders once:\n$q166")
    assert(q166.contains("BroadcastHashJoin"), s"q166 dims must broadcast:\n$q166")
    // q167: the band disjunction stays ONE predicate over one fact pass —
    // never a per-band UNION of scans
    val q167 = plan("q167_ds_band_disjunction")
    assert("lineitem\\.parquet".r.findAllIn(q167).size == 1,
      s"q167 must scan lineitem once:\n$q167")
    assert(!q167.contains("Union"), s"q167 must not split into a union:\n$q167")
    // q168: the global-growth scalar must come off the SAME per-customer
    // aggregate — after AQE finalizes, the gate branch rides a
    // ReusedExchange instead of paying a second orders scan+shuffle
    val q168df = SparkEntry.queries("q168_ds_growth_gate")(spark, TestSpark.sfDir)
    q168df.collect() // AQE finalizes this df's own plan in place
    val q168 = q168df.queryExecution.executedPlan.toString
    assert("orders\\.parquet".r.findAllIn(q168).size == 1 ||
      q168.contains("ReusedExchange"),
      s"q168 scalar gate must reuse the aggregate's exchange:\n$q168")
    assert(q168.contains("TakeOrderedAndProject"), s"q168 must plan top-k:\n$q168")
    // p35: the funnel is expression-only + one aggregate — no join at all
    val p35 = plan("p35_quality_funnel")
    assert("documents\\.parquet".r.findAllIn(p35).size == 1,
      s"p35 must scan documents once:\n$p35")
    assert(!p35.contains("Join"), s"p35 must not plan any join:\n$p35")
    // q170: five band averages = ONE scan (the DS q9 original pays 15)
    val q170 = plan("q170_ds_band_scalar_report")
    assert("lineitem\\.parquet".r.findAllIn(q170).size == 1,
      s"q170 must scan lineitem once:\n$q170")
    // q171: the three-window union report must stay one scan with the
    // window-union predicate PUSHED to it, never a UNION of three passes
    val q171 = plan("q171_ds_union_report")
    assert("lineitem\\.parquet".r.findAllIn(q171).size == 1,
      s"q171 must scan lineitem once:\n$q171")
    assert(!q171.contains("Union"), s"q171 must not plan a union:\n$q171")
    assert(q171.contains("PushedFilters: [Or("),
      s"q171 window-union disjunction must push to the scan:\n$q171")
    // p36: budget selection = one scan + one source-partitioned window
    val p36 = plan("p36_token_budget")
    assert("documents\\.parquet".r.findAllIn(p36).size == 1,
      s"p36 must scan documents once:\n$p36")
    assert("Exchange hashpartitioning\\(source".r.findFirstIn(p36).isDefined,
      s"p36 window must partition by source (parallel per source):\n$p36")
  }

  test("LATERAL subquery decorrelates to one scan + rank window") {
    val df = SparkEntry.queries("q122_lateral_join")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // one customer scan total — the naive reading is |nation| re-scans
    assert("customer\\.parquet".r.findAllIn(plan).size == 1,
      s"q122 must scan customer exactly once:\n$plan")
    assert(plan.contains("Window"), s"q122 must decorrelate to a rank window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q122 must not plan a nested loop:\n$plan")
  }

  test("DS-shape plans VIII: premium-part broadcast, window-over-aggregate, one-pass bands") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
    // q190: the category-average premium-part set must BROADCAST into the
    // fact pass (it is a filtered dim), never shuffle the fact on partkey
    val q190 = plan("q190_ds_above_category_avg")
    assert(q190.contains("BroadcastHashJoin"), s"q190 dims must broadcast:\n$q190")
    assert(!q190.contains("CartesianProduct"), s"q190 must stay equi-join:\n$q190")
    // q191: the per-supplier average must be a window over the (supp, part)
    // AGGREGATE — one lineitem scan, no self-join second pass
    val q191 = plan("q191_ds_laggard_items")
    assert("lineitem\\.parquet".r.findAllIn(q191).size == 1,
      s"q191 must scan lineitem once:\n$q191")
    assert(q191.contains("Window"), s"q191 average must be a window:\n$q191")
    // q192: the three channel series are conditional aggregates of ONE
    // lineitem pass — never a per-channel union of scans
    val q192 = plan("q192_ds_balanced_channel")
    assert("lineitem\\.parquet".r.findAllIn(q192).size == 1,
      s"q192 must scan lineitem once:\n$q192")
    assert(!q192.contains("Union"), s"q192 must not split into a union:\n$q192")
    // q193: supplier/nation dims broadcast around the one fact-fact join
    val q193 = plan("q193_ds_ship_lag_matrix")
    assert(q193.contains("BroadcastHashJoin"), s"q193 dims must broadcast:\n$q193")
    assert("lineitem\\.parquet".r.findAllIn(q193).size == 1,
      s"q193 must scan lineitem once:\n$q193")
    // q194: the before/after split is conditional aggregation over ONE
    // date-pruned scan with the ±30-day filter pushed to the read
    val q194 = plan("q194_ds_before_after")
    assert("lineitem\\.parquet".r.findAllIn(q194).size == 1,
      s"q194 must scan lineitem once:\n$q194")
    assert(q194.contains("GreaterThanOrEqual(l_shipdate") &&
      q194.contains("LessThan(l_shipdate"),
      s"q194 date band must push to the scan:\n$q194")
  }

  test("bucket pruning: the point filter reads one bucket of eight") {
    val plan = SparkEntry.queries("q207_bucket_pruning")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"o_custkey = 5 must prune to a single bucket:\n$plan")
  }

  test("segment-dedup plans: every window hash-partitions, nothing single-partition") {
    // p58/p59 put a window over EXPLODED per-segment rows — the one shape
    // that dies at 100 TB if the window loses its PARTITION BY (all token
    // windows through one task). Pin: the plans carry windows but never a
    // SinglePartition exchange.
    for (n <- Seq("p58_segment_dedup", "p59_substring_dup_coverage")) {
      val plan = SparkEntry.queries(n)(spark, TestSpark.sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Window"), s"$n must plan a window:\n$plan")
      assert(!plan.contains("Exchange SinglePartition"),
        s"$n must never funnel rows through one partition:\n$plan")
    }
  }
}
