package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators the reference cannot express as single relational
  * queries (its engine has no as-of join, session windows, or range joins —
  * SURVEY.md §2B): each is rebuilt here as a composition of idiomatic Spark
  * primitives chosen for the 100 TB case, with an ANSI-SQL oracle.
  *
  * Scale notes, per operator:
  *  - as-of join: the textbook scalable formulation — union the two tagged
  *    streams, one hash-partitioned window pass per key. No per-row probe,
  *    no range explosion; cost is one shuffle on the join key.
  *  - sessionization: Spark's native `session_window` (gap merge inside the
  *    aggregation operator, map-side partial merge; state bounded per key).
  *  - range join (no equi key): time-bucketed binning — each probe row
  *    expands to the 3 covering buckets, the build side keeps its own
  *    bucket, and the join becomes an equi-join on bucket with an exact
  *    residual filter. Candidate mass stays linear in events-per-window
  *    instead of the quadratic cartesian a naive theta join plans.
  */
object Temporal {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** ±5 minutes, in microseconds (events.ts is µs-normalized by Tables). */
  private val RangeUs = 300000000L

  val entries: Seq[QE] = Seq(
    // As-of join: for every 'view' event, the timestamp of the same user's
    // most recent 'purchase' at or before it. One window pass over the
    // union, ordered so that an equal-timestamp purchase sorts before the
    // view that observes it (oracle semantics: p.ts <= e.ts).
    QE("q96_asof_join", Some("""
      SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
             (SELECT CAST(max(p.ts) AS TIMESTAMP) FROM events p
               WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                 AND p.ts <= e.ts) AS last_purchase_ts
      FROM events e WHERE e.event_type = 'view'
      ORDER BY e.event_id"""),
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val isP = (col("event_type") === "purchase").cast("int")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, isP.desc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_purchase_ts",
            last(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts", "last_purchase_ts")
          .orderBy("event_id")
      }),

    // Gap-based sessionization: per-user activity sessions with a 6-hour
    // inactivity gap, via the native session_window aggregation. The oracle
    // rebuilds the same islands with lag + running-sum window SQL.
    QE("q97_sessionize", Some("""
      WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      m AS (SELECT user_id, ts, value,
              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
            FROM o),
      g AS (SELECT user_id, ts, value,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM m)
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, first_ts"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
          .agg(min("ts").as("first_ts"), max("ts").as("last_ts"),
            count(lit(1)).as("n_events"), Q.dsum(col("value")).as("total_value"))
          .select("user_id", "first_ts", "last_ts", "n_events", "total_value")
          .orderBy("user_id", "first_ts")),

    // DYNAMIC-GAP sessionization: the inactivity gap is an expression of
    // the row (clicks cool off in 2 hours, everything else in 6), so each
    // event contributes an interval [ts, ts+gap) and a session is a merged
    // run of overlapping intervals. The oracle rebuilds exactly that
    // semantics: a session break is a row starting at-or-after the RUNNING
    // MAX of all previous ends (a plain lag-gap check is wrong here — a
    // long-gap event can bridge over a later short-gap one). Same one-
    // shuffle plan as the static-gap form; the gap expression rides the
    // partial aggregation.
    QE("q197_session_dynamic_gap", Some("""
      WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN event_type = 'click' THEN INTERVAL 2 HOUR
                        ELSE INTERVAL 6 HOUR END AS gap
                 FROM events),
      m AS (SELECT user_id, ts,
              MAX(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM o),
      b AS (SELECT user_id, ts,
              CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END AS brk
            FROM m),
      g AS (SELECT user_id, ts,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM b)
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             COUNT(*) AS n_events
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, first_ts"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("user_id"), session_window(col("ts"),
            // session_window's per-row gap requires CalendarIntervalType
            // (an `expr("INTERVAL ...")` literal is DayTimeIntervalType in
            // Spark 4 and is rejected); interval-string columns are cast
            when(col("event_type") === "click", lit("2 hours"))
              .otherwise(lit("6 hours"))))
          .agg(min("ts").as("first_ts"), max("ts").as("last_ts"),
            count(lit(1)).as("n_events"))
          .select("user_id", "first_ts", "last_ts", "n_events")
          .orderBy("user_id", "first_ts")),

    // Pure range join (no equi key): for each 'error' event, how many
    // 'click' events (any user) fall within ±5 minutes. Bucketing turns it
    // into an equi-join on the 5-minute bin: the error side expands to its 3
    // covering bins, each click stays in its own bin, so every true pair
    // meets in exactly one bin and the residual |Δt| filter is exact.
    QE("q98_range_join", Some("""
      SELECT e.event_id,
             (SELECT COUNT(*) FROM events c
               WHERE c.event_type = 'click'
                 AND ABS(epoch_us(CAST(c.ts AS TIMESTAMP))
                         - epoch_us(CAST(e.ts AS TIMESTAMP))) <= 300000000) AS n_nearby_clicks
      FROM events e WHERE e.event_type = 'error'
      ORDER BY e.event_id"""),
      (s, d) => {
        val ev = t(s, d, "events")
        val errs = ev.filter(col("event_type") === "error")
          .select(col("event_id"), unix_micros(col("ts")).as("eus"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), unix_micros(col("ts")).as("cus"))
          .withColumn("bin", floor(col("cus") / RangeUs))
        val b = floor(col("eus") / RangeUs)
        errs.withColumn("bin", explode(array(b - 1, b, b + 1)))
          .join(clicks, Seq("bin"), "left")
          .groupBy("event_id")
          .agg(count(when(abs(col("cus") - col("eus")) <= RangeUs, col("cid")))
            .as("n_nearby_clicks"))
          .orderBy("event_id")
      }),

    // Watermarked stream-stream inner join (clicks x same-user errors
    // within 1 hour): both sides' join state is watermark-evicted; the
    // emitted id-pair set is arrival-order-independent, so the batch
    // self-join is an exact oracle.
    QE("q92_stream_stream_join", Some("""
      SELECT c.event_id AS click_id, e.event_id AS error_id
      FROM events c JOIN events e ON c.user_id = e.user_id
       AND c.event_type = 'click' AND e.event_type = 'error'
       AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, error_id"""),
      (s, d) => graft.streaming.EventStream.clickErrorJoin(s, d)),

    // Streaming exact dedup with watermark-bounded key state
    // (dropDuplicatesWithinWatermark): emits the distinct (user, type) set;
    // key-only projection makes it arrival-order-insensitive, so the batch
    // DISTINCT is an exact oracle.
    QE("q93_stream_dedup", Some("""
      SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""),
      (s, d) => graft.streaming.EventStream.streamDedup(s, d)),

    // Custom keyed streaming state (flatMapGroupsWithState): one alert per
    // user at the first event crossing a cumulative-value threshold. The
    // oracle is the batch window formulation of the same rule.
    QE("q94_stream_cusum_alert", Some("""
      WITH c AS (SELECT user_id, event_id, ts,
                   CAST(SUM(CAST(value AS DECIMAL(12,2)))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
                 FROM events)
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, cum
      FROM c WHERE cum > 500
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
      ORDER BY user_id"""),
      (s, d) => graft.streaming.EventStream.thresholdAlerts(s, d)),

    // The same sessions computed as a STREAM (session_window merging state,
    // append mode, watermark-evicted): value-checked against the identical
    // islands oracle as q97, so the streaming path is oracle-exact too.
    QE("q99_stream_sessionize", Some("""
      WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      m AS (SELECT user_id, ts, value,
              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
            FROM o),
      g AS (SELECT user_id, ts, value,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM m)
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, first_ts"""),
      (s, d) => graft.streaming.EventStream.sessionizedCounts(s, d)),

    // Stream-static enrichment join (broadcast dimension, stateless join,
    // watermarked day-window agg downstream). The oracle is the equivalent
    // batch join + group-by; the day bucket is epoch-aligned UTC, which
    // date_trunc reproduces exactly.
    QE("q120_stream_static_join", Some("""
      SELECT CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP) AS day_start,
             c.c_mktsegment,
             COUNT(*) AS n,
             CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2 ORDER BY day_start, c_mktsegment"""),
      (s, d) => graft.streaming.EventStream.enrichedSegmentSpend(s, d)),

    // Spark 4 transformWithState (the modern arbitrary-state API, RocksDB
    // state store, named ValueState per user): every event strictly
    // exceeding its user's running-max value. The oracle is the batch
    // window formulation — max over the event-time-ordered preceding rows.
    // Values pass through unchanged (no arithmetic), so strict-> compares
    // identical doubles in both engines and the hash check is exact.
    QE("q139_stream_record_events", Some("""
      WITH w AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM events)
      SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS value
      FROM w WHERE prev_max IS NULL OR value > prev_max
      ORDER BY user_id, event_id"""),
      (s, d) => graft.streaming.EventStream.recordBreakingEvents(s, d)),

    // Windowed day totals delivered through foreachBatch to an
    // epoch-addressed parquet sink — the exactly-once FILE output pattern
    // (idempotent overwrite per epoch directory) the memory-sink entries
    // can't exercise. The read-back of the epoch layout must equal the
    // batch day-bucket aggregate exactly.
    QE("q169_stream_foreach_batch", Some("""
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY day_start, event_type"""),
      (s, d) => graft.streaming.EventStream.dailyTypeTotals(s, d)),

    // Six-hour windows under Trigger.AvailableNow — the scheduled-backfill
    // trigger (process everything available, then self-terminate; resume
    // from checkpoint next launch). The window start is epoch-aligned, so
    // the oracle reproduces it with integer epoch-microsecond arithmetic.
    QE("q180_stream_available_now", Some("""
      SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600000000) AS win_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      (s, d) => graft.streaming.EventStream.availableNowWindowTotals(s, d)),

    // Streaming per-user top-3 by value via transformWithState with
    // LIST-valued state (ListState; q139 covers ValueState) — state capped
    // at k entries per key, the invariant that keeps streaming top-k
    // O(keys*k) at any stream length. Oracle: the batch rank window.
    QE("q181_stream_topk_state", Some("""
      WITH r AS (SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rnk
                 FROM events)
      SELECT user_id, CAST(rnk AS INT) AS rnk, event_id,
             CAST(value AS DOUBLE) AS value
      FROM r WHERE rnk <= 3 ORDER BY user_id, rnk"""),
      (s, d) => graft.streaming.EventStream.topKPerUser(s, d)),

    // Streaming per-(user, type) census via transformWithState with
    // MAP-valued state — the third state primitive next to ValueState
    // (q139) and ListState (q181); state is O(keys * |type vocabulary|).
    QE("q182_stream_map_state", Some("""
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""),
      (s, d) => graft.streaming.EventStream.typeCensusPerUser(s, d)),

    // Watermarked stream-stream LEFT OUTER join: unmatched clicks are
    // emitted with NULL error ids only once the watermark proves no match
    // can still arrive (then their join state is evicted). Oracle: the
    // batch LEFT JOIN — both engines ordered NULLS FIRST to agree.
    QE("q187_stream_left_outer_join", Some("""
      SELECT c.event_id AS click_id, e.event_id AS error_id
      FROM events c LEFT JOIN events e ON c.user_id = e.user_id
       AND e.event_type = 'error'
       AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
      WHERE c.event_type = 'click'
      ORDER BY click_id, error_id NULLS FIRST"""),
      (s, d) => graft.streaming.EventStream.clickErrorLeftJoin(s, d)),

    // transformWithState with EVENT-TIME TIMERS (TimeMode.EventTime,
    // registerTimer/deleteTimer/handleExpiredTimer): per-user audit row
    // emitted after 6h of event-time inactivity — output driven by the
    // ABSENCE of input. Bounded replay fires each user's timer exactly
    // once (sentinel-advanced watermark), so the batch per-user aggregate
    // is an exact oracle; cents arithmetic keeps the total bit-exact.
    QE("q188_stream_timers", Some("""
      SELECT user_id, COUNT(*) AS n_events,
             MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, d) => graft.streaming.EventStream.inactivityAudit(s, d)),

    // UNION of two independent file streams (separate click / error feeds,
    // each with its own sentinel) aggregated by one shared watermark +
    // hourly window — the multi-source streaming topology. The watermark
    // advances with the minimum across sources, so results equal the batch
    // aggregate over both types.
    QE("q200_stream_union", Some("""
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
             event_type, COUNT(*) AS n
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      (s, d) => graft.streaming.EventStream.unionTypedStreams(s, d)),

    // Stream-stream RIGHT OUTER join — the mirror of q187: every error
    // kept, null click_id when no same-user click preceded it within the
    // hour; unmatched rows emit once the watermark closes their interval.
    // Oracle: the batch RIGHT JOIN with the same band.
    QE("q213_stream_right_outer_join", Some("""
      SELECT c.event_id AS click_id, e.event_id AS error_id
      FROM events c RIGHT JOIN events e ON c.user_id = e.user_id
       AND c.event_type = 'click'
       AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
      WHERE e.event_type = 'error'
      ORDER BY error_id, click_id NULLS FIRST"""),
      (s, d) => graft.streaming.EventStream.clickErrorRightJoin(s, d)),

    // Stream-stream FULL OUTER join: matched pairs plus null-padded
    // unmatched rows from BOTH sides, each emitted exactly once when the
    // watermark closes its interval. Oracle: the batch FULL JOIN with the
    // same time band (type filters pre-applied to each side).
    QE("q201_stream_full_outer_join", Some("""
      WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
      e AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error')
      SELECT c.event_id AS click_id, e.event_id AS error_id
      FROM c FULL JOIN e ON c.user_id = e.user_id
       AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id NULLS FIRST, error_id NULLS FIRST"""),
      (s, d) => graft.streaming.EventStream.clickErrorFullJoin(s, d)),

    // Stream-stream LEFT SEMI join: the existence form — each click at
    // most once, iff a same-user error follows within the hour. Oracle:
    // batch EXISTS.
    QE("q202_stream_semi_join", Some("""
      SELECT c.event_id AS click_id
      FROM events c WHERE c.event_type = 'click' AND EXISTS (
        SELECT 1 FROM events e WHERE e.event_type = 'error'
          AND e.user_id = c.user_id
          AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR)
      ORDER BY click_id"""),
      (s, d) => graft.streaming.EventStream.clickErrorSemiJoin(s, d)),

    // The q95 hourly windows computed across MULTIPLE micro-batches
    // (maxFilesPerTrigger=1 over four time-span files): watermark
    // advancement BETWEEN triggers — the mechanism that bounds state on a
    // live stream — emits and evicts each batch's closed windows before the
    // next arrives; the drain asserts >=3 data batches so the entry can
    // never silently collapse back to a single-trigger replay. Same oracle
    // as q95: emission timing changes, content must not.
    QE("q216_stream_multibatch", Some("""
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      (s, d) => graft.streaming.EventStream.multiBatchWindowedCounts(s, d)),

    // LATE-DATA REJECTION: the oldest quarter of the events arrives a
    // trigger AFTER the watermark has advanced past its windows, so the
    // aggregation must DROP all of it (the operator asserts
    // numRowsDroppedByWatermark > 0) — the enforcement half of watermark
    // semantics, which in-order replays never exercise. Oracle: the
    // hourly aggregate over on-time rows only, with the identical
    // millisecond cutoff arithmetic.
    QE("q225_stream_late_data", Some("""
      WITH b AS (SELECT epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS lo,
                        epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS hi FROM events),
      ot AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events, b
             WHERE epoch_ms(CAST(ts AS TIMESTAMP)) >= lo + ((hi - lo) // 4 + 1))
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
             event_type, COUNT(*) AS n
      FROM ot GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      (s, d) => graft.streaming.EventStream.lateDataWindowedCounts(s, d)),

    // Incrementally-maintained day rollup: UPDATE-mode windowed agg over
    // the multi-batch stream, foreachBatch restating exactly the changed
    // (day, type) parquet partitions via dynamic overwrite — the
    // materialized-view maintenance pattern (each intermediate table state
    // is a consistent partial rollup; the final state must equal the batch
    // aggregate, which is the oracle).
    QE("q224_stream_incremental_rollup", Some("""
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""),
      (s, d) => graft.streaming.EventStream.incrementalDayRollup(s, d)),

    // Time-series DENSIFICATION + zero-fill: the hourly per-type series
    // with every hour present — missing (hour, type) cells become explicit
    // zeros (the reporting/ML-feature prerequisite; a LEFT JOIN against a
    // generated axis, never a per-gap loop). The axis is generated from
    // the data's own min/max hour (one tiny aggregate, broadcast), crossed
    // with the distinct type set; counts attach by LEFT JOIN. At 100 TB
    // the axis side stays O(hours x types) — generation cost is nil.
    QE("q210_gap_fill", Some("""
      WITH b AS (SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
                        date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
                 FROM events),
      axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
      types AS (SELECT DISTINCT event_type FROM events),
      cnt AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, event_type,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2)
      SELECT a.hr, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM axis a CROSS JOIN types t
      LEFT JOIN cnt c ON c.hr = a.hr AND c.event_type = t.event_type
      ORDER BY a.hr, t.event_type"""),
      (s, d) => {
        val ev = t(s, d, "events")
        val bounds = ev.agg(
          date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val axis = bounds.select(
          explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hr"))
        val types = ev.select(col("event_type")).distinct()
        val cnt = ev.groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        axis.crossJoin(broadcast(types))
          .join(cnt, Seq("hr", "event_type"), "left_outer")
          .select(col("hr"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("hr", "event_type")
      }),

    // The same ±5-minute range join as q98, but written as the NAIVE theta
    // join in plain SQL and rewritten by the injected optimizer rule
    // (graft.plans.RangeJoinRewrite) into the binned equi-join — the
    // engine-grade answer to no-equi-key time joins: users state the
    // semantics, the optimizer supplies the 100 TB plan. Installing the
    // rule session-wide is safe by construction: it fires only on
    // non-streaming INNER joins that have a literal time band and NO equi
    // key (exactly the plans that would otherwise nest-loop), and the
    // original predicate stays as exact residual. Inner join ⇒ only
    // errors with ≥1 nearby click appear (q98's left join keeps zeroes).
    QE("q176_range_join_rule", Some("""
      SELECT e.event_id, CAST(COUNT(*) AS BIGINT) AS n_nearby
      FROM events e JOIN events c
        ON c.event_type = 'click' AND e.event_type = 'error'
       AND c.ts >= e.ts - INTERVAL 5 MINUTE
       AND c.ts <= e.ts + INTERVAL 5 MINUTE
      GROUP BY e.event_id ORDER BY e.event_id"""),
      (s, d) => {
        Tables.views(s, d)
        if (!s.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite)) {
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
        }
        s.sql("""
          SELECT e.event_id, COUNT(*) AS n_nearby
          FROM events e JOIN events c
            ON c.event_type = 'click' AND e.event_type = 'error'
           AND c.ts >= e.ts - INTERVAL '5' MINUTE
           AND c.ts <= e.ts + INTERVAL '5' MINUTE
          GROUP BY e.event_id ORDER BY e.event_id""")
      }),

    // The same as-of semantics as q96, executed by the NATIVE custom
    // operator (graft.plans.AsOfJoinExec — LogicalPlan + SparkStrategy +
    // SparkPlan): both sides co-partition on the key, and each partition
    // is ONE synchronized forward merge — O(|L|+|R|), O(1) state, no
    // window sort-run buffering. Same oracle as q96, so the custom
    // physical operator is value-verified against DuckDB, and the
    // AsOfJoinSuite pins plan shape + equality with the window form.
    QE("q177_asof_native", Some("""
      SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
             (SELECT CAST(max(p.ts) AS TIMESTAMP) FROM events p
               WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                 AND p.ts <= e.ts) AS last_purchase_ts
      FROM events e WHERE e.event_type = 'view'
      ORDER BY e.event_id"""),
      (s, d) => {
        val ev = t(s, d, "events")
        val views = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts")
        graft.plans.AsOf.join(s, views, purchases,
            key = "user_id", ts = "ts", as = "last_purchase_ts")
          .orderBy("event_id")
      }))
}
