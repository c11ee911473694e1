package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface: ranking, analytic, ROWS/RANGE frames, named
  * windows (reference sites AstBuilder.scala:810-840,1715-1771). Every window
  * is partitioned (never a global un-partitioned window over the fact table)
  * so the sort stays per-partition-key and scales.
  */
object Windows {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // Ranking functions per user (deterministic order key ts,event_id).
    QE("q30_window_rank", Some("""
      SELECT event_id, user_id,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      ORDER BY user_id, rn"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events").select(
          col("event_id"), col("user_id"),
          rank().over(w).cast(LongType).as("rnk"),
          dense_rank().over(w).cast(LongType).as("drnk"),
          row_number().over(w).cast(LongType).as("rn"))
          .orderBy("user_id", "rn")
      }),

    // lead/lag analytic functions with default values.
    QE("q31_window_lead_lag", Some("""
      SELECT event_id, user_id, value,
             lag(value, 1, -1.0)  OVER w AS prev_v,
             lead(value, 1, -1.0) OVER w AS next_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY user_id, event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, d, "events").select(
          col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1, -1.0).over(w).as("prev_v"),
          lead(col("value"), 1, -1.0).over(w).as("next_v"))
          .orderBy("user_id", "event_id")
      }),

    // nth_value over the full frame: the positional analytic next to
    // first/last (q35) — the 2nd and 3rd event types of each user's
    // event_id-ordered history attached to every row. Same per-key sort as
    // every other window here, so one hash partition + one sort at any scale.
    QE("q211_nth_value_window", Some("""
      SELECT event_id, user_id,
             nth_value(event_type, 2) OVER w AS second_et,
             nth_value(event_type, 3) OVER w AS third_et
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id, event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events").select(
          col("event_id"), col("user_id"),
          nth_value(col("event_type"), 2).over(w).as("second_et"),
          nth_value(col("event_type"), 3).over(w).as("third_et"))
          .orderBy("user_id", "event_id")
      }),

    // ROWS BETWEEN frame: 3-event moving sum (decimal-exact inside the frame).
    QE("q32_window_rows_frame", Some("""
      SELECT event_id, user_id,
             CAST(SUM(CAST(value AS DECIMAL(12,2)))
                  OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum
      FROM events ORDER BY user_id, event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
        t(s, d, "events").select(
          col("event_id"), col("user_id"),
          sum(col("value").cast(Q.dec)).over(w).cast(DoubleType).as("mov_sum"))
          .orderBy("user_id", "event_id")
      }),

    // RANGE BETWEEN frame keyed on a numeric order column.
    QE("q33_window_range_frame", Some("""
      SELECT o_orderkey, o_custkey,
             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_near
      FROM orders ORDER BY o_custkey, o_orderkey"""),
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-1000, 0)
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_near"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    // ntile / percent_rank / cume_dist distribution functions.
    QE("q34_window_distribution", Some("""
      SELECT c_custkey,
             ntile(4)       OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist()    OVER w AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey"""),
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        t(s, d, "customer").select(
          col("c_custkey"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
          .orderBy("c_custkey")
      }),

    // first_value / last_value with explicit full frame.
    QE("q35_window_first_last", Some("""
      SELECT event_id, user_id,
             first_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_et,
             last_value(event_type)  OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_et
      FROM events ORDER BY user_id, event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events").select(
          col("event_id"), col("user_id"),
          first(col("event_type")).over(w).as("first_et"),
          last(col("event_type")).over(w).as("last_et"))
          .orderBy("user_id", "event_id")
      }),

    // TIME-INTERVAL RANGE frame: trailing 1-hour window per row in each
    // user's event-time order — the time-series sliding aggregate (rate
    // limiting, rolling counts) that ROWS frames cannot express when
    // events are irregularly spaced. RANGE peers are defined by the
    // interval bound, so ties and gaps behave identically in both engines.
    QE("q227_time_range_frame", Some("""
      SELECT event_id, user_id,
             COUNT(*) OVER w AS n_1h,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT event_id, user_id,
                 COUNT(*) OVER w AS n_1h,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          ORDER BY user_id, event_id""")
      }),

    // Named WINDOW clause through SQL text (reference AB:810-840).
    QE("q36_window_named", Some("""
      SELECT user_id, event_id,
             row_number() OVER w AS rn,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS run_sum
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY user_id, event_id"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT user_id, event_id,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS run_sum
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
                 ORDER BY user_id, event_id""")
      }))
}
