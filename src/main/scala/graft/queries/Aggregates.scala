package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation surface: GROUP BY / HAVING / DISTINCT aggs / ROLLUP / CUBE /
  * GROUPING SETS / min_by-max_by / approx_count_distinct / PIVOT / UDAF
  * (reference sites AstBuilder.scala:844-914,1556-1700). All aggregation is
  * hash-based with map-side partial aggregation — Catalyst plans partial +
  * final automatically, which is exactly what survives a 1000-executor shuffle.
  */
object Aggregates {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** Exact weighted average as a typed UDAF: scaled-long sums (both inputs are
    * 2-decimal), so partial aggregation is associative and exact; the single
    * final division happens once on the driver-side merge result.
    */
  object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) = {
      val p = math.round(a._1 * 100) // price cents
      val q = math.round(a._2 * 100) // qty hundredths
      (b._1 + p * q, b._2 + q)
    }
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    // Both scaled sums stay < 2^53 (6e5 rows * 5e10 max term = 3e16 is the
    // 100x bound; per-group at bench sf it is ~7.5e15), so toDouble is exact
    // and each division rounds once — bit-identical to the oracle's
    // CAST(decimal-sum AS DOUBLE) / CAST(decimal-sum AS DOUBLE).
    def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else (r._1.toDouble / 1e4) / (r._2.toDouble / 1e2)
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val entries: Seq[QE] = Seq(
    // GROUP BY + HAVING (post-aggregate filter).
    QE("q20_group_having", Some(s"""
      SELECT l_suppkey, ${Q.oSum("l_quantity")} AS total_qty, COUNT(*) AS n
      FROM lineitem GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 14000
      ORDER BY l_suppkey"""),
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(Q.dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n"),
          sum(col("l_quantity").cast(Q.dec)).as("_hsum"))
        .filter(col("_hsum") > 14000)
        .drop("_hsum")
        .orderBy("l_suppkey")),

    // DISTINCT aggregates (count + sum over distinct values).
    QE("q21_distinct_agg", Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dq
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          sum_distinct(col("l_quantity").cast(Q.dec)).cast(DoubleType).as("sum_dq"))
        .orderBy("l_returnflag")),

    // ROLLUP with grouping() indicator.
    QE("q22_rollup", Some(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             ${Q.oSum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"),
          Q.dsum(col("l_quantity")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty")
        .orderBy(col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // CUBE over two dims.
    QE("q23_cube", Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // GROUPING SETS (SQL-text form; reference grammar G:560-563).
    QE("q24_grouping_sets", Some(s"""
      SELECT l_returnflag, l_linestatus, ${Q.oSum("l_extendedprice")} AS sum_price
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql(s"""SELECT l_returnflag, l_linestatus,
                    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
                  FROM lineitem
                  GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                  ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      }),

    // FIRST/LAST-style deterministic extremes: min_by / max_by (arg_min/arg_max).
    QE("q25_min_max_by", Some("""
      SELECT o_orderstatus,
             min_by(o_orderkey, o_totalprice) AS cheapest_key,
             max_by(o_orderkey, o_totalprice) AS priciest_key,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_key"),
          max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_key"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderstatus")),

    // HLL approximate distinct; small cardinalities stay in the exact sparse
    // regime so the DuckDB exact COUNT(DISTINCT) is a valid oracle here.
    QE("q26_approx_distinct", Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS approx_supp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supp"))
        .orderBy("l_returnflag")),

    // PIVOT (explicit value list so output columns are static).
    QE("q27_pivot", Some(s"""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS O
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(Q.dsum(col("l_quantity")))
        .orderBy("l_returnflag")),

    // Custom typed UDAF (Aggregator) — exact weighted average price by qty.
    QE("q28_udaf_weighted_avg", Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wavg_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => {
        val wavg = udaf(WeightedAvg)
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
          .orderBy("l_returnflag")
      }),

    // Exact distribution statistics: percentile() with linear interpolation
    // matches DuckDB's quantile_cont bit-for-bit (same interpolation on the
    // same doubles). Scale note: exact percentiles buffer each group's
    // values (TypedImperativeAggregate) — fine for bounded-cardinality
    // group x measure combinations like this; an unbounded-cardinality
    // 100 TB profile would switch to approx_percentile (t-digest, mergeable
    // partial state) and accept the approximation.
    QE("q29_percentiles", Some("""
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS p25,
             quantile_cont(l_extendedprice, 0.5) AS p50,
             quantile_cont(l_extendedprice, 0.75) AS p75,
             quantile_cont(l_quantity, 0.5) AS med_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) =>
        // one percentile(array) call per measure: the buffer of group
        // values is built ONCE and probed at all three cut points, instead
        // of three separate aggregates each buffering the full group
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            percentile(col("l_extendedprice"),
              array(lit(0.25), lit(0.5), lit(0.75))).as("ps"),
            percentile(col("l_quantity"), lit(0.5)).as("med_qty"))
          .select(col("l_returnflag"),
            element_at(col("ps"), 1).as("p25"),
            element_at(col("ps"), 2).as("p50"),
            element_at(col("ps"), 3).as("p75"),
            col("med_qty"))
          .orderBy("l_returnflag")),

    // Apache DataSketches HLL — the MERGEABLE cardinality primitive: each
    // partition builds a fixed-size (2^12 register) sketch, partial
    // sketches union associatively across the shuffle, and a global
    // distinct-users row derives from re-merging the PER-TYPE sketches
    // (hll_union_agg) without touching raw rows again — at 100 TB the
    // second aggregation reads KBs. approx_count_distinct (q26) is the
    // same idea locked inside one aggregate; the explicit sketch column
    // is what pipelines persist and re-merge across days. DuckDB has no
    // equivalent sketch, so the ESTIMATE itself can't hash-match — instead
    // the entry emits the EXACT distinct count (oracle-verified) alongside
    // an in-query bound check: |estimate − exact| ≤ 3% · exact (lgK=12 →
    // theoretical RSE ≈ 1.04/√4096 ≈ 1.6%, so 3% ≈ 2σ headroom; the
    // sketch is RNG-free and the pin is also unit-tested in
    // AggregatesSketchSuite). The oracle emits TRUE — a hash match proves
    // both the exact counts AND that every estimate sat inside its bound.
    QE("q162_hll_sketch", Some("""
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             TRUE AS within_3pct
      FROM events GROUP BY event_type
      UNION ALL
      SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
      ORDER BY event_type"""),
      (s, d) => {
        val perType = t(s, d, "events")
          .groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
            count_distinct(col("user_id")).as("exact_users"))
        val global = perType
          .agg(hll_union_agg(col("sk")).as("sk"))
          .select(lit("ALL").as("event_type"),
            hll_sketch_estimate(col("sk")).as("est"))
          .crossJoin(t(s, d, "events")
            .agg(count_distinct(col("user_id")).as("exact_users")))
        val bound = (est: Column, exact: Column) =>
          (abs(est.cast(DoubleType) - exact.cast(DoubleType))
            <= lit(0.03) * exact.cast(DoubleType)).as("within_3pct")
        perType
          .select(col("event_type"), col("exact_users"),
            bound(hll_sketch_estimate(col("sk")), col("exact_users")))
          .unionAll(global.select(col("event_type"), col("exact_users"),
            bound(col("est"), col("exact_users"))))
          .orderBy("event_type")
      }),

    // Bitwise aggregate family (BIT_AND/BIT_OR/BIT_XOR + popcount sum):
    // fully associative/commutative, so partial aggregation map-side
    // combines like SUM — the flag-mask rollup shape (permission masks,
    // feature bitsets) at any scale. Exact integers, engine-independent.
    QE("q184_bitwise_agg", Some("""
      SELECT o_orderpriority,
             BIT_AND(o_orderkey) AS mask_and,
             BIT_OR(o_orderkey) AS mask_or,
             BIT_XOR(o_orderkey) AS mask_xor,
             CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS popcnt
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            bit_and(col("o_orderkey")).as("mask_and"),
            bit_or(col("o_orderkey")).as("mask_or"),
            bit_xor(col("o_orderkey")).as("mask_xor"),
            sum(bit_count(col("o_orderkey")).cast("long")).as("popcnt"))
          .orderBy("o_orderpriority")),

    // Boolean aggregate family — count_if / bool_and / bool_or / every
    // (the SQL-standard EVERY alias): predicate census per event type.
    // All four are map-side-combinable single-pass aggregates (AND/OR are
    // associative), so the shuffle carries one boolean/long per group per
    // predicate — the cheapest possible aggregate shape at any scale.
    QE("q195_boolean_aggs", Some("""
      SELECT event_type,
             CAST(count_if(value > 90) AS BIGINT) AS n_high,
             bool_and(value >= 0) AS all_nonneg,
             bool_or(value > 99) AS any_over99,
             bool_and(value < 1000) AS all_below_1k
      FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT event_type,
                 count_if(value > 90) AS n_high,
                 bool_and(value >= 0) AS all_nonneg,
                 bool_or(value > 99) AS any_over99,
                 every(value < 1000) AS all_below_1k
          FROM events GROUP BY event_type ORDER BY event_type""")
      }),

    // Linear-regression statistics (slope / intercept / correlation of
    // value vs hour-of-day) from EXACT SUFFICIENT STATISTICS — the q119
    // stddev discipline extended to the regr_*/corr family: never
    // oracle-check the built-in moment aggregates (their merge order is
    // partition-dependent in the last ulp); accumulate Σx, Σx², Σy, Σy²,
    // Σxy as integers/exact decimals in ONE pass, then evaluate the
    // closed forms in double with the IDENTICAL op order in both engines
    // — bit-exact, no rounding. Map-side-combinable, one shuffle.
    QE("q209_regr_stats", Some("""
      WITH s AS (SELECT event_type,
                   COUNT(*) AS n,
                   SUM(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP))) AS sx,
                   SUM(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) *
                       EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP))) AS sxx,
                   SUM(CAST(value AS DECIMAL(12,2))) AS sy,
                   SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS syy,
                   SUM(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) *
                       CAST(value AS DECIMAL(12,2))) AS sxy
                 FROM events GROUP BY event_type)
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                  CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS slope,
             CAST((CAST(sy AS DOUBLE) -
                   CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                        CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE) AS DOUBLE) AS intercept,
             CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                       CAST(n * syy - sy * sy AS DOUBLE)) AS DOUBLE) AS corr
      FROM s ORDER BY event_type"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          WITH s AS (SELECT event_type,
                       COUNT(*) AS n,
                       SUM(HOUR(ts)) AS sx,
                       SUM(HOUR(ts) * HOUR(ts)) AS sxx,
                       SUM(CAST(value AS DECIMAL(12,2))) AS sy,
                       SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS syy,
                       SUM(HOUR(ts) * CAST(value AS DECIMAL(12,2))) AS sxy
                     FROM events GROUP BY event_type)
          SELECT event_type, n,
                 CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                      CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS slope,
                 CAST((CAST(sy AS DOUBLE) -
                       CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                            CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) AS DOUBLE) AS intercept,
                 CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                           CAST(n * syy - sy * sy AS DOUBLE)) AS DOUBLE) AS corr
          FROM s ORDER BY event_type""")
      }),

    // Equi-width histogram via width_bucket: order totals binned into 10
    // fixed buckets. Bucketing runs on EXACT integer cents (a 2-decimal
    // double ×100 rounds to the exact long), so the bucket edge arithmetic
    // — (v-min)/((max-min)/n), integer inputs, one IEEE division — is
    // bit-identical in both engines (DuckDB 1.0 has no width_bucket, so the
    // oracle spells out the same formula). One scan + tiny hash agg: the
    // standard first look at any new 100 TB column.
    QE("q212_width_bucket", Some("""
      WITH b AS (SELECT CASE WHEN c < 0 THEN 0
                             WHEN c >= 60000000 THEN 11
                             ELSE CAST(FLOOR(c / 6000000.0) AS BIGINT) + 1 END AS bucket,
                        o_totalprice
                 FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                              o_totalprice FROM orders))
      SELECT bucket, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM b GROUP BY bucket ORDER BY bucket"""),
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_totalprice"),
            width_bucket(round(col("o_totalprice") * 100).cast(LongType),
              lit(0L), lit(60000000L), lit(10L)).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("total"))
          .orderBy("bucket")),

    // HAVING with a scalar subquery: groups kept only when above the
    // global average group size — the post-aggregation correlated gate
    // (Spark plans the subquery once, broadcast into the having filter,
    // never a per-group re-plan).
    QE("q241_having_subquery", Some("""
      SELECT o_custkey, COUNT(*) AS n FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) > (SELECT AVG(cnt) FROM
        (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey))
      ORDER BY o_custkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT o_custkey, COUNT(*) AS n FROM orders
          GROUP BY o_custkey
          HAVING COUNT(*) > (SELECT AVG(cnt) FROM
            (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey))
          ORDER BY o_custkey""")
      }),

    // Dataset.observe + Observation: named metrics collected DURING the
    // main action (a CollectMetrics node in the plan), not by a second
    // scan — the pipeline-monitoring primitive (row counts / checksums /
    // extrema every production job should emit for free). The observed
    // metrics ARE the entry's result; the oracle recomputes them with a
    // plain aggregate. Metrics chosen order-insensitive (count, integer
    // sum, max) so the merge across 32 partitions is exact.
    QE("q242_observe_metrics", Some("""
      SELECT COUNT(*) AS n, CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
             CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
      FROM lineitem"""),
      (s, d) => {
        import s.implicits._
        val obs = new org.apache.spark.sql.Observation()
        val li = t(s, d, "lineitem").observe(obs,
          count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_key"),
          max(col("l_extendedprice")).as("max_price"))
        li.count() // the one action; metrics ride along with it
        val m = obs.get
        Seq((m("n").asInstanceOf[Long], m("sum_key").asInstanceOf[Long],
          m("max_price").asInstanceOf[Double])).toDF("n", "sum_key", "max_price")
      }),

    // DataFrameNaFunctions: fill / drop / replace — the null-repair API
    // family (distinct from expression-level COALESCE, which q06 covers).
    // Nulls are derived deterministically (readings <= 50 blanked), then
    // one output row contrasts all three repairs. Oracle: the equivalent
    // relational spellings.
    QE("q240_na_functions", Some("""
      WITH e AS (SELECT event_id, event_type,
                        CASE WHEN value > 50 THEN value END AS hi
                 FROM events)
      SELECT COUNT(*) AS n_all,
             CAST(SUM(CAST(COALESCE(hi, 0.0) AS DECIMAL(12,2))) AS DOUBLE) AS filled_total,
             (SELECT COUNT(*) FROM e WHERE hi IS NOT NULL) AS n_after_drop,
             (SELECT COUNT(*) FROM e
               WHERE (CASE WHEN event_type = 'click' THEN 'tap' ELSE event_type END) = 'tap')
               AS n_tap
      FROM e"""),
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            when(col("value") > 50, col("value")).as("hi"))
        val filled = e.na.fill(0.0, Seq("hi"))
        val dropped = e.na.drop(Seq("hi"))
        val replaced = e.na.replace("event_type", Map("click" -> "tap"))
        filled.agg(count(lit(1)).as("n_all"), Q.dsum(col("hi")).as("filled_total"))
          .crossJoin(broadcast(dropped.agg(count(lit(1)).as("n_after_drop"))))
          .crossJoin(broadcast(replaced.filter(col("event_type") === "tap")
            .agg(count(lit(1)).as("n_tap"))))
      }),

    // DataFrameStatFunctions crosstab: the contingency-table API
    // (pairwise frequency of two low-cardinality columns in one pass).
    // Columns come back named by the right-side value; sorted by the
    // left value for determinism. Oracle: conditional aggregation.
    QE("q239_crosstab", Some("""
      SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
      FROM orders GROUP BY 1 ORDER BY 1"""),
      (s, d) =>
        t(s, d, "orders").stat
          .crosstab("o_orderpriority", "o_orderstatus")
          .select(col("o_orderpriority_o_orderstatus"),
            col("F"), col("O"), col("P"))
          .orderBy("o_orderpriority_o_orderstatus")),

    // Grouped TOP-K as a custom TypedImperativeAggregate
    // (graft.functions.TopKByValue — the third custom-function tier next
    // to the codegen'd scalar Expression and the typed Aggregator UDAF):
    // the aggregation buffer is a capped k-element min-heap, so top-3 per
    // user is ONE hash aggregate — O(n log k), map-side partial heaps,
    // only k rows per group ever leave the map side. The rank-window
    // alternative (q181's oracle, reused here) must shuffle and sort every
    // row of every group even with WindowGroupLimit. Ties break by
    // event_id, a total order, so results are hash-exact. Measured
    // same-JVM best-of-3 at sf0.1: aggregate 0.30s vs window 0.37s —
    // modest at test scale, but the k-rows-per-group map-side shuffle
    // bound is the property that scales.
    QE("q238_topk_aggregate", Some("""
      WITH r AS (SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rnk
                 FROM events)
      SELECT user_id, CAST(rnk AS INT) AS rnk, event_id,
             CAST(value AS DOUBLE) AS value
      FROM r WHERE rnk <= 3 ORDER BY user_id, rnk"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .agg(graft.functions.TopKAgg.topK(s, col("value"), col("event_id"), 3)
            .as("top"))
          .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("user_id"), (col("pos") + 1).cast(IntegerType).as("rnk"),
            col("e.id").as("event_id"), col("e.value").as("value"))
          .orderBy("user_id", "rnk")),

    // Aggregate FILTER clause (SQL-standard conditional aggregation
    // syntax; the CASE-WHEN rewrite is what q214 exercises) — mixed
    // filtered and unfiltered aggregates in one group-by, still one scan.
    QE("q231_filter_clause", Some("""
      SELECT o_orderpriority,
             COUNT(*) AS n_all,
             COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT o_orderpriority,
                 COUNT(*) AS n_all,
                 COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                      FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f
          FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }),

    // Count-min sketch: the mergeable frequency sketch next to HLL (q162)
    // — built distributed (one partial sketch per partition, merged
    // map-side), probed on the driver for the small event-type vocabulary
    // (a bounded collect, like the trained ANN codebooks). Fixed seed +
    // width 2/eps >> |vocabulary| means no hash collisions among the 5
    // types, so the estimates equal the true counts and the plain
    // group-by is an exact oracle.
    QE("q228_count_min_sketch", Some("""
      SELECT event_type, COUNT(*) AS est
      FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, d) => {
        val bin = t(s, d, "events")
          .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bin))
        val types = t(s, d, "events").select("event_type").distinct()
          .collect().map(_.getString(0)).sorted
        import s.implicits._
        types.toSeq.map(tp => (tp, cms.estimateCount(tp)))
          .toDF("event_type", "est").orderBy("event_type")
      }),

    // PIVOT with MULTIPLE aggregates per pivot value (q27 is the single-agg
    // form): count and exact value total per (user, pivoted event type),
    // null cells coalesced so both engines agree on absent combinations.
    // The pivot list is explicit, so the plan is one scan + one hash agg —
    // no distinct-values pre-query.
    QE("q215_pivot_multi_agg", Some("""
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click_n,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS click_v,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_n,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS purchase_v
      FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "purchase"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(Q.dec)).cast(DoubleType).as("v"))
          .select(col("user_id"),
            coalesce(col("click_n"), lit(0L)).as("click_n"),
            coalesce(col("click_v"), lit(0.0)).as("click_v"),
            coalesce(col("purchase_n"), lit(0L)).as("purchase_n"),
            coalesce(col("purchase_v"), lit(0.0)).as("purchase_v"))
          .orderBy("user_id")))
}
