package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS-style query shapes the reference's own benchmark harness stresses
  * beyond plain TPC-H (examples/tpcds/.../TPCDSQueryBenchmark.scala:216-322
  * runs all 103 variants): INTERSECT of fact scans (q14), multi-CTE double
  * aggregation gated by a scalar subquery (q23), windowed market share
  * (q67-family), and a GROUPING SETS report over a dimension join (q5/q77).
  * Adapted to the driver's TPC-H-ish schema.
  */
object DsShapes {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // DS q14 shape: INTERSECT of two fact scans — customers active in BOTH
    // 1996 and 1997 — then a dimension join + aggregate. Each branch is a
    // pushed-filter scan + map-side-partial DISTINCT; Catalyst plans the
    // INTERSECT as a left-semi hash join on the already-deduplicated sides,
    // so the only full shuffles carry distinct custkeys, never raw facts.
    QE("q106_ds_intersect", Some("""
      WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      y97 AS (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      both_years AS (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
      SELECT c_mktsegment, COUNT(*) AS n_cust
      FROM customer JOIN both_years ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) => {
        def active(y0: String, y1: String) = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(y0).cast(TimestampType) &&
            col("o_orderdate") < lit(y1).cast(TimestampType))
          .select("o_custkey").distinct()
        val both = active("1996-01-01", "1997-01-01")
          .intersect(active("1997-01-01", "1998-01-01"))
        t(s, d, "customer").join(both, col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
          .orderBy("c_mktsegment")
      }),

    // DS q23 shape: two independent CTE aggregates (frequently-sold parts;
    // best customers above a scalar-subquery threshold) gating a final
    // fact-fact aggregate. Both gates reduce to semi-joins on aggregated
    // keys — at scale AQE broadcasts whichever qualifies, and neither gate
    // ever shuffles raw lineitem twice: each CTE is one partial-agg'd scan.
    // Threshold compares in DOUBLE on both sides (decimal precision
    // promotion of `MAX(s) * 0.5` differs between engines; the cast makes
    // the comparison bit-identical).
    QE("q107_ds_double_agg", Some("""
      WITH freq_parts AS (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) > 4),
      spend AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
        FROM orders GROUP BY o_custkey),
      big_spenders AS (
        SELECT o_custkey FROM spend
        WHERE CAST(s AS DOUBLE) > (SELECT CAST(MAX(s) AS DOUBLE) FROM spend) * 0.5)
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
             COUNT(*) AS n_rows
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_partkey IN (SELECT l_partkey FROM freq_parts)
        AND o_custkey IN (SELECT o_custkey FROM big_spenders)"""),
      (s, d) => {
        val freqParts = t(s, d, "lineitem")
          .groupBy("l_partkey").agg(countDistinct(col("l_orderkey")).as("_n"))
          .filter(col("_n") > 4).select("l_partkey")
        val spend = t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast(Q.dec)).as("s"))
        val maxSpend = spend.agg(max(col("s")).cast(DoubleType).as("_mx"))
        val bigSpenders = spend.crossJoin(broadcast(maxSpend))
          .filter(col("s").cast(DoubleType) > col("_mx") * 0.5)
          .select("o_custkey")
        t(s, d, "lineitem")
          .join(freqParts, Seq("l_partkey"), "left_semi")
          .join(t(s, d, "orders")
            .join(bigSpenders, Seq("o_custkey"), "left_semi"),
            col("l_orderkey") === col("o_orderkey"))
          .agg(Q.dsum(col("l_quantity")).as("total_qty"),
            count(lit(1)).as("n_rows"))
      }),

    // DS q67-family shape: market share via a window over an aggregate —
    // each nation's slice of its order-year's revenue. The window
    // partitions by year over the ALREADY-aggregated (nation, year) rows
    // (~25 x years), so the window shuffle is trivial no matter the fact
    // size; dims broadcast, one fact-fact shuffle. Share divides in DOUBLE
    // after exact decimal sums — identical op order in both engines.
    QE("q108_ds_market_share", Some(s"""
      WITH rev AS (
        SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, yr)
      SELECT n_name, yr, CAST(revenue AS DOUBLE) AS revenue,
             CAST(revenue AS DOUBLE) / CAST(SUM(revenue) OVER (PARTITION BY yr) AS DOUBLE) AS share
      FROM rev ORDER BY yr, n_name"""),
      (s, d) => {
        val rev = t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
          .agg(sum(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("_rev"))
        rev.select(col("n_name"), col("yr"),
            col("_rev").cast(DoubleType).as("revenue"),
            (col("_rev").cast(DoubleType) /
              sum(col("_rev")).over(Window.partitionBy("yr")).cast(DoubleType)).as("share"))
          .orderBy("yr", "n_name")
      }),

    // DS q5/q77 shape: a channel-report GROUPING SETS over a dimension join
    // — revenue at (region, nation), regional subtotal, and grand total in
    // one pass, with GROUPING() disambiguating the NULL rollup rows.
    // region/nation broadcast into the fact aggregate; the grouping-sets
    // expansion happens on partial aggregates, not raw rows.
    QE("q109_ds_groupingsets_report", Some(s"""
      SELECT r_name, n_name,
             ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue,
             CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
      ORDER BY lvl, r_name NULLS LAST, n_name NULLS LAST"""),
      (s, d) => {
        Tables.views(s, d)
        // pre-aggregate to (r_name, n_name) BEFORE the grouping sets: the
        // direct form runs Expand over every fact row (3x the joined fact
        // mass feeds the aggregate); re-aggregating the ~|regions x
        // nations| exact decimal partials under the grouping sets is
        // value-identical (decimal addition is associative-exact; the
        // single cast to DOUBLE happens at the same final point) and
        // Expand now multiplies ~125 rows instead of the fact table. At
        // 100 TB the Expand-input difference is the whole fact mass x2.
        s.sql(s"""
          WITH pre AS (
            SELECT r_name, n_name,
                   SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS srev
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name)
          SELECT r_name, n_name, CAST(SUM(srev) AS DOUBLE) AS revenue,
                 CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl
          FROM pre
          GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
          ORDER BY lvl, r_name NULLS LAST, n_name NULLS LAST""")
      }),

    // DS q74/q11 shape: year-over-year growth per customer. The canonical
    // DS form self-joins a per-(customer, year) CTE; that plans as TWO fact
    // scans + shuffles, so this linearizes to conditional aggregation —
    // ONE orders scan, ONE shuffle on custkey, growth computed per group.
    // Ratio divides in DOUBLE from exact decimal sums; ties broken by key.
    QE("q110_ds_yoy_growth", Some("""
      WITH per AS (
        SELECT o_custkey,
               SUM(CASE WHEN CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1996
                   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS s96,
               SUM(CASE WHEN CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1997
                   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS s97
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey AS custkey, CAST(s97 AS DOUBLE) / CAST(s96 AS DOUBLE) AS growth
      FROM per WHERE s96 IS NOT NULL AND s97 IS NOT NULL
      ORDER BY growth DESC, custkey LIMIT 100"""),
      (s, d) => {
        val yr = year(col("o_orderdate"))
        t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            sum(when(yr === 1996, col("o_totalprice").cast(Q.dec))).as("s96"),
            sum(when(yr === 1997, col("o_totalprice").cast(Q.dec))).as("s97"))
          .filter(col("s96").isNotNull && col("s97").isNotNull)
          .select(col("o_custkey").as("custkey"),
            (col("s97").cast(DoubleType) / col("s96").cast(DoubleType)).as("growth"))
          .orderBy(col("growth").desc, col("custkey"))
          .limit(100)
      }),

    // DS q51 shape: two per-month channel series (returned vs accepted
    // lines), each with a running cumulative window, FULL OUTER JOINed on
    // month, keeping months where the returns curve overtakes. The windows
    // run over ALREADY-aggregated rows (one per month), so window + full
    // join cost is O(months) regardless of fact size; each branch is one
    // pushed-filter scan with partial aggregation.
    QE("q111_ds_cumulative_channels", Some("""
      WITH r AS (
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 12 + EXTRACT(MONTH FROM l_shipdate) AS INT) AS mon,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      a AS (
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 12 + EXTRACT(MONTH FROM l_shipdate) AS INT) AS mon,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
      rc AS (SELECT mon, CAST(SUM(rev) OVER (ORDER BY mon) AS DOUBLE) AS ret_cum FROM r),
      ac AS (SELECT mon, CAST(SUM(rev) OVER (ORDER BY mon) AS DOUBLE) AS ack_cum FROM a)
      SELECT COALESCE(rc.mon, ac.mon) AS mon, ret_cum, ack_cum
      FROM rc FULL OUTER JOIN ac ON rc.mon = ac.mon
      WHERE ret_cum > ack_cum ORDER BY mon"""),
      (s, d) => {
        def series(flag: String, out: String) = {
          val mon = (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast(IntegerType).as("mon")
          val agg = t(s, d, "lineitem").filter(col("l_returnflag") === flag)
            .groupBy(mon).agg(sum(col("l_extendedprice").cast(Q.dec)).as("rev"))
          agg.select(col("mon"),
            sum(col("rev")).over(Window.orderBy("mon")).cast(DoubleType).as(out))
        }
        val rc = series("R", "ret_cum")
        val ac = series("A", "ack_cum").withColumnRenamed("mon", "amon")
        rc.join(ac, col("mon") === col("amon"), "full_outer")
          .select(coalesce(col("mon"), col("amon")).as("mon"),
            col("ret_cum"), col("ack_cum"))
          .filter(col("ret_cum") > col("ack_cum"))
          .orderBy("mon")
      }),

    // DS q88 shape: many conditional aggregates in ONE fact scan — the DS
    // original cross-joins 8 scalar subqueries (8 scans); conditional
    // aggregation collapses them into a single pass with map-side partials
    // feeding a 1-row final aggregate. No shuffle carries raw rows.
    QE("q112_ds_multi_conditional", Some("""
      SELECT COUNT(*) FILTER (WHERE l_quantity < 10) AS n_small,
             COUNT(*) FILTER (WHERE l_quantity >= 10 AND l_quantity < 25) AS n_mid,
             COUNT(*) FILTER (WHERE l_quantity >= 25 AND l_quantity < 40) AS n_large,
             COUNT(*) FILTER (WHERE l_quantity >= 40) AS n_bulk,
             COUNT(DISTINCT l_suppkey) FILTER (WHERE l_discount > 0.05) AS n_disc_supp,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS returned_rev
      FROM lineitem WHERE l_linestatus = 'F'"""),
      (s, d) => {
        val q = col("l_quantity")
        t(s, d, "lineitem").filter(col("l_linestatus") === "F")
          .agg(
            count(when(q < 10, 1)).as("n_small"),
            count(when(q >= 10 && q < 25, 1)).as("n_mid"),
            count(when(q >= 25 && q < 40, 1)).as("n_large"),
            count(when(q >= 40, 1)).as("n_bulk"),
            countDistinct(when(col("l_discount") > 0.05, col("l_suppkey"))).as("n_disc_supp"),
            sum(when(col("l_returnflag") === "R",
              col("l_extendedprice").cast(Q.dec))).cast(DoubleType).as("returned_rev"))
      }),

    // DS q16/q93 shape: fact-fact ANTI join — orders having NO returned
    // line, aggregated by customer segment. The anti side is a pushed-filter
    // lineitem scan projected to the join key only; at scale both sides
    // shuffle on orderkey once (or the returned-key side broadcasts when it
    // qualifies under AQE) and no fact column survives past the join.
    QE("q113_ds_no_returns", Some("""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS clean_rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) => {
        val returned = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R").select("l_orderkey")
        t(s, d, "orders")
          .join(returned, col("o_orderkey") === col("l_orderkey"), "left_anti")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            Q.dsum(col("o_totalprice")).as("clean_rev"))
          .orderBy("c_mktsegment")
      }),

    // DS q1/q30 shape: customers whose spend exceeds 1.3x their nation's
    // average — the correlated above-group-average pattern. The per-nation
    // average re-aggregates the per-customer rollup (no second fact scan)
    // and at 25 rows broadcasts back into it; avg computed as decimal-sum /
    // count in DOUBLE so both engines divide identical operands.
    QE("q114_ds_above_nation_avg", Some("""
      WITH spend AS (
        SELECT c_custkey, c_nationkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_nationkey),
      navg AS (
        SELECT c_nationkey, CAST(SUM(s) AS DOUBLE) / COUNT(*) AS nation_avg
        FROM spend GROUP BY c_nationkey)
      SELECT c_custkey AS custkey, CAST(s AS DOUBLE) AS spend, nation_avg
      FROM spend JOIN navg USING (c_nationkey)
      WHERE CAST(s AS DOUBLE) > 1.3 * nation_avg
      ORDER BY custkey"""),
      (s, d) => {
        val spend = t(s, d, "customer")
          .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_nationkey")
          .agg(sum(col("o_totalprice").cast(Q.dec)).as("s"))
        val navg = spend.groupBy("c_nationkey")
          .agg((sum(col("s")).cast(DoubleType) / count(lit(1))).as("nation_avg"))
        spend.join(broadcast(navg), Seq("c_nationkey"))
          .filter(col("s").cast(DoubleType) > lit(1.3) * col("nation_avg"))
          .select(col("c_custkey").as("custkey"),
            col("s").cast(DoubleType).as("spend"), col("nation_avg"))
          .orderBy("custkey")
      }),

    // DS q5/q77 shape: channel report — UNION ALL of per-channel slices
    // (urgent vs routine priority) rolled up with ROLLUP(channel, segment).
    // Each branch is a pushed-filter scan; the rollup expands on partial
    // aggregates, and the grand-total row falls out of the same pass.
    QE("q115_ds_channel_rollup", Some("""
      WITH chan AS (
        SELECT 'urgent' AS channel, c_mktsegment AS seg,
               CAST(o_totalprice AS DECIMAL(12,2)) AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'routine' AS channel, c_mktsegment AS seg,
               CAST(o_totalprice AS DECIMAL(12,2)) AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority <> '1-URGENT')
      SELECT channel, seg, CAST(SUM(v) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
      FROM chan GROUP BY ROLLUP(channel, seg)
      ORDER BY channel NULLS LAST, seg NULLS LAST"""),
      (s, d) => {
        // the UNION branches share source lineage, which trips Spark's
        // ambiguous-self-join guard under the DataFrame rollup; the SQL
        // form resolves cleanly through the parser (same plan)
        Tables.views(s, d)
        s.sql("""
          WITH chan AS (
            SELECT 'urgent' AS channel, c_mktsegment AS seg,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS v
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'routine' AS channel, c_mktsegment AS seg,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS v
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderpriority <> '1-URGENT')
          SELECT channel, seg, CAST(SUM(v) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
          FROM chan GROUP BY ROLLUP(channel, seg)
          ORDER BY channel NULLS LAST, seg NULLS LAST""")
      }),

    // DS q35/q10 shape: DISJUNCTIVE correlated EXISTS — customers reachable
    // through EITHER channel. Spark 4 decorrelates OR'd EXISTS into
    // ExistenceJoins (older engines reject subqueries in disjunctions —
    // the reference's forked-parser era predates this); each branch is a
    // pushed-filter semi probe on the same key, no fact row duplication.
    QE("q116_ds_exists_or", Some("""
      SELECT c_mktsegment, COUNT(*) AS n_cust
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         OR EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT c_mktsegment, COUNT(*) AS n_cust
          FROM customer
          WHERE EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             OR EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      }),

    // DS q31 shape: quarter-over-quarter growth via LAG over an aggregated
    // series. The lag window partitions by nation over (nation, year,
    // quarter) rows — O(nations x quarters) regardless of fact size; one
    // fact shuffle builds the series, dims broadcast.
    QE("q117_ds_quarter_growth", Some("""
      WITH nq AS (
        SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, yr, qtr),
      g AS (
        SELECT n_name, yr, qtr,
               CAST(rev AS DOUBLE) /
                 CAST(lag(rev) OVER (PARTITION BY n_name ORDER BY yr, qtr) AS DOUBLE) AS growth
        FROM nq)
      SELECT n_name, yr, qtr, growth FROM g
      WHERE growth > 1.2 ORDER BY n_name, yr, qtr"""),
      (s, d) => {
        val nq = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
          .agg(sum(col("o_totalprice").cast(Q.dec)).as("rev"))
        val w = Window.partitionBy("n_name").orderBy("yr", "qtr")
        nq.select(col("n_name"), col("yr"), col("qtr"),
            (col("rev").cast(DoubleType) /
              lag(col("rev"), 1).over(w).cast(DoubleType)).as("growth"))
          .filter(col("growth") > 1.2)
          .orderBy("n_name", "yr", "qtr")
      }),

    // DS q49 shape: rank parts by return ratio. The rank's window input is
    // the aggregated per-part table (|parts| rows, never facts); ratio
    // divides exact decimal sums in DOUBLE, and the rank order is made
    // total with the key tie-break so top-20 is deterministic.
    QE("q118_ds_return_ratio_rank", Some("""
      WITH pr AS (
        SELECT l_partkey,
               SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2))
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_qty,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS tot_qty
        FROM lineitem GROUP BY l_partkey),
      r AS (SELECT l_partkey, CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) AS ratio
            FROM pr)
      SELECT l_partkey, ratio, rnk FROM (
        SELECT l_partkey, ratio,
               rank() OVER (ORDER BY ratio DESC, l_partkey) AS rnk FROM r) t
      WHERE rnk <= 20 ORDER BY rnk"""),
      (s, d) => {
        val pr = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(
            sum(when(col("l_returnflag") === "R", col("l_quantity").cast(Q.dec))
              .otherwise(lit(0).cast(Q.dec))).as("ret_qty"),
            sum(col("l_quantity").cast(Q.dec)).as("tot_qty"))
        val ratio = col("ret_qty").cast(DoubleType) / col("tot_qty").cast(DoubleType)
        pr.select(col("l_partkey"), ratio.as("ratio"))
          .withColumn("rnk", rank()
            .over(Window.orderBy(col("ratio").desc, col("l_partkey")))
            .cast(LongType))
          .filter(col("rnk") <= 20)
          .orderBy("rnk")
      }),

    // DS q39 shape: per-(supplier, month) demand variability — mean, stddev,
    // coefficient of variation, keeping volatile combinations (cov > 0.5).
    // stddev comes from exact SUFFICIENT STATISTICS (decimal sum(x),
    // sum(x^2), count) with the final formula evaluated in DOUBLE with
    // identical op order on both sides — bit-exact with no rounding, where
    // stddev_samp's central-moment merges perturb the last ulp with
    // partition order (measured: a var_samp ulp gap between engines on
    // identical data). The sufficient-statistics form is ALSO the 100 TB
    // pattern: two mergeable partial sums per group instead of an
    // order-sensitive moment merge.
    QE("q119_ds_supplier_variability", Some("""
      WITH sm AS (
        SELECT l_suppkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mon,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s,
               SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS s2,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_suppkey, mon HAVING COUNT(*) >= 5),
      v AS (
        SELECT l_suppkey, mon,
               sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                    / (n - 1)) AS sd,
               CAST(s AS DOUBLE) / n AS mean_q
        FROM sm)
      SELECT l_suppkey, mon, sd, sd / mean_q AS cov
      FROM v WHERE sd / mean_q > 0.5 ORDER BY l_suppkey, mon"""),
      (s, d) => {
        val q = col("l_quantity")
        val sm = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"), month(col("l_shipdate")).as("mon"))
          .agg(
            sum(q.cast(Q.dec)).as("s"),
            sum((q * q).cast(DecimalType(18, 4))).as("s2"),
            count(lit(1)).as("n"))
          .filter(col("n") >= 5)
        val sd = sqrt((col("s2").cast(DoubleType) -
          col("s").cast(DoubleType) * col("s").cast(DoubleType) / col("n")) /
          (col("n") - 1))
        val meanQ = col("s").cast(DoubleType) / col("n")
        sm.select(col("l_suppkey"), col("mon"), sd.as("sd"), meanQ.as("mean_q"))
          .filter(col("sd") / col("mean_q") > 0.5)
          .select(col("l_suppkey"), col("mon"), col("sd"),
            (col("sd") / col("mean_q")).as("cov"))
          .orderBy("l_suppkey", "mon")
      }),

    // DS q36 shape: ROLLUP over a product hierarchy with RANK within each
    // grouping LEVEL — the window partitions on GROUPING() outputs, so
    // detail rows rank against siblings under the same parent while
    // subtotal rows rank against other subtotals. One fact scan (broadcast
    // dim join), one rollup aggregation, one window over the ~|types x
    // brands| aggregate — the window never sees fact rows. The ratio is a
    // single double division of exact decimal sums (bit-identical across
    // engines); ORDER BY pins NULLS FIRST because DuckDB's ASC default is
    // NULLS LAST, Spark's is NULLS FIRST.
    {
      val rollupRankSql = s"""
      WITH g AS (
        SELECT CAST(GROUPING(p_type) + GROUPING(p_brand) AS BIGINT) AS grp_level,
               p_type, p_brand,
               CAST(GROUPING(p_brand) AS INT) AS gb,
               ${Q.oSumRev("l_extendedprice", "l_discount")} AS revs,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qtys
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY ROLLUP(p_type, p_brand))
      SELECT grp_level, p_type, p_brand, revs / qtys AS ratio,
             CAST(rnk AS BIGINT) AS rnk
      FROM (SELECT *, RANK() OVER (
              PARTITION BY grp_level, CASE WHEN gb = 0 THEN p_type END
              ORDER BY revs / qtys DESC) AS rnk FROM g)
      WHERE rnk <= 3
      ORDER BY grp_level, p_type NULLS FIRST, p_brand NULLS FIRST"""
      QE("q121_ds_rollup_rank", Some(rollupRankSql),
        // The rollup output feeding a window keyed on grouping columns trips
        // the DataFrame ambiguous-self-join guard (as with q115); the same
        // shape through the parser resolves cleanly. The Spark side
        // pre-aggregates to (p_type, p_brand) BEFORE the rollup so Expand
        // multiplies ~|types x brands| partials instead of every joined
        // fact row (3x the fact mass fed the aggregate; guide §2.3
        // aggregate-before-you-expand). Decimal partial sums re-aggregate
        // exactly and cast to DOUBLE at the same final point, so every
        // ratio is bit-identical to the oracle text's.
        (s, d) => {
          Tables.views(s, d)
          s.sql(s"""
          WITH pre AS (
            SELECT p_type, p_brand,
                   SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS srev,
                   SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sqty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type, p_brand),
          g AS (
            SELECT CAST(GROUPING(p_type) + GROUPING(p_brand) AS BIGINT) AS grp_level,
                   p_type, p_brand,
                   CAST(GROUPING(p_brand) AS INT) AS gb,
                   CAST(SUM(srev) AS DOUBLE) AS revs,
                   CAST(SUM(sqty) AS DOUBLE) AS qtys
            FROM pre GROUP BY ROLLUP(p_type, p_brand))
          SELECT grp_level, p_type, p_brand, revs / qtys AS ratio,
                 CAST(rnk AS BIGINT) AS rnk
          FROM (SELECT *, RANK() OVER (
                  PARTITION BY grp_level, CASE WHEN gb = 0 THEN p_type END
                  ORDER BY revs / qtys DESC) AS rnk FROM g)
          WHERE rnk <= 3
          ORDER BY grp_level, p_type NULLS FIRST, p_brand NULLS FIRST""")
        })
    },

    // DS q64 shape: the multi-round-trip — (customer, part) pairs bought in
    // TWO different years at a DECREASING average price. The DS original
    // builds the same CTE twice and self-joins (two full fact passes +
    // a shuffle join of the two copies); conditional aggregation linearizes
    // it to ONE lineitem⋈orders pass and one (custkey, partkey) shuffle,
    // with both years' averages falling out of the same group — the same
    // linearization family as q110/q112. Averages divide exact decimal sums
    // by exact counts in DOUBLE, so both engines divide identical operands.
    QE("q129_ds_repeat_purchase", Some("""
      WITH pp AS (
        SELECT o_custkey, l_partkey,
               SUM(CASE WHEN CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1996
                   THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS s96,
               COUNT(*) FILTER (WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1996) AS n96,
               SUM(CASE WHEN CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1997
                   THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS s97,
               COUNT(*) FILTER (WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1997) AS n97
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_partkey)
      SELECT o_custkey AS custkey, l_partkey AS partkey,
             CAST(s96 AS DOUBLE) / n96 AS avg96,
             CAST(s97 AS DOUBLE) / n97 AS avg97
      FROM pp
      WHERE n96 > 0 AND n97 > 0
        AND CAST(s97 AS DOUBLE) / n97 < CAST(s96 AS DOUBLE) / n96
      ORDER BY custkey, partkey"""),
      (s, d) => {
        val yr = year(col("o_orderdate"))
        val price = col("l_extendedprice").cast(Q.dec)
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("l_partkey"))
          .agg(
            sum(when(yr === 1996, price)).as("s96"),
            count(when(yr === 1996, 1)).as("n96"),
            sum(when(yr === 1997, price)).as("s97"),
            count(when(yr === 1997, 1)).as("n97"))
          .filter(col("n96") > 0 && col("n97") > 0)
          .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"),
            (col("s96").cast(DoubleType) / col("n96")).as("avg96"),
            (col("s97").cast(DoubleType) / col("n97")).as("avg97"))
          .filter(col("avg97") < col("avg96"))
          .orderBy("custkey", "partkey")
      }),

    // DS q78 shape: cross-channel anti-correlation — customers whose
    // urgent-priority spend GREW year-over-year while routine spend FELL.
    // The DS original computes each (channel, year) series as its own CTE
    // and chains three joins (four fact passes); here all four series are
    // conditional aggregates of ONE orders scan with a single custkey
    // shuffle. Growth ratios divide exact decimal sums in DOUBLE.
    QE("q130_ds_channel_anticorr", Some("""
      WITH per AS (
        SELECT o_custkey,
               SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         AND CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1996
                   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS u96,
               SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         AND CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1997
                   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS u97,
               SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                         AND CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1996
                   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r96,
               SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                         AND CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1997
                   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r97
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey AS custkey,
             CAST(u97 AS DOUBLE) / CAST(u96 AS DOUBLE) AS urgent_growth,
             CAST(r97 AS DOUBLE) / CAST(r96 AS DOUBLE) AS routine_growth
      FROM per
      WHERE u96 IS NOT NULL AND u97 IS NOT NULL
        AND r96 IS NOT NULL AND r97 IS NOT NULL
        AND CAST(u97 AS DOUBLE) > CAST(u96 AS DOUBLE)
        AND CAST(r97 AS DOUBLE) < CAST(r96 AS DOUBLE)
      ORDER BY custkey"""),
      (s, d) => {
        val yr = year(col("o_orderdate"))
        val urgent = col("o_orderpriority") === "1-URGENT"
        val v = col("o_totalprice").cast(Q.dec)
        t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            sum(when(urgent && yr === 1996, v)).as("u96"),
            sum(when(urgent && yr === 1997, v)).as("u97"),
            sum(when(!urgent && yr === 1996, v)).as("r96"),
            sum(when(!urgent && yr === 1997, v)).as("r97"))
          .filter(col("u96").isNotNull && col("u97").isNotNull &&
            col("r96").isNotNull && col("r97").isNotNull &&
            col("u97").cast(DoubleType) > col("u96").cast(DoubleType) &&
            col("r97").cast(DoubleType) < col("r96").cast(DoubleType))
          .select(col("o_custkey").as("custkey"),
            (col("u97").cast(DoubleType) / col("u96").cast(DoubleType)).as("urgent_growth"),
            (col("r97").cast(DoubleType) / col("r96").cast(DoubleType)).as("routine_growth"))
          .orderBy("custkey")
      }),

    // DS q47 shape: monthly deviation-from-yearly-average with lag/lead
    // context — months where a nation's revenue spikes >1.2x its own
    // yearly mean, reported with the neighbouring months' revenue. Three
    // window functions (avg, lag, lead) over the SAME aggregated
    // (nation, year, month) series: the fact table shuffles once into the
    // aggregate; every window sees O(nations x months) rows, never facts;
    // dims broadcast. Mean divides exact decimal sums by counts in DOUBLE.
    QE("q131_ds_monthly_deviation", Some("""
      WITH nm AS (
        SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, yr, mon),
      w AS (
        SELECT n_name, yr, mon, CAST(rev AS DOUBLE) AS rev,
               CAST(SUM(rev) OVER (PARTITION BY n_name, yr) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY n_name, yr) AS yr_avg,
               CAST(lag(rev) OVER (PARTITION BY n_name ORDER BY yr, mon) AS DOUBLE) AS prev_rev,
               CAST(lead(rev) OVER (PARTITION BY n_name ORDER BY yr, mon) AS DOUBLE) AS next_rev
        FROM nm)
      SELECT n_name, yr, mon, rev, yr_avg, prev_rev, next_rev
      FROM w WHERE rev > 1.2 * yr_avg
      ORDER BY n_name, yr, mon"""),
      (s, d) => {
        val nm = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mon"))
          .agg(sum(col("o_totalprice").cast(Q.dec)).as("_rev"))
        val wy = Window.partitionBy("n_name", "yr")
        val ws = Window.partitionBy("n_name").orderBy("yr", "mon")
        nm.select(col("n_name"), col("yr"), col("mon"),
            col("_rev").cast(DoubleType).as("rev"),
            (sum(col("_rev")).over(wy).cast(DoubleType) /
              count(lit(1)).over(wy)).as("yr_avg"),
            lag(col("_rev"), 1).over(ws).cast(DoubleType).as("prev_rev"),
            lead(col("_rev"), 1).over(ws).cast(DoubleType).as("next_rev"))
          .filter(col("rev") > lit(1.2) * col("yr_avg"))
          .orderBy("n_name", "yr", "mon")
      }),

    // DS q34/q73 shape: order-frequency banding — count orders per
    // customer, band the counts, count customers per band. Two cascaded
    // aggregations: the custkey shuffle carries pre-aggregated counts and
    // the band aggregate is O(bands). The CASE banding is a plain
    // projection between them — no join, no second fact pass (the DS
    // original routes through a HAVING + self-join).
    QE("q136_ds_order_bands", Some("""
      WITH per AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey),
      banded AS (
        SELECT CASE WHEN n_orders <= 5 THEN '01-05'
                    WHEN n_orders <= 10 THEN '06-10'
                    WHEN n_orders <= 15 THEN '11-15'
                    ELSE '16+' END AS band, o_custkey
        FROM per)
      SELECT band, COUNT(*) AS n_cust
      FROM banded GROUP BY band ORDER BY band"""),
      (s, d) => {
        val per = t(s, d, "orders")
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        per.select(
            when(col("n_orders") <= 5, "01-05")
              .when(col("n_orders") <= 10, "06-10")
              .when(col("n_orders") <= 15, "11-15")
              .otherwise("16+").as("band"))
          .groupBy("band").agg(count(lit(1)).as("n_cust"))
          .orderBy("band")
      }),

    // DS q15 shape: regions contributing more than a fixed share of global
    // revenue — an aggregate gated by its OWN total. The oracle spells it
    // as a scalar subquery over the shared CTE; the Spark side computes
    // the total as an unpartitioned window over the 5-row rollup, so the
    // fact side is aggregated exactly ONCE (the naive scalar-subquery
    // translation re-plans the whole rollup for the total — a second full
    // fact pass at 100 TB). Share compares in DOUBLE from exact decimal
    // sums on both sides.
    QE("q137_ds_region_share", Some("""
      WITH rr AS (
        SELECT r_name, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name)
      SELECT r_name, CAST(rev AS DOUBLE) AS revenue
      FROM rr
      WHERE CAST(rev AS DOUBLE) > 0.2 * (SELECT CAST(SUM(rev) AS DOUBLE) FROM rr)
      ORDER BY r_name"""),
      (s, d) => {
        val rr = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(sum(col("o_totalprice").cast(Q.dec)).as("rev"))
        // unpartitioned window over the |regions|-row aggregate — NOT over
        // fact rows; the single-partition exchange carries 5 rows
        val tot = sum(col("rev")).over(Window.partitionBy()).cast(DoubleType)
        rr.withColumn("_tot", tot)
          .filter(col("rev").cast(DoubleType) > lit(0.2) * col("_tot"))
          .select(col("r_name"), col("rev").cast(DoubleType).as("revenue"))
          .orderBy("r_name")
      }),

    // DS q90 shape: AM/PM activity ratio per user over the events table —
    // two time-window counts from ONE scan via conditional aggregation
    // (the DS original cross-joins two scalar-subquery scans), keeping
    // morning-heavy users. The hour bucket comes from the normalized
    // event-time column, so this entry also regression-covers the NTZ
    // ingestion path in a plain batch aggregate.
    QE("q138_ds_ampm_ratio", Some("""
      WITH h AS (
        SELECT user_id,
               COUNT(*) FILTER (WHERE CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS INT) < 12) AS am,
               COUNT(*) FILTER (WHERE CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS INT) >= 12) AS pm
        FROM events GROUP BY user_id)
      SELECT user_id, am, pm, CAST(am AS DOUBLE) / (am + pm) AS am_frac
      FROM h WHERE am > 0 AND pm > 0 AND CAST(am AS DOUBLE) / (am + pm) > 0.52
      ORDER BY user_id"""),
      (s, d) => {
        val hr = hour(col("ts"))
        t(s, d, "events")
          .groupBy("user_id")
          .agg(count(when(hr < 12, 1)).as("am"),
            count(when(hr >= 12, 1)).as("pm"))
          .filter(col("am") > 0 && col("pm") > 0)
          .withColumn("am_frac", col("am").cast(DoubleType) / (col("am") + col("pm")))
          .filter(col("am_frac") > 0.52)
          .select("user_id", "am", "pm", "am_frac")
          .orderBy("user_id")
      }),

    // DS q44 shape: best-vs-worst rank join — top-10 parts by total
    // quantity paired positionally with the bottom-10. BOTH ranks are
    // windows over the SAME per-part aggregate (one fact pass; the window
    // input is |parts| rows), and the pairing is a self-join of that tiny
    // ranked table on rank position. Rank ties break on the key so top/
    // bottom lists are total orders; rank() cast to BIGINT for DuckDB
    // type parity.
    QE("q140_ds_best_worst", Some("""
      WITH pa AS (
        SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem GROUP BY l_partkey),
      r AS (
        SELECT l_partkey, qty,
               rank() OVER (ORDER BY CAST(qty AS DOUBLE) DESC, l_partkey) AS rb,
               rank() OVER (ORDER BY CAST(qty AS DOUBLE) ASC, l_partkey) AS rw
        FROM pa)
      SELECT b.rb AS rnk, b.l_partkey AS best_part, CAST(b.qty AS DOUBLE) AS best_qty,
             w.l_partkey AS worst_part, CAST(w.qty AS DOUBLE) AS worst_qty
      FROM r b JOIN r w ON b.rb = w.rw
      WHERE b.rb <= 10 ORDER BY rnk"""),
      (s, d) => {
        val pa = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(col("l_quantity").cast(Q.dec)).as("qty"))
        val qd = col("qty").cast(DoubleType)
        val r = pa.select(col("l_partkey"), col("qty"),
          rank().over(Window.orderBy(qd.desc, col("l_partkey"))).cast(LongType).as("rb"),
          rank().over(Window.orderBy(qd.asc, col("l_partkey"))).cast(LongType).as("rw"))
        val best = r.filter(col("rb") <= 10)
          .select(col("rb").as("rnk"), col("l_partkey").as("best_part"),
            col("qty").cast(DoubleType).as("best_qty"))
        val worst = r
          .select(col("rw").as("wrnk"), col("l_partkey").as("worst_part"),
            col("qty").cast(DoubleType).as("worst_qty"))
        best.join(worst, col("rnk") === col("wrnk"))
          .select("rnk", "best_part", "best_qty", "worst_part", "worst_qty")
          .orderBy("rnk")
      }),

    // DS q54 shape: temporal purchase sequencing — customers whose FIRST
    // urgent order is later followed by a routine order, counted per
    // segment. The per-customer anchor date is a conditional aggregate
    // (one pushed-filter pass); the "later routine order" test is a
    // LEFT SEMI join on custkey with the date residual evaluated inside
    // the join — no fact row survives the probe, and the customer dim
    // joins the ~|customers| anchor table, not raw orders.
    QE("q141_ds_sequenced_purchase", Some("""
      WITH uf AS (
        SELECT o_custkey, MIN(o_orderdate) AS first_urgent
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey)
      SELECT c_mktsegment, COUNT(*) AS n_cust
      FROM uf
      JOIN customer ON c_custkey = uf.o_custkey
      WHERE EXISTS (SELECT 1 FROM orders r
                    WHERE r.o_custkey = uf.o_custkey
                      AND r.o_orderpriority <> '1-URGENT'
                      AND r.o_orderdate > first_urgent)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) => {
        val uf = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .groupBy("o_custkey")
          .agg(min(col("o_orderdate")).as("first_urgent"))
        val routine = t(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey").as("r_custkey"), col("o_orderdate").as("r_date"))
        uf.join(routine,
            col("o_custkey") === col("r_custkey") && col("r_date") > col("first_urgent"),
            "left_semi")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("c_mktsegment")
      }),

    // DS q64 shape: multi-round-trip — the same (customer, part) pair
    // bought in two consecutive years, with both years' quantities side by
    // side. Each trip's year restriction is applied BEFORE its join+agg
    // (the join condition forces b.yr = 1997, so filtering branch b
    // explicitly is semantics-preserving; Catalyst does not infer it
    // through the +1 arithmetic — measured: the unfiltered branch
    // aggregated ALL years), so each branch joins and aggregates one
    // year's facts, and the round-trip join probes |cust×part| pre-agg'd
    // rows, never raw facts (the DS original re-scans store_sales per
    // trip WITHOUT the year cut). With a date-partitioned layout both
    // branch scans prune to their year's partitions.
    QE("q142_ds_cross_year", Some("""
      WITH cp AS (
        SELECT o_custkey AS cust, l_partkey AS part,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2, 3)
      SELECT a.cust AS cust, a.part AS part,
             CAST(a.qty AS DOUBLE) AS qty_y1, CAST(b.qty AS DOUBLE) AS qty_y2
      FROM cp a JOIN cp b
        ON a.cust = b.cust AND a.part = b.part AND b.yr = a.yr + 1
      WHERE a.yr = 1996
      ORDER BY cust, part"""),
      (s, d) => {
        def trip(yr: Int) = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(year(col("o_orderdate")) === yr),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
          .agg(sum(col("l_quantity").cast(Q.dec)).as("qty"))
        val a = trip(1996)
        val b = trip(1997).select(col("cust").as("cust_b"),
          col("part").as("part_b"), col("qty").as("qty_b"))
        a.join(b, col("cust") === col("cust_b") && col("part") === col("part_b"))
          .select(col("cust"), col("part"),
            col("qty").cast(DoubleType).as("qty_y1"),
            col("qty_b").cast(DoubleType).as("qty_y2"))
          .orderBy("cust", "part")
      }),

    // DS q1 shape: outliers vs their group's average — customers whose
    // returned quantity exceeds 1.2x their NATION's mean returned
    // quantity. The oracle spells the mean as a correlated scalar
    // subquery; the Spark side computes it as a window over the
    // per-customer AGGREGATE partitioned by nation, so the fact pass runs
    // once and the "second scan" the DS original implies is a shuffle of
    // |customers| pre-agg'd rows. Mean = exact decimal sum / count, cast
    // to double on both sides, so the boundary filter is bit-identical.
    QE("q143_ds_return_outliers", Some("""
      WITH ret AS (
        SELECT c_custkey, c_nationkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS rq
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2)
      SELECT c_custkey, CAST(rq AS DOUBLE) AS ret_qty
      FROM ret r1
      WHERE CAST(rq AS DOUBLE) > 1.2 * (
        SELECT CAST(SUM(rq) AS DOUBLE) / COUNT(*) FROM ret r2
        WHERE r2.c_nationkey = r1.c_nationkey)
      ORDER BY c_custkey"""),
      (s, d) => {
        val ret = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_nationkey")
          .agg(sum(col("l_quantity").cast(Q.dec)).as("rq"))
        val wn = Window.partitionBy("c_nationkey")
        ret.withColumn("_nat_avg",
            sum(col("rq")).over(wn).cast(DoubleType) / count(lit(1)).over(wn))
          .filter(col("rq").cast(DoubleType) > lit(1.2) * col("_nat_avg"))
          .select(col("c_custkey"), col("rq").cast(DoubleType).as("ret_qty"))
          .orderBy("c_custkey")
      }),

    // DS q49 shape: per-channel worst-return ranking — return ratio per
    // part within each line status "channel", rank inside the channel,
    // keep the top 10. Both the returned and total quantity come from ONE
    // conditional-aggregate scan (the DS original unions three
    // channel-specific subqueries, each with its own scan); the window
    // input is the |channel x part| aggregate. WindowGroupLimit pushes the
    // rank<=10 cap below the sort at scale. Ratio ranks in DOUBLE with a
    // part-key tiebreak so ordering is total on both engines.
    QE("q144_ds_return_rank", Some("""
      WITH base AS (
        SELECT l_linestatus AS channel, l_partkey,
               SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2))
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_q,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS tot_q
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT channel, l_partkey,
               CAST(ret_q AS DOUBLE) / CAST(tot_q AS DOUBLE) AS ratio,
               rank() OVER (PARTITION BY channel
                 ORDER BY CAST(ret_q AS DOUBLE) / CAST(tot_q AS DOUBLE) DESC,
                          l_partkey) AS rnk
        FROM base)
      SELECT channel, l_partkey, ratio, CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= 10 ORDER BY channel, rnk"""),
      (s, d) => {
        val base = t(s, d, "lineitem")
          .groupBy(col("l_linestatus").as("channel"), col("l_partkey"))
          .agg(
            sum(when(col("l_returnflag") === "R", col("l_quantity").cast(Q.dec))
              .otherwise(lit(0).cast(Q.dec))).as("ret_q"),
            sum(col("l_quantity").cast(Q.dec)).as("tot_q"))
        val ratio = col("ret_q").cast(DoubleType) / col("tot_q").cast(DoubleType)
        base.select(col("channel"), col("l_partkey"), ratio.as("ratio"),
            rank().over(Window.partitionBy("channel")
              .orderBy(ratio.desc, col("l_partkey"))).cast(LongType).as("rnk"))
          .filter(col("rnk") <= 10)
          .orderBy("channel", "rnk")
      }),

    // DS q88 shape: multi-bucket census in ONE scan — eight 3-hour
    // activity counts over the events table as a single-row conditional
    // aggregate. The DS original cross-joins eight scalar-subquery scans
    // of store_sales; here all eight counts share one pushed scan and one
    // partial-agg pipeline, so the plan cost is one fact pass regardless
    // of bucket count. Also regression-covers NTZ-normalized event time in
    // a plain batch aggregate (hour() on the normalized column).
    QE("q145_ds_hour_census", Some("""
      SELECT
        COUNT(*) FILTER (WHERE h >= 0  AND h < 3)  AS h00_02,
        COUNT(*) FILTER (WHERE h >= 3  AND h < 6)  AS h03_05,
        COUNT(*) FILTER (WHERE h >= 6  AND h < 9)  AS h06_08,
        COUNT(*) FILTER (WHERE h >= 9  AND h < 12) AS h09_11,
        COUNT(*) FILTER (WHERE h >= 12 AND h < 15) AS h12_14,
        COUNT(*) FILTER (WHERE h >= 15 AND h < 18) AS h15_17,
        COUNT(*) FILTER (WHERE h >= 18 AND h < 21) AS h18_20,
        COUNT(*) FILTER (WHERE h >= 21 AND h < 24) AS h21_23
      FROM (SELECT CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS INT) AS h
            FROM events)"""),
      (s, d) => {
        val h = hour(col("ts"))
        def bucket(lo: Int, hi: Int, name: String) =
          count(when(h >= lo && h < hi, 1)).as(name)
        t(s, d, "events").agg(
          bucket(0, 3, "h00_02"), bucket(3, 6, "h03_05"),
          bucket(6, 9, "h06_08"), bucket(9, 12, "h09_11"),
          bucket(12, 15, "h12_14"), bucket(15, 18, "h15_17"),
          bucket(18, 21, "h18_20"), bucket(21, 24, "h21_23"))
      }),

    // DS q51 shape: dual cumulative series compared month by month —
    // urgent-priority vs routine running revenue, keeping the months where
    // the urgent channel's cumulative share exceeds 0.5. The DS original
    // aggregates web_sales and store_sales separately and FULL OUTER JOINs
    // the two series; both channels here come from ONE conditional-agg
    // scan (null-skipping sums) and the two running totals are windows
    // over the ~|months| aggregate — the join disappears and the fact
    // side is read once. Cumulative sums stay exact DECIMAL inside the
    // window frame; only the share division runs in double.
    QE("q160_ds_cumulative_share", Some("""
      WITH m AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
               SUM(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS urgent,
               SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS routine
        FROM orders GROUP BY 1, 2),
      c AS (
        SELECT yr, mon,
               SUM(urgent) OVER (ORDER BY yr, mon) AS cum_u,
               SUM(routine) OVER (ORDER BY yr, mon) AS cum_r
        FROM m)
      SELECT yr, mon,
             CAST(cum_u AS DOUBLE) AS cum_urgent, CAST(cum_r AS DOUBLE) AS cum_routine,
             CAST(cum_u AS DOUBLE) / (CAST(cum_u AS DOUBLE) + CAST(cum_r AS DOUBLE)) AS u_share
      FROM c
      WHERE CAST(cum_u AS DOUBLE) / (CAST(cum_u AS DOUBLE) + CAST(cum_r AS DOUBLE)) > 0.19
      ORDER BY yr, mon"""),
      (s, d) => {
        val m = t(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mon"))
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT",
              col("o_totalprice").cast(Q.dec))).as("urgent"),
            sum(when(col("o_orderpriority") =!= "1-URGENT",
              col("o_totalprice").cast(Q.dec))).as("routine"))
        val wc = Window.orderBy("yr", "mon")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cu = sum(col("urgent")).over(wc)
        val cr = sum(col("routine")).over(wc)
        m.select(col("yr"), col("mon"),
            cu.cast(DoubleType).as("cum_urgent"), cr.cast(DoubleType).as("cum_routine"))
          .withColumn("u_share",
            col("cum_urgent") / (col("cum_urgent") + col("cum_routine")))
          .filter(col("u_share") > 0.19)
          .orderBy("yr", "mon")
      }),

    // DS q93 shape: returns-adjusted revenue — a composite-key
    // (orderkey, linenumber) left join of the fact against its own
    // returned subset, with COALESCE filling the no-return case. Both
    // join sides hash-partition on the SAME composite key (co-partitioned
    // shuffle, no replication), and the returned side carries only
    // (key, ret_qty) — at 100 TB the probe payload is two columns, not
    // the full fact row. Adjusted amount stays an exact scale-4 decimal
    // product per row.
    QE("q161_ds_returns_adjust", Some("""
      WITH r AS (
        SELECT l_orderkey AS rk, l_linenumber AS rl,
               CAST(FLOOR(l_quantity / 2) AS DECIMAL(12,2)) AS ret_qty
        FROM lineitem WHERE l_returnflag = 'R')
      SELECT l_orderkey,
             CAST(SUM((CAST(l_quantity AS DECIMAL(12,2)) - COALESCE(ret_qty, CAST(0 AS DECIMAL(12,2))))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS adj_rev
      FROM lineitem LEFT JOIN r ON l_orderkey = rk AND l_linenumber = rl
      GROUP BY l_orderkey
      HAVING COUNT(ret_qty) > 0
      ORDER BY adj_rev DESC, l_orderkey LIMIT 25"""),
      (s, d) => {
        val r = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("rk"), col("l_linenumber").as("rl"),
            floor(col("l_quantity") / 2).cast(Q.dec).as("ret_qty"))
        t(s, d, "lineitem")
          .join(r, col("l_orderkey") === col("rk") && col("l_linenumber") === col("rl"),
            "left")
          .groupBy("l_orderkey")
          .agg(
            sum((col("l_quantity").cast(Q.dec) -
              coalesce(col("ret_qty"), lit(0).cast(Q.dec))) *
              col("l_extendedprice").cast(Q.dec)).cast(DoubleType).as("adj_rev"),
            count(col("ret_qty")).as("_nret"))
          .filter(col("_nret") > 0).drop("_nret")
          .orderBy(col("adj_rev").desc, col("l_orderkey"))
          .limit(25)
      }),

    // DS q59 shape: same-weekday year-over-year comparison — nation x
    // day-of-week revenue for 1996 vs 1997 from ONE conditional-agg pass
    // (q59 plans it as two channel CTEs joined on (store, weekday); both
    // series here share a scan, so the fact is read and shuffled once and
    // the "join" is free). Spark's dayofweek is 1=Sunday..7; DuckDB's
    // EXTRACT(DOW) is 0=Sunday..6 — the -1 aligns them. Exact decimal
    // sums; the ratio is one double division in identical op order.
    QE("q165_ds_weekday_compare", Some("""
      WITH w AS (
        SELECT n_name, CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow,
               SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996
                        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r96,
               SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1997
                        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r97
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2)
      SELECT n_name, dow,
             CAST(r96 AS DOUBLE) AS rev96, CAST(r97 AS DOUBLE) AS rev97,
             CAST(r97 AS DOUBLE) / CAST(r96 AS DOUBLE) AS ratio
      FROM w WHERE r96 IS NOT NULL AND r97 IS NOT NULL
      ORDER BY n_name, dow"""),
      (s, d) => {
        val w = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            (dayofweek(col("o_orderdate")) - 1).cast(IntegerType).as("dow"))
          .agg(
            sum(when(year(col("o_orderdate")) === 1996,
              col("o_totalprice").cast(Q.dec))).as("r96"),
            sum(when(year(col("o_orderdate")) === 1997,
              col("o_totalprice").cast(Q.dec))).as("r97"))
        w.filter(col("r96").isNotNull && col("r97").isNotNull)
          .select(col("n_name"), col("dow"),
            col("r96").cast(DoubleType).as("rev96"),
            col("r97").cast(DoubleType).as("rev97"),
            (col("r97").cast(DoubleType) / col("r96").cast(DoubleType)).as("ratio"))
          .orderBy("n_name", "dow")
      }),

    // DS q66 shape: the 12-month report matrix — per-nation monthly
    // revenue columns for one year, materialized as TWELVE conditional
    // sums in ONE fact pass (q66's reference formulation scans the fact
    // per channel and unions; conditional aggregation keeps it to a
    // single scan + single shuffle of 25-row partial states no matter
    // how wide the matrix gets). Missing cells COALESCE to exact 0.
    QE("q166_ds_monthly_matrix", Some {
      val cols = (1 to 12).map { m =>
        f"CAST(COALESCE(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = $m THEN CAST(o_totalprice AS DECIMAL(12,2)) END), CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS m$m%02d"
      }.mkString(",\n             ")
      s"""
      SELECT n_name,
             $cols,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name ORDER BY n_name"""
    },
      (s, d) => {
        val monthCols = (1 to 12).map { m =>
          coalesce(sum(when(month(col("o_orderdate")) === m,
            col("o_totalprice").cast(Q.dec))), lit(0).cast(Q.dec))
            .cast(DoubleType).as(f"m$m%02d")
        }
        t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(monthCols.head, monthCols.tail :+
            Q.dsum(col("o_totalprice")).as("total"): _*)
          .orderBy("n_name")
      }),

    // DS q13/q48 shape: disjunctive band predicates — three
    // (priority, order-value band, quantity band) conjunctions OR'd into
    // one filter, aggregated per band origin. The plan point: the OR is
    // ONE codegen'd predicate evaluated post-join in a single fact pass —
    // never the naive three-scan UNION a per-band rewrite would produce.
    // The per-band split comes free from conditional aggregation over
    // rows that already passed the disjunction.
    QE("q167_ds_band_disjunction", Some("""
      WITH f AS (
        SELECT o_orderpriority, l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE (o_orderpriority = '1-URGENT'
                 AND o_totalprice BETWEEN 0 AND 50000
                 AND l_quantity BETWEEN 1 AND 20)
           OR (o_orderpriority = '2-HIGH'
                 AND o_totalprice BETWEEN 50000 AND 150000
                 AND l_quantity BETWEEN 10 AND 40)
           OR (o_orderpriority = '3-MEDIUM'
                 AND o_totalprice BETWEEN 100000 AND 300000
                 AND l_quantity BETWEEN 20 AND 50))
      SELECT o_orderpriority, COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => {
        def band(p: String, lo: Int, hi: Int, qlo: Int, qhi: Int) =
          col("o_orderpriority") === p &&
            col("o_totalprice").between(lo, hi) &&
            col("l_quantity").between(qlo, qhi)
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(band("1-URGENT", 0, 50000, 1, 20) ||
            band("2-HIGH", 50000, 150000, 10, 40) ||
            band("3-MEDIUM", 100000, 300000, 20, 50))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_rows"), Q.dsum(col("l_quantity")).as("total_qty"))
          .orderBy("o_orderpriority")
      }),

    // DS q11 shape: per-customer year-over-year spend growth gated by the
    // GLOBAL growth ratio derived from the same aggregate — one
    // conditional-agg pass of orders builds the per-customer series, the
    // scalar gate re-aggregates those ~|customers| rows (KB-scale, then
    // broadcast), so the fact is scanned and shuffled exactly once and
    // the gate costs no second fact pass (q11's reference plan scans the
    // fact per channel per year — four times).
    QE("q168_ds_growth_gate", Some("""
      WITH cs AS (
        SELECT o_custkey,
               SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996
                        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r96,
               SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1997
                        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r97
        FROM orders GROUP BY o_custkey),
      g AS (SELECT CAST(SUM(r97) AS DOUBLE) / CAST(SUM(r96) AS DOUBLE) AS gr FROM cs)
      SELECT o_custkey, CAST(r96 AS DOUBLE) AS rev96, CAST(r97 AS DOUBLE) AS rev97,
             CAST(r97 AS DOUBLE) / CAST(r96 AS DOUBLE) AS growth
      FROM cs, g
      WHERE r96 IS NOT NULL AND r97 IS NOT NULL
        AND CAST(r97 AS DOUBLE) / CAST(r96 AS DOUBLE) > gr
      ORDER BY growth DESC, o_custkey LIMIT 25"""),
      (s, d) => {
        val cs = t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(
            sum(when(year(col("o_orderdate")) === 1996,
              col("o_totalprice").cast(Q.dec))).as("r96"),
            sum(when(year(col("o_orderdate")) === 1997,
              col("o_totalprice").cast(Q.dec))).as("r97"))
        val g = cs.agg(
          (sum(col("r97")).cast(DoubleType) / sum(col("r96")).cast(DoubleType)).as("gr"))
        cs.crossJoin(broadcast(g))
          .filter(col("r96").isNotNull && col("r97").isNotNull &&
            col("r97").cast(DoubleType) / col("r96").cast(DoubleType) > col("gr"))
          .select(col("o_custkey"),
            col("r96").cast(DoubleType).as("rev96"),
            col("r97").cast(DoubleType).as("rev97"),
            (col("r97").cast(DoubleType) / col("r96").cast(DoubleType)).as("growth"))
          .orderBy(col("growth").desc, col("o_custkey"))
          .limit(25)
      }),

    // DS q9 shape: the band-statistics report — five quantity-band average
    // prices and counts as ONE row. The DS original states each band as
    // its own scalar subquery (15 fact scans); conditional aggregation
    // computes all five bands in a single pass, and adding a band adds a
    // column, not a scan. Averages come from exact decimal sums over
    // integer counts, divided once in double — bit-identical cross-engine.
    QE("q170_ds_band_scalar_report", Some {
      val bands = Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
      val cols = bands.zipWithIndex.map { case ((lo, hi), i) =>
        s"""CAST(CAST(SUM(CASE WHEN l_quantity BETWEEN $lo AND $hi
                    THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE)
               / COUNT(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN 1 END) AS DOUBLE)
               AS avg_price_b${i + 1},
             CAST(COUNT(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN 1 END) AS BIGINT)
               AS n_b${i + 1}"""
      }.mkString(",\n             ")
      s"""
      SELECT $cols
      FROM lineitem"""
    },
      (s, d) => {
        val bands = Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
        val aggCols = bands.zipWithIndex.flatMap { case ((lo, hi), i) =>
          val in = col("l_quantity").between(lo, hi)
          Seq(
            (sum(when(in, col("l_extendedprice").cast(Q.dec))).cast(DoubleType) /
              count(when(in, 1))).cast(DoubleType).as(s"avg_price_b${i + 1}"),
            count(when(in, 1)).as(s"n_b${i + 1}"))
        }
        t(s, d, "lineitem").agg(aggCols.head, aggCols.tail: _*)
      }),

    // DS q33/q56/q60 shape: the three-window union report — per-brand
    // revenue from three disjoint ship-month windows, totaled. The DS
    // originals UNION ALL three per-channel aggregates and re-aggregate
    // (three fact passes); here the windows are three conditional columns
    // off ONE scan whose pushed filter covers their union, so the fact is
    // read once and the shuffle carries |brands| partial states.
    QE("q171_ds_union_report", Some(s"""
      SELECT p_brand,
             ${Seq(("1996-01-01", "1996-02-01", "w1"), ("1996-06-01", "1996-07-01", "w2"),
        ("1996-12-01", "1997-01-01", "w3")).map { case (lo, hi, n) =>
        s"""CAST(COALESCE(SUM(CASE WHEN l_shipdate >= TIMESTAMP '$lo 00:00:00'
                   AND l_shipdate < TIMESTAMP '$hi 00:00:00'
                   THEN ${Q.oRev("l_extendedprice", "l_discount")} END),
                 CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS rev_$n"""
      }.mkString(",\n             ")},
             CAST(SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS DOUBLE) AS rev_all
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00')
         OR (l_shipdate >= TIMESTAMP '1996-06-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')
         OR (l_shipdate >= TIMESTAMP '1996-12-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
      GROUP BY p_brand ORDER BY p_brand"""),
      (s, d) => {
        def win(lo: String, hi: String) =
          col("l_shipdate") >= lit(lo).cast(TimestampType) &&
            col("l_shipdate") < lit(hi).cast(TimestampType)
        val ws = Seq(("1996-01-01", "1996-02-01", "w1"),
          ("1996-06-01", "1996-07-01", "w2"), ("1996-12-01", "1997-01-01", "w3"))
        val winCols = ws.map { case (lo, hi, n) =>
          coalesce(sum(when(win(lo, hi),
            Q.revenue(col("l_extendedprice"), col("l_discount")))),
            lit(0).cast(Q.dec)).cast(DoubleType).as(s"rev_$n")
        }
        t(s, d, "lineitem")
          .filter(ws.map { case (lo, hi, _) => win(lo, hi) }.reduce(_ || _))
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(winCols.head, winCols.tail :+
            Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("rev_all"): _*)
          .orderBy("p_brand")
      }),

    // DS q97 shape: buyer-overlap census — how many customers bought in
    // both years vs only one, as ONE row from a FULL OUTER join of the
    // two distinct-buyer sets. Each side is a pushed-filter scan +
    // map-side-partial DISTINCT; the outer join co-partitions on the
    // already-deduplicated keys, so the shuffles carry distinct custkeys,
    // never raw facts, and the census is three conditional counts over
    // the joined null pattern.
    QE("q173_ds_buyer_overlap", Some("""
      WITH y96 AS (SELECT DISTINCT o_custkey AS c FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      y97 AS (SELECT DISTINCT o_custkey AS c FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      SELECT CAST(SUM(CASE WHEN y96.c IS NOT NULL AND y97.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_years,
             CAST(SUM(CASE WHEN y97.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1996,
             CAST(SUM(CASE WHEN y96.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1997
      FROM y96 FULL OUTER JOIN y97 ON y96.c = y97.c"""),
      (s, d) => {
        def buyers(y0: String, y1: String, n: String) = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(y0).cast(TimestampType) &&
            col("o_orderdate") < lit(y1).cast(TimestampType))
          .select(col("o_custkey").as(n)).distinct()
        buyers("1996-01-01", "1997-01-01", "c96")
          .join(buyers("1997-01-01", "1998-01-01", "c97"),
            col("c96") === col("c97"), "full_outer")
          .agg(
            sum(when(col("c96").isNotNull && col("c97").isNotNull, 1)
              .otherwise(0)).cast("long").as("both_years"),
            sum(when(col("c97").isNull, 1).otherwise(0)).cast("long").as("only_1996"),
            sum(when(col("c96").isNull, 1).otherwise(0)).cast("long").as("only_1997"))
      }),

    // DS q87 shape: the EXCEPT chain — customers who bought in 1996 but in
    // neither adjacent year, reported per segment. Each EXCEPT probes the
    // deduplicated 1996 set against another year's DISTINCT keys; Catalyst
    // plans the chain as cascaded left-anti hash joins over the
    // already-distinct sets, so like q106/q173 the shuffles carry distinct
    // custkeys only. The dim join then attributes the survivors.
    QE("q178_ds_except_chain", Some("""
      WITH y AS (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      SELECT c_mktsegment, COUNT(*) AS n_new_in_1996
      FROM customer JOIN y ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) => {
        def yr(y0: String, y1: String) = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(y0).cast(TimestampType) &&
            col("o_orderdate") < lit(y1).cast(TimestampType))
          .select("o_custkey")
        val only96 = yr("1996-01-01", "1997-01-01")
          .except(yr("1995-01-01", "1996-01-01"))
          .except(yr("1997-01-01", "1998-01-01"))
        t(s, d, "customer")
          .join(only96, col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_new_in_1996"))
          .orderBy("c_mktsegment")
      }),

    // DS q6 shape: nations with >= 5 distinct customers who bought parts
    // priced >= 1.003x their p_type category average (the driver data's
    // within-type price spread is < 2%, so the spec's 1.2x bar selects
    // nothing at any SF — the gate was vacuously green; 1.003x keeps the
    // above-category-average semantics with a bar the data can clear). The correlated
    // category-average predicate is computed ONCE as an aggregate of the
    // small part table and joined back (never per-row); the premium part
    // set is then BROADCAST into the single lineitem pass. The 1.2x
    // threshold is stated integer-exactly (1000*price*count >= 1003*sum of
    // 2-decimal DECIMALs), so both engines make bit-identical keep/drop
    // decisions — no float boundary can flip a row.
    QE("q190_ds_above_category_avg", Some("""
      WITH ca AS (SELECT p_type,
                    SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS s,
                    COUNT(*) AS c
                  FROM part GROUP BY p_type),
      prem AS (SELECT p_partkey FROM part JOIN ca USING (p_type)
               WHERE 1000 * CAST(p_retailprice AS DECIMAL(12,2)) * c >= 1003 * s)
      SELECT n_name, COUNT(DISTINCT o_custkey) AS n_cust
      FROM lineitem JOIN prem ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name HAVING COUNT(DISTINCT o_custkey) >= 5
      ORDER BY n_name"""),
      (s, d) => {
        val part = t(s, d, "part")
        val ca = part.groupBy("p_type")
          .agg(sum(col("p_retailprice").cast(Q.dec)).as("s"), count(lit(1)).as("c"))
        val prem = part.join(ca, "p_type")
          .filter(lit(1000) * col("p_retailprice").cast(Q.dec) * col("c") >= lit(1003) * col("s"))
          .select("p_partkey")
        t(s, d, "lineitem")
          .join(broadcast(prem), col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(countDistinct(col("o_custkey")).as("n_cust"))
          .filter(col("n_cust") >= 5)
          .orderBy("n_name")
      }),

    // DS q65 shape: per-supplier laggard items — (supplier, part) pairs
    // whose revenue is under half that supplier's average item revenue.
    // The fact table is aggregated ONCE to (suppkey, partkey) grain; the
    // per-supplier average is a window over that aggregate (sum + count
    // via one window partition), never a second fact scan or a self-join.
    // The half-of-average predicate is integer-exact (2*rev*n < sum), so
    // membership is bit-identical across engines.
    QE("q191_ds_laggard_items", Some(s"""
      WITH ir AS (SELECT l_suppkey, l_partkey,
                    SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS rev
                  FROM lineitem GROUP BY l_suppkey, l_partkey),
      w AS (SELECT l_suppkey, l_partkey, rev,
              SUM(rev) OVER (PARTITION BY l_suppkey) AS tot,
              COUNT(*) OVER (PARTITION BY l_suppkey) AS n
            FROM ir)
      SELECT s_name, l_partkey, CAST(rev AS DOUBLE) AS rev
      FROM w JOIN supplier ON l_suppkey = s_suppkey
      WHERE 2 * rev * n < tot
      ORDER BY s_name, l_partkey"""),
      (s, d) => {
        val ir = t(s, d, "lineitem")
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
        val w = Window.partitionBy("l_suppkey")
        ir.withColumn("tot", sum(col("rev")).over(w))
          .withColumn("n", count(lit(1)).over(w))
          .filter(lit(2) * col("rev") * col("n") < col("tot"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("l_partkey"), col("rev").cast(DoubleType).as("rev"))
          .orderBy("s_name", "l_partkey")
      }),

    // DS q58 shape: balanced-channel items — parts whose revenue in EACH
    // return-flag channel (R/A/N) sits within ±10% of the part's
    // cross-channel average. The three per-channel series are CONDITIONAL
    // AGGREGATES of one lineitem pass (the naive form is three scans
    // unioned); the band test is integer-exact against the channel sum
    // (30*rev_i in [9*sum, 11*sum] encodes [0.9, 1.1]x of sum/3), so
    // membership is engine-independent.
    QE("q192_ds_balanced_channel", Some(s"""
      WITH pc AS (SELECT l_partkey,
          SUM(CASE WHEN l_returnflag = 'R'
                THEN ${Q.oRev("l_extendedprice", "l_discount")} ELSE 0 END) AS rev_r,
          SUM(CASE WHEN l_returnflag = 'A'
                THEN ${Q.oRev("l_extendedprice", "l_discount")} ELSE 0 END) AS rev_a,
          SUM(CASE WHEN l_returnflag = 'N'
                THEN ${Q.oRev("l_extendedprice", "l_discount")} ELSE 0 END) AS rev_n
        FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey, CAST(rev_r AS DOUBLE) AS rev_r,
             CAST(rev_a AS DOUBLE) AS rev_a, CAST(rev_n AS DOUBLE) AS rev_n
      FROM pc
      WHERE 30 * rev_r BETWEEN 9 * (rev_r + rev_a + rev_n) AND 11 * (rev_r + rev_a + rev_n)
        AND 30 * rev_a BETWEEN 9 * (rev_r + rev_a + rev_n) AND 11 * (rev_r + rev_a + rev_n)
        AND 30 * rev_n BETWEEN 9 * (rev_r + rev_a + rev_n) AND 11 * (rev_r + rev_a + rev_n)
      ORDER BY l_partkey"""),
      (s, d) => {
        def chan(f: String) = sum(when(col("l_returnflag") === f,
          Q.revenue(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0).cast(DecimalType(13, 4)))).as(s"rev_${f.toLowerCase}")
        val pc = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(chan("R"), chan("A"), chan("N"))
        val tot = col("rev_r") + col("rev_a") + col("rev_n")
        def inBand(c: Column) =
          (lit(30) * c >= lit(9) * tot) && (lit(30) * c <= lit(11) * tot)
        pc.filter(inBand(col("rev_r")) && inBand(col("rev_a")) && inBand(col("rev_n")))
          .select(col("l_partkey"), col("rev_r").cast(DoubleType).as("rev_r"),
            col("rev_a").cast(DoubleType).as("rev_a"),
            col("rev_n").cast(DoubleType).as("rev_n"))
          .orderBy("l_partkey")
      }),

    // DS q50/q62 shape: fulfilment-lag bucket matrix — days from order to
    // ship, bucketed (<=30 / 31-60 / 61-90 / >90), as four CONDITIONAL
    // COUNTS per supplier nation. The DS original formulates the buckets
    // as scalar CASE columns over a channel join; here the single
    // fact-fact join (lineitem x orders, the one unavoidable shuffle)
    // feeds one conditional aggregate, with supplier and nation broadcast.
    // Lag arithmetic is integer day-boundary counting in both engines —
    // no float anywhere.
    QE("q193_ds_ship_lag_matrix", Some("""
      SELECT n_name,
        CAST(SUM(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_0_30,
        CAST(SUM(CASE WHEN lag BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_31_60,
        CAST(SUM(CASE WHEN lag BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_61_90,
        CAST(SUM(CASE WHEN lag > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_90_plus
      FROM (SELECT l_suppkey,
              date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey) x
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
      (s, d) => {
        val lagged = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey"),
            datediff(col("l_shipdate"), col("o_orderdate")).as("lag"))
        def bucket(c: Column, name: String) =
          sum(when(c, 1).otherwise(0)).cast("long").as(name)
        lagged
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            bucket(col("lag") <= 30, "n_0_30"),
            bucket(col("lag") >= 31 && col("lag") <= 60, "n_31_60"),
            bucket(col("lag") >= 61 && col("lag") <= 90, "n_61_90"),
            bucket(col("lag") > 90, "n_90_plus"))
          .orderBy("n_name")
      }),

    // DS q40 shape: before/after pivot analysis — revenue per part brand
    // in the 30 days either side of a catalog-change date, from ONE
    // date-pruned scan (the pushed ±30-day filter prunes the fact read;
    // the before/after split is a conditional aggregate, not two scans).
    // Exact decimal revenue both sides.
    QE("q194_ds_before_after", Some(s"""
      SELECT p_brand,
        CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
              THEN ${Q.oRev("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE) AS rev_before,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
              THEN ${Q.oRev("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE) AS rev_after
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00' - INTERVAL 30 DAY
        AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00' + INTERVAL 30 DAY
      GROUP BY p_brand ORDER BY p_brand"""),
      (s, d) => {
        val pivot = lit("1996-06-01").cast(TimestampType)
        def side(c: Column, name: String) =
          sum(when(c, Q.revenue(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0).cast(DecimalType(13, 4))))
            .cast(DoubleType).as(name)
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= pivot - expr("INTERVAL 30 DAYS") &&
            col("l_shipdate") < pivot + expr("INTERVAL 30 DAYS"))
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(side(col("l_shipdate") < pivot, "rev_before"),
            side(col("l_shipdate") >= pivot, "rev_after"))
          .orderBy("p_brand")
      }),

    // DS q98/q12 shape: revenue share WITHIN CATEGORY — each part's share
    // of its p_type's revenue, as a window-sum over the per-part AGGREGATE
    // (the fact is reduced to part grain first; the category total then
    // costs a window over parts, never a second fact pass). The share
    // division runs on exact decimal sums cast to double with identical
    // op order in both engines — bit-exact, no rounding.
    QE("q198_ds_category_share", Some(s"""
      WITH pr AS (SELECT l_partkey,
                    SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS rev
                  FROM lineitem GROUP BY l_partkey)
      SELECT p_type, p_partkey, CAST(rev AS DOUBLE) AS rev,
             CAST(CAST(rev AS DOUBLE) /
                  CAST(SUM(rev) OVER (PARTITION BY p_type) AS DOUBLE) AS DOUBLE) AS share
      FROM pr JOIN part ON l_partkey = p_partkey
      ORDER BY p_type, p_partkey"""),
      (s, d) => {
        val pr = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
        val w = Window.partitionBy("p_type")
        pr.join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .withColumn("share",
            (col("rev").cast(DoubleType) /
              sum(col("rev")).over(w).cast(DoubleType)).cast(DoubleType))
          .select(col("p_type"), col("p_partkey"),
            col("rev").cast(DoubleType).as("rev"), col("share"))
          .orderBy("p_type", "p_partkey")
      }),

    // Hierarchical share-of-parent report: ONE rollup pass produces the
    // nation, region, and global revenue levels, and two windows
    // partitioned by grouping level attribute each nation its share of
    // its region and each region its share of global — the classic OLAP
    // drill report without re-aggregating per level. GROUPING() selects
    // levels; windows see only the tiny rollup output (O(nations) rows),
    // never facts. Shares divide exact decimal sums in double, same op
    // order both engines.
    QE("q199_ds_rollup_share", Some("""
      WITH f AS (SELECT r_name, n_name,
                   CAST(c_acctbal AS DECIMAL(12,2)) AS bal
                 FROM customer
                 JOIN nation ON c_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey),
      roll AS (SELECT r_name, n_name,
                 CASE WHEN r_name IS NULL THEN 2
                      WHEN n_name IS NULL THEN 1 ELSE 0 END AS lvl,
                 SUM(bal) AS bal
               FROM f GROUP BY ROLLUP (r_name, n_name)),
      shares AS (SELECT r_name, n_name, lvl, bal,
                   CAST(CAST(bal AS DOUBLE) /
                        CAST(SUM(CASE WHEN lvl = 1 THEN bal END)
                             OVER (PARTITION BY r_name) AS DOUBLE) AS DOUBLE) AS share_of_region,
                   CAST(CAST(bal AS DOUBLE) /
                        CAST(SUM(CASE WHEN lvl = 2 THEN bal END)
                             OVER () AS DOUBLE) AS DOUBLE) AS share_of_global
                 FROM roll)
      SELECT lvl, r_name, n_name, CAST(bal AS DOUBLE) AS bal,
             CASE WHEN lvl = 0 THEN share_of_region END AS share_of_region,
             CASE WHEN lvl = 1 THEN share_of_global END AS share_of_global
      FROM shares
      ORDER BY lvl, r_name NULLS FIRST, n_name NULLS FIRST"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          WITH f AS (SELECT r_name, n_name,
                       CAST(c_acctbal AS DECIMAL(12,2)) AS bal
                     FROM customer
                     JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey),
          roll AS (SELECT r_name, n_name,
                     CASE WHEN r_name IS NULL THEN 2
                          WHEN n_name IS NULL THEN 1 ELSE 0 END AS lvl,
                     SUM(bal) AS bal
                   FROM f GROUP BY ROLLUP (r_name, n_name)),
          shares AS (SELECT r_name, n_name, lvl, bal,
                       CAST(CAST(bal AS DOUBLE) /
                            CAST(SUM(CASE WHEN lvl = 1 THEN bal END)
                                 OVER (PARTITION BY r_name) AS DOUBLE) AS DOUBLE) AS share_of_region,
                       CAST(CAST(bal AS DOUBLE) /
                            CAST(SUM(CASE WHEN lvl = 2 THEN bal END)
                                 OVER () AS DOUBLE) AS DOUBLE) AS share_of_global
                     FROM roll)
          SELECT lvl, r_name, n_name, CAST(bal AS DOUBLE) AS bal,
                 CASE WHEN lvl = 0 THEN share_of_region END AS share_of_region,
                 CASE WHEN lvl = 1 THEN share_of_global END AS share_of_global
          FROM shares
          ORDER BY lvl, r_name NULLS FIRST, n_name NULLS FIRST""")
      }),

    // DS q23 shape: double-gated revenue — lineitems restricted to
    // FREQUENT parts (sold in > 20 orders) AND BEST customers (lifetime
    // spend > half the max customer spend). Each gate is an aggregate of
    // its own dimension-grain rollup; both gate sets BROADCAST into one
    // final fact pass (the DS original re-scans the fact per CTE). The
    // spend gate is integer-exact (2*spend > max-spend over exact decimal
    // sums), so gate membership is engine-identical.
    QE("q203_ds_frequent_best", Some(s"""
      WITH freq AS (SELECT l_partkey FROM lineitem
                    GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) > 20),
      spend AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sp
                FROM orders GROUP BY o_custkey),
      best AS (SELECT o_custkey FROM spend
               WHERE 2 * sp > (SELECT MAX(sp) FROM spend)),
      gated AS (SELECT l_orderkey, l_partkey, l_extendedprice, l_discount
                FROM lineitem JOIN freq USING (l_partkey)),
      fact AS (SELECT c_mktsegment, ${Q.oRev("l_extendedprice", "l_discount")} AS rev
               FROM gated
               JOIN orders ON l_orderkey = o_orderkey
               JOIN best USING (o_custkey)
               JOIN customer ON o_custkey = c_custkey)
      SELECT c_mktsegment, CAST(SUM(rev) AS DOUBLE) AS revenue
      FROM fact GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) => {
        val freq = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(countDistinct(col("l_orderkey")).as("n_ord"))
          .filter(col("n_ord") > 20).select("l_partkey")
        val spend = t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast(Q.dec)).as("sp"))
        val best = spend
          .join(broadcast(spend.agg(max(col("sp")).as("mx"))))
          .filter(lit(2) * col("sp") > col("mx"))
          .select("o_custkey")
        t(s, d, "lineitem")
          .join(broadcast(freq), "l_partkey")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(best), "o_custkey")
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount")))
            .as("revenue"))
          .orderBy("c_mktsegment")
      }),

    // TPC-DS q88 shape: one report row of counts over N disjoint time
    // bands. The NAIVE formulation (what q88's SQL literally says, and what
    // the oracle runs) is N independent scalar-subquery scans of the fact
    // table; the 100 TB plan is ONE scan with conditional aggregation —
    // identical semantics because the bands partition the rows. N× less I/O
    // at any scale; the count(when) form stays inside whole-stage codegen.
    QE("q214_ds_timeband_report", Some("""
      SELECT
        (SELECT COUNT(*) FROM events
          WHERE EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) < 6) AS h0_5,
        (SELECT COUNT(*) FROM events
          WHERE EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) BETWEEN 6 AND 11) AS h6_11,
        (SELECT COUNT(*) FROM events
          WHERE EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) BETWEEN 12 AND 17) AS h12_17,
        (SELECT COUNT(*) FROM events
          WHERE EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) >= 18) AS h18_23"""),
      (s, d) => {
        val h = hour(col("ts"))
        t(s, d, "events").agg(
          count(when(h < 6, 1)).as("h0_5"),
          count(when(h.between(6, 11), 1)).as("h6_11"),
          count(when(h.between(12, 17), 1)).as("h12_17"),
          count(when(h >= 18, 1)).as("h18_23"))
      }))
}
