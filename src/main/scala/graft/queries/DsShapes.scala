package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
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
        s.sql(s"""
          SELECT r_name, n_name,
                 ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue,
                 CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
          ORDER BY lvl, r_name NULLS LAST, n_name NULLS LAST""")
      }))
}
