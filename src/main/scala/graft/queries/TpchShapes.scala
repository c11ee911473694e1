package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classic TPC-H query shapes adapted to the driver schema — multi-join +
  * aggregate + top-k workloads that exercise the optimizer end-to-end
  * (join reorder, broadcast selection, partial aggregation, top-k via
  * TakeOrderedAndProject).
  */
object TpchShapes {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // Q3 shape: shipping priority — segment filter, date-bracketed 3-way
    // join, revenue agg, top 10.
    QE("q100_tpch_q3", Some(s"""
      SELECT l_orderkey, ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue,
             o_orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""),
      (s, d) => broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1999-03-15").cast(TimestampType)),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1997-03-15").cast(TimestampType)),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)),

    // Q4 shape: order priority checking — EXISTS semi-join + count by
    // priority.
    QE("q101_tpch_q4", Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT o_orderpriority, COUNT(*) AS order_count
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
            AND EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }),

    // Q10 shape: returned-item reporting — 4-way join, revenue per customer,
    // top 20.
    QE("q102_tpch_q10", Some(s"""
      SELECT c_custkey, c_name, ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue,
             n_name
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // Q18 shape: large-volume customers — HAVING-filtered subquery feeding
    // an IN, then 3-way join + group.
    QE("q103_tpch_q18", Some(s"""
      SELECT c_custkey, o_orderkey, o_totalprice, ${Q.oSum("l_quantity")} AS total_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120)
      GROUP BY c_custkey, o_orderkey, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"""),
      (s, d) => {
        // One pass over lineitem: the per-order quantity sum IS both the
        // HAVING predicate and the output measure (grouping the final join
        // by (c_custkey, o_orderkey, o_totalprice) is grouping by order —
        // each order has exactly one customer row). The SQL IN form scans
        // and shuffles lineitem twice and joins customer against ALL orders
        // before the selective filter; this plan aggregates lineitem once,
        // broadcasts the tiny qualifying set into orders, and only then
        // touches customer — no unfiltered fact-fact shuffle anywhere, the
        // shape that survives 100×.
        val bigOrderQty = t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast(Q.dec)).as("_q"))
          .filter(col("_q") > 120)
          .select(col("l_orderkey").as("_bok"),
            col("_q").cast(DoubleType).as("total_qty"))
        t(s, d, "orders")
          .join(broadcast(bigOrderQty), col("o_orderkey") === col("_bok"))
          .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "o_orderkey", "o_totalprice", "total_qty")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(50)
      }),

    // Q5 shape: local supplier volume — 6-table join where every dimension
    // (region -> nation -> supplier) broadcasts and the only fact-fact
    // shuffle is orders-lineitem on the order key. The s_nationkey =
    // c_nationkey co-location predicate rides the supplier broadcast join
    // as a residual, so it costs nothing extra.
    QE("q104_tpch_q5", Some(s"""
      SELECT n_name, ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      (s, d) => {
        val nations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
        val cust = t(s, d, "customer")
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy("n_name")
          .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    // Q21 shape: suppliers who were the sole late shipper in multi-supplier
    // orders — the classic EXISTS + NOT EXISTS double correlation. Left to
    // Catalyst on purpose (the decorrelation into two aggregated semi/anti
    // joins IS the thing this entry exercises); lateness adapted to the
    // driver schema (no receipt/commit dates) as shipping >60 days after
    // the order date.
    QE("q105_tpch_q21", Some("""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT s_name, COUNT(*) AS numwait
          FROM supplier
          JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
          WHERE o_orderstatus = 'F'
            AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
            AND EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)
          GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
      }),

    // ----- TPC-H completion tranche: every remaining TPC-H query whose
    // shape the driver schema can express. Q2/Q11 need partsupp (absent),
    // Q12 needs l_shipmode, Q22's cntrycode needs c_phone — those three
    // adapt the predicate to an available column with the SHAPE intact
    // (multi-dim correlated min, conditional fact split, global-avg-gated
    // anti-join census). Q6 is covered by q03_forecast_revenue. -----

    // Q7: volume shipping between two trading blocs, both directions, by
    // year (regions rather than single nations so the pair carries volume
    // at every test SF; a directed nation pair at sf0.001 is ~10 rows and
    // can be empty). Supplier/customer sides each ride a broadcast
    // nation⋈region dim chain; the direction disjunction evaluates after
    // both joins on dim columns only, so the fact tables shuffle once
    // each for the l⋈o⋈c chain.
    QE("q148_tpch_q7", Some(s"""
      SELECT supp_region, cust_region, yr, CAST(SUM(vol) AS DOUBLE) AS revenue
      FROM (SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
                   ${Q.oRev("l_extendedprice", "l_discount")} AS vol
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE (r1.r_name = 'AMERICA' AND r2.r_name = 'ASIA')
               OR (r1.r_name = 'ASIA' AND r2.r_name = 'AMERICA'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      (s, d) => {
        def bloc(nk: String, out: String) = t(s, d, "nation")
          .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as(nk), col("r_name").as(out))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .join(broadcast(bloc("nk1", "supp_region")), col("s_nationkey") === col("nk1"))
          .join(broadcast(bloc("nk2", "cust_region")), col("c_nationkey") === col("nk2"))
          .filter((col("supp_region") === "AMERICA" && col("cust_region") === "ASIA") ||
            (col("supp_region") === "ASIA" && col("cust_region") === "AMERICA"))
          .groupBy(col("supp_region"), col("cust_region"),
            year(col("l_shipdate")).as("yr"))
          .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
          .orderBy("supp_region", "cust_region", "yr")
      }),

    // Q8: national market share inside a region — a ratio of two
    // conditional sums over ONE joined fact pass (numerator = supplier
    // nation of interest, denominator = all) rather than two scans. All
    // five dims broadcast; SUM(CASE WHEN..THEN vol END) uses null-skipping
    // sums so no ELSE-branch type coercion is needed on either engine.
    QE("q149_tpch_q8", Some(s"""
      SELECT yr,
             CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol END) AS DOUBLE)
               / CAST(SUM(vol) AS DOUBLE) AS mkt_share
      FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
                   n2.n_name AS nation,
                   ${Q.oRev("l_extendedprice", "l_discount")} AS vol
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'STANDARD')
      GROUP BY yr ORDER BY yr"""),
      (s, d) => {
        val n1 = t(s, d, "nation")
          .select(col("n_nationkey").as("nk1"), col("n_regionkey").as("rk1"))
        val n2 = t(s, d, "nation")
          .select(col("n_nationkey").as("nk2"), col("n_name").as("nation"))
        val vol = Q.revenue(col("l_extendedprice"), col("l_discount"))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").filter(col("p_type") === "STANDARD")),
            col("p_partkey") === col("l_partkey"))
          .join(broadcast(t(s, d, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("nk1"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("rk1") === col("r_regionkey"))
          .join(broadcast(n2), col("s_nationkey") === col("nk2"))
          .groupBy(year(col("o_orderdate")).as("yr"))
          .agg((sum(when(col("nation") === "NATION_3", vol)).cast(DoubleType) /
            sum(vol).cast(DoubleType)).as("mkt_share"))
          .orderBy("yr")
      }),

    // Q9: product profit by nation and year. The schema has no partsupp,
    // so supply cost proxies as p_retailprice * quantity — the SHAPE (two
    // exact scale-4 decimal products subtracted per fact row, summed per
    // (nation, year)) is Q9's. One fact pass, three broadcast dims, one
    // orders shuffle join.
    QE("q150_tpch_q9", Some(s"""
      SELECT nation, yr, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (SELECT n_name AS nation,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
                   ${Q.oRev("l_extendedprice", "l_discount")}
                     - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey)
      GROUP BY 1, 2 ORDER BY nation, yr DESC"""),
      (s, d) => {
        val amount = Q.revenue(col("l_extendedprice"), col("l_discount")) -
          col("p_retailprice").cast(Q.dec) * col("l_quantity").cast(Q.dec)
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")), col("p_partkey") === col("l_partkey"))
          .join(broadcast(t(s, d, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("yr"))
          .agg(sum(amount).cast(DoubleType).as("sum_profit"))
          .orderBy(col("nation"), col("yr").desc)
      }),

    // Q13: customer order-count distribution INCLUDING zero-order
    // customers — the left outer join is the load-bearing construct
    // (an inner join silently drops the c_count=0 bucket). The join
    // residual (priority filter) lives in the ON clause so non-matching
    // customers still survive with nulls; COUNT(o_orderkey) counts only
    // matches. Two cascaded aggs: custkey shuffle, then the tiny
    // count-of-counts.
    QE("q151_tpch_q13", Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      }),

    // Q14: promo revenue share — numerator and denominator from ONE
    // month-bracketed scan via a null-skipping conditional sum; part dim
    // broadcast. Final expression ((100 * num) / den) keeps the identical
    // IEEE op order on both engines.
    QE("q152_tpch_q14", Some(s"""
      SELECT CAST(100.0 AS DOUBLE)
               * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN ${Q.oRev("l_extendedprice", "l_discount")} END) AS DOUBLE)
               / CAST(SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS DOUBLE) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""),
      (s, d) => {
        val rev = Q.revenue(col("l_extendedprice"), col("l_discount"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-10-01").cast(TimestampType))
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", rev)).cast(DoubleType) /
            sum(rev).cast(DoubleType)).as("promo_revenue"))
      }),

    // Q15: top supplier by quarterly revenue. The original's CREATE VIEW +
    // scalar-subquery MAX re-reads the view; here the max rides an
    // unpartitioned window over the per-supplier AGGREGATE (|suppliers|
    // rows — the q137 pattern), so revenue is computed exactly once and
    // the comparison is exact decimal = decimal, no double boundary risk.
    QE("q153_tpch_q15", Some(s"""
      WITH rev AS (
        SELECT l_suppkey AS supplier_no, SUM(${Q.oRev("l_extendedprice", "l_discount")}) AS total
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
      FROM supplier JOIN rev ON s_suppkey = supplier_no
      WHERE total = (SELECT MAX(total) FROM rev)
      ORDER BY s_suppkey"""),
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("total"))
        val top = rev
          .withColumn("_mx", max(col("total")).over(Window.partitionBy()))
          .filter(col("total") === col("_mx"))
        broadcast(t(s, d, "supplier"))
          .join(top, col("s_suppkey") === col("supplier_no"))
          .select(col("s_suppkey"), col("s_name"),
            col("total").cast(DoubleType).as("total_revenue"))
          .orderBy("s_suppkey")
      }),

    // Q16: supplier census per part attribute triple, excluding a
    // NOT IN supplier set (negative balance stands in for the original's
    // complaints filter — the null-aware anti-join is the shape). The
    // anti-join side is tiny and broadcasts; COUNT(DISTINCT l_suppkey)
    // expands to a two-phase distinct aggregate, never a driver collect.
    QE("q154_tpch_q16", Some("""
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
      (s, d) => {
        val p = t(s, d, "part").filter(col("p_brand") =!= "Brand#1" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
        val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        t(s, d, "lineitem")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      }),

    // Q17: small-quantity-order revenue for one brand. The correlated
    // per-part average decorrelates to a window over the brand-restricted
    // fact rows — value-identical to the original's whole-table average
    // (the brand filter restricts PARTS; every lineitem of a surviving
    // part is still present) but it never aggregates the 99% of parts the
    // filter throws away, and the fact side is scanned once. avg as exact
    // decimal sum / count in double; 0.2 * avg is one IEEE multiply.
    QE("q155_tpch_q17", Some(s"""
      WITH pa AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13' GROUP BY 1)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem JOIN pa ON pk = l_partkey
      WHERE l_quantity < 0.2 * avg_qty"""),
      (s, d) => {
        val wp = Window.partitionBy("l_partkey")
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#13")),
            col("p_partkey") === col("l_partkey"))
          .withColumn("_avg_qty",
            sum(col("l_quantity").cast(Q.dec)).over(wp).cast(DoubleType) /
              count(lit(1)).over(wp))
          .filter(col("l_quantity") < lit(0.2) * col("_avg_qty"))
          .agg((sum(col("l_extendedprice").cast(Q.dec)).cast(DoubleType) / lit(7.0))
            .as("avg_yearly"))
      }),

    // Q19: three-way disjunctive predicate over joined attributes — the
    // optimizer-stress query: the OR of (brand, size, quantity) triplets
    // must still push the part-side conjuncts into the broadcast build
    // side and keep the join an equi-join on partkey (the naive reading
    // is a theta-join). CNF extraction gives the scan `p_size <= 15`-style
    // bounds for free.
    QE("q156_tpch_q19", Some(s"""
      SELECT ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""),
      (s, d) => {
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")), col("p_partkey") === col("l_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#20" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      }),

    // Q20: suppliers dominating a part's volume (no partsupp, so the
    // original's "stock exceeds half the shipped quantity" becomes
    // "supplier shipped >20% of the part's total" — the same correlated
    // threshold-over-aggregate shape). The share test is a window over
    // the per-(part, supplier) AGGREGATE; the supplier dim joins the
    // ~|qualifying suppliers| distinct set, and the nation filter is the
    // original's residual.
    QE("q157_tpch_q20", Some("""
      WITH sp AS (
        SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
        FROM lineitem GROUP BY 1, 2),
      dom AS (
        SELECT DISTINCT l_suppkey FROM (
          SELECT l_suppkey, q, SUM(q) OVER (PARTITION BY l_partkey) AS pq FROM sp)
        WHERE CAST(q AS DOUBLE) > 0.2 * CAST(pq AS DOUBLE))
      SELECT s_suppkey, s_name
      FROM supplier JOIN dom ON s_suppkey = l_suppkey
      WHERE s_nationkey < 10
      ORDER BY s_suppkey"""),
      (s, d) => {
        val sp = t(s, d, "lineitem")
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(col("l_quantity").cast(Q.dec)).as("q"))
        val dom = sp
          .withColumn("_pq", sum(col("q")).over(Window.partitionBy("l_partkey")))
          .filter(col("q").cast(DoubleType) > lit(0.2) * col("_pq").cast(DoubleType))
          .select("l_suppkey").distinct()
        broadcast(t(s, d, "supplier").filter(col("s_nationkey") < 10))
          .join(dom, col("s_suppkey") === col("l_suppkey"))
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      }),

    // Q22: dormant-customer census gated by the global average balance
    // (cntrycode proxies as c_nationkey — the schema has no c_phone; the
    // shape is the scalar-subquery gate + NOT EXISTS anti-join + census).
    // The global average is a broadcast 1-row aggregate cross-joined in
    // (never a correlated re-plan); the anti-join shuffles custkeys only.
    QE("q158_tpch_q22", Some("""
      WITH pos AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_acctbal > 0),
      avgbal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
        FROM pos)
      SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      FROM pos, avgbal
      WHERE c_acctbal > a
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY 1 ORDER BY 1"""),
      (s, d) => {
        val pos = t(s, d, "customer").filter(col("c_acctbal") > 0)
        val avgbal = pos.agg(
          (sum(col("c_acctbal").cast(Q.dec)).cast(DoubleType) / count(lit(1))).as("a"))
        pos.crossJoin(broadcast(avgbal))
          .filter(col("c_acctbal") > col("a"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntry"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast(Q.dec)).cast(DoubleType).as("totacctbal"))
          .orderBy("cntry")
      }),

    // TPC-H Q6 (forecasting revenue change): the battery's pure
    // scan-filter-aggregate — every predicate must reach the parquet
    // reader as PushedFilters and the whole query is one codegen'd pass,
    // no shuffle beyond the final partial-agg merge. Products of exact
    // 2-decimal values summed as decimal -> bit-exact oracle. (Q2/Q11 run
    // below over a derived spec-shaped partsupp — q244/q245.)
    QE("q223_tpch_q6", Some(s"""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(sum(col("l_extendedprice").cast(Q.dec) *
            col("l_discount").cast(Q.dec)).cast(DoubleType).as("revenue")))) ++
    partsuppEntries

  /** The driver data ships no partsupp table, which blocked TPC-H Q2/Q11.
    * Both now run over a spec-SHAPED partsupp derived deterministically
    * from part × supplier inside the query itself — the IDENTICAL CTE text
    * evaluates in Spark and DuckDB, so the queries stay fully
    * value-checked. Four suppliers per part (the TPC-H multiplicity);
    * supplycost is integer CENTS so every downstream SUM is exact
    * integer arithmetic (no double partition-order sensitivity). At scale
    * the derivation is a narrow projective fan-out of `part` (4× rows, no
    * shuffle) and the min-cost subquery reuses the same broadcastable
    * dims as the outer block.
    */
  private def PartsuppCte: String = """
      WITH partsupp AS (
        SELECT p_partkey AS ps_partkey,
               CAST((p_partkey * 13 + js.i * 29) % sc.s_cnt + 1 AS INT) AS ps_suppkey,
               CAST((p_partkey * 7 + js.i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
               CAST((p_partkey * 31 + js.i * 17) % 100000 + 1 AS BIGINT) AS ps_supplycost
        FROM part
        CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL
                    SELECT 2 UNION ALL SELECT 3) js
        CROSS JOIN (SELECT count(*) AS s_cnt FROM supplier) sc
      )"""

  // Q2: minimum-cost supplier — region-filtered 5-way join with the
  // correlated min-cost scalar subquery, top 100. 1:1 with the official
  // text modulo the driver schema's column subset (no p_mfgr/s_address/
  // s_phone/s_comment) and its value domains (p_size <= 5 stands in for
  // size+type — the sf0.001 smoke data has no part matching both,
  // r_name = 'EUROPE' as-is).
  private def Q2Sql: String = s"""$PartsuppCte
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
      FROM part, supplier, partsupp, nation, region
      WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        AND p_size <= 5
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND ps_supplycost = (
          SELECT min(ps2.ps_supplycost)
          FROM partsupp ps2, supplier s2, nation n2, region r2
          WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""

  // Q11: important stock identification — nation-filtered value per part
  // vs a global-fraction HAVING (the classic aggregate-vs-aggregate
  // scalar subquery). 1:1 with the official text (nation renamed to
  // NATION_8 — the one driver nation with suppliers at every SF incl.
  // the sf0.001 smoke data; fraction as specified 0.0001).
  private def Q11Sql: String = s"""$PartsuppCte
      SELECT ps_partkey, CAST(SUM(ps_supplycost * ps_availqty) AS BIGINT) AS value
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_8'
      GROUP BY ps_partkey
      HAVING SUM(ps_supplycost * ps_availqty) > (
        SELECT SUM(ps_supplycost * ps_availqty) * 0.0001
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_8')
      ORDER BY value DESC, ps_partkey"""

  // Q12: shipping modes and order priority — the lineitem/orders join with
  // the dual conditional-count aggregate. The driver schema ships no
  // l_shipmode/l_commitdate/l_receiptdate, so a CTE SHADOWING `lineitem`
  // derives them deterministically from the columns it does ship (shipmode
  // hashed over the 7 spec modes; commit/receipt as day offsets of
  // l_shipdate mirroring the spec's generation rule commit=order+[30,90],
  // receipt=ship+[1,30]). Inside the CTE the base table is `main.lineitem`
  // — the one spelling BOTH engines resolve under a same-named CTE (DuckDB
  // rejects the bare name as circular; Tables.views registers the matching
  // Spark-side qualified views). 1:1 with the official text otherwise,
  // modulo the date window (1996 — the driver's lineitem has no 1994 rows)
  // and exactness casts. At scale: the derivation is a narrow projective
  // pass (no extra shuffle); the join shuffles on orderkey with the
  // IN/date filters applied scan-side first.
  private def Q12Sql: String = """
      WITH lineitem AS (
        SELECT l_orderkey, l_linenumber, l_shipdate,
               CASE CAST((l_orderkey * 13 + l_linenumber * 7) % 7 AS INT)
                 WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
                 WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
                 ELSE 'FOB' END AS l_shipmode,
               l_shipdate + (CAST((l_orderkey * 19 + l_linenumber * 5) % 61 AS INT) - 30) * INTERVAL 1 DAY AS l_commitdate,
               l_shipdate + (CAST((l_orderkey * 23 + l_linenumber * 3) % 30 AS INT) + 1) * INTERVAL 1 DAY AS l_receiptdate
        FROM main.lineitem
      )
      SELECT l_shipmode,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipmode IN ('MAIL', 'SHIP')
        AND l_commitdate < l_receiptdate
        AND l_shipdate < l_commitdate
        AND l_receiptdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_receiptdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_shipmode
      ORDER BY l_shipmode"""

  // Q22: global sales opportunity — the anti-join over country codes with
  // the scalar-average HAVING-style filter. c_phone is derived in a CTE
  // shadowing `customer` (country code = c_nationkey + 10, the spec's own
  // phone rule, landing in the official query's code list); c_acctbal is
  // re-derived as integer CENTS so AVG is sum/count of exactly-represented
  // integers — bit-identical double division in both engines — and SUM is
  // exact integer arithmetic. Official-text deviations: the NOT EXISTS
  // subquery gains an o_orderdate >= 2000 predicate ("no recent orders" —
  // EVERY driver customer has orders, so the spec's no-orders set is empty
  // at all SFs), plus the cents domain and the HUGEINT-avoiding sum cast.
  private def Q22Sql: String = """
      WITH customer AS (
        SELECT c_custkey,
               CAST(c_nationkey + 10 AS VARCHAR(8)) || '-555-' || CAST(c_custkey % 10000 AS VARCHAR(8)) AS c_phone,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal
        FROM main.customer
      )
      SELECT cntrycode, COUNT(*) AS numcust, CAST(SUM(c_acctbal) AS BIGINT) AS totacctbal
      FROM (
        SELECT SUBSTRING(c_phone FROM 1 FOR 2) AS cntrycode, c_acctbal
        FROM customer
        WHERE SUBSTRING(c_phone FROM 1 FOR 2) IN ('13','31','23','29','30','18','17')
          AND c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer
            WHERE c_acctbal > 0.00
              AND SUBSTRING(c_phone FROM 1 FOR 2) IN ('13','31','23','29','30','18','17'))
          AND NOT EXISTS (
            SELECT * FROM orders
            WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      ) AS custsale
      GROUP BY cntrycode
      ORDER BY cntrycode"""

  private def partsuppEntries: Seq[QE] = Seq(
    QE("q244_tpch_q2", Some(Q2Sql),
      (s, d) => { Tables.views(s, d); s.sql(Q2Sql) }),
    QE("q245_tpch_q11", Some(Q11Sql),
      (s, d) => { Tables.views(s, d); s.sql(Q11Sql) }),
    QE("q246_tpch_q12", Some(Q12Sql),
      (s, d) => { Tables.views(s, d); s.sql(Q12Sql) }),
    QE("q247_tpch_q22", Some(Q22Sql),
      (s, d) => { Tables.views(s, d); s.sql(Q22Sql) }))
}
