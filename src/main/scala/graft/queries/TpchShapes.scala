package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      }))
}
