package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join surface: all join types the reference parser exposes
  * (AstBuilder.scala:945-976, grammar SqlBase.g4:598-616), re-expressed with
  * the DataFrame API. Dimension tables (region/nation/customer/supplier) are
  * explicitly broadcast — at 100 TB the fact side (lineitem/orders) must
  * never shuffle against a dimension that fits in memory.
  */
object Joins {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** Scope the AQE skew-join knobs to a block: broadcast disabled so the
    * tiny weight table can't dodge the shuffle, detection thresholds scaled
    * to the test SFs (production keeps the 256 MB default — the SHAPE of
    * the plan transformation is what's pinned here, and it's size-relative).
    * Values are restored afterwards so no other entry inherits them.
    */
  private[graft] def withSkewJoinConfs[T](s: SparkSession)(f: => T): T = {
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      // the narrow (sk, l_quantity) rows compress hard — the sf0.001 hot
      // partition is only a few KB on the shuffle wire, so detection and
      // split sizes sit at 2KB; coalescing is off so the tiny non-hot
      // partitions don't get merged into the comparison baseline
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
    scoped.foreach { case (k, v) => s.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The deliberately-skewed join q243 materializes: ~75% of lineitem maps
    * to one key (sk=0), the rest spreads over 97 keys; the 99-row weight
    * side must sort-merge (broadcast disabled), so the sk=0 shuffle
    * partition dwarfs the median and AQE's OptimizeSkewedJoin splits it
    * into advisory-sized reads. The aggregate groups by the DIM-side
    * attribute (w), not the join key: grouping by sk would let the final
    * agg reuse the join's hash partitioning, and AQE refuses to split a
    * skewed partition whose partitioning a downstream stage still needs
    * (verified — the split only fires once the agg forces its own
    * exchange). Complements p14's MANUAL salting: same skew problem,
    * runtime re-plan instead of a rewritten key.
    */
  private[graft] def aqeSkewJoinPlan(s: SparkSession, d: String): DataFrame = {
    // the payload column is what a real fact row carries through the
    // shuffle; it is all-integer text (doubles format differently across
    // engines) and per-row unique, so compression can't shrink the hot
    // partition below the detection threshold. The aggregate consumes it
    // (sum of lengths), so column pruning cannot strip it.
    val payload = concat_ws("#",
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"))
    // AQE splits a skewed reduce partition along MAPPER boundaries, so the
    // map stage must have several tasks to split between. The test parquet
    // is one small file = one row group = ONE scan task (verified:
    // skew=true never appears over it, however low the thresholds), so the
    // round-robin repartition stands in for the thousands-of-mappers scan
    // a 100 TB fact table has naturally — on a real deployment it is
    // unnecessary and would be dropped.
    val l = t(s, d, "lineitem").select(
      when(col("l_orderkey") % 4 < 3, lit(0L))
        .otherwise(col("l_orderkey") % 97 + 1).as("sk"),
      col("l_quantity"), repeat(payload, 3).as("payload"))
      .repartition(16)
    val r = s.range(0, 99).select(col("id").as("rk"), (col("id") % 7 + 1).as("w"))
    l.join(r, col("sk") === col("rk"))
      .groupBy("w")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(Q.dec) * col("w")).cast(DoubleType).as("wsum"),
        sum(length(col("payload"))).cast(LongType).as("plen"))
      .orderBy("w")
  }

  val entries: Seq[QE] = Seq(
    // AQE SKEW JOIN: runtime mitigation for the key-skew that kills big
    // joins at 100 TB. AQE reads detection thresholds at EXECUTION time, so
    // the entry materializes under the scoped confs and returns the small
    // aggregate locally; PlanLeversSuite asserts the final adaptive plan
    // really ran the join with skew=true splits.
    QE("q243_aqe_skew_join", Some("""
      WITH l AS (SELECT CASE WHEN l_orderkey % 4 < 3 THEN 0
                             ELSE l_orderkey % 97 + 1 END AS sk,
                        l_quantity,
                        repeat(concat_ws('#', l_orderkey, l_partkey, l_suppkey,
                                         l_linenumber), 3) AS payload
                 FROM lineitem),
      r AS (SELECT unnest(generate_series(0, 98)) AS rk),
      r2 AS (SELECT rk, rk % 7 + 1 AS w FROM r)
      SELECT w, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * w) AS DOUBLE) AS wsum,
             CAST(SUM(LENGTH(payload)) AS BIGINT) AS plen
      FROM l JOIN r2 ON l.sk = r2.rk
      GROUP BY w ORDER BY w"""),
      (s, d) => withSkewJoinConfs(s) {
        val out = aqeSkewJoinPlan(s, d)
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
          .orderBy("w")
      }),

    // TPC-H Q5 shape: 5-way inner join, dims broadcast, agg on nation.
    QE("q10_join_5way", Some(s"""
      SELECT n_name, ${Q.oSumRev("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1999-01-01").cast(TimestampType)),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))),

    // LEFT OUTER join keeping customers with zero orders (Q13 shape).
    QE("q11_join_left", Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS spend
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus = 'F'
      GROUP BY c_custkey ORDER BY c_custkey"""),
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(Q.dec)), lit(0)).cast(DoubleType).as("spend"))
        .orderBy("c_custkey")),

    // RIGHT OUTER join (mirror of left; exercises the right-side planner path).
    QE("q12_join_right", Some("""
      SELECT c_custkey, c_name, o_orderkey
      FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
      RIGHT JOIN customer ON o_custkey = c_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST"""),
      (s, d) => t(s, d, "orders").filter(col("o_totalprice") > 450000)
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select("c_custkey", "c_name", "o_orderkey")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),

    // FULL OUTER join over two disjointly-filtered sides.
    QE("q13_join_full", Some("""
      SELECT f.o_orderkey AS f_key, o.o_orderkey AS o_key
      FROM (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_orderkey < 200) f
      FULL JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' AND o_orderkey < 200) o
        ON f.o_orderkey = o.o_orderkey
      ORDER BY f_key NULLS LAST, o_key NULLS LAST"""),
      (s, d) => {
        val o = t(s, d, "orders")
        val f = o.filter(col("o_orderstatus") === "F" && col("o_orderkey") < 200)
          .select(col("o_orderkey").as("f_key"))
        val oo = o.filter(col("o_orderstatus") === "O" && col("o_orderkey") < 200)
          .select(col("o_orderkey").as("o_key"))
        f.join(oo, col("f_key") === col("o_key"), "full_outer")
          .orderBy(col("f_key").asc_nulls_last, col("o_key").asc_nulls_last)
      }),

    // LEFT SEMI join (EXISTS shape).
    QE("q14_join_semi", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""),
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // LEFT ANTI join (NOT EXISTS shape). The anti side is the filtered
    // orders set (no big order), not all orders: every gate-SF customer
    // has SOME order, so the unfiltered anti join returned 0 rows and the
    // gate was vacuously green (round-9 verdict note) — the filter makes
    // the gate prove rows actually survive the anti join.
    QE("q15_join_anti", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey"""),
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // CROSS join of the two tiny dims (both sides broadcast-sized).
    QE("q16_join_cross", Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name"""),
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    // USING join (shared column name folded to one output column).
    QE("q17_join_using", Some("""
      SELECT custkey, c_name, COUNT(*) AS n
      FROM (SELECT c_custkey AS custkey, c_name FROM customer)
      JOIN (SELECT o_custkey AS custkey FROM orders) USING (custkey)
      GROUP BY custkey, c_name ORDER BY custkey"""),
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey").as("custkey"), col("c_name"))
        .join(t(s, d, "orders").select(col("o_custkey").as("custkey")), Seq("custkey"))
        .groupBy("custkey", "c_name").agg(count(lit(1)).as("n"))
        .orderBy("custkey")),

    // Theta join: equi key + non-equi residual (supplier richer than customer
    // in the same nation). Small side broadcast.
    QE("q18_join_theta", Some("""
      SELECT s_suppkey, c_custkey FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      WHERE c_custkey < 300
      ORDER BY s_suppkey, c_custkey"""),
      (s, d) => broadcast(t(s, d, "supplier"))
        .join(t(s, d, "customer").filter(col("c_custkey") < 300),
          col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")),

    // Broadcast join hint via SQL-text hint syntax (reference AB:871-882).
    QE("q19_join_hint", Some("""
      SELECT n_name, COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT /*+ BROADCAST(nation) */ n_name, COUNT(*) AS n_cust
                 FROM customer JOIN nation ON c_nationkey = n_nationkey
                 GROUP BY n_name ORDER BY n_name""")
      }),

    // Null-safe equality (<=>) as the JOIN KEY, not just a predicate: the
    // NULL bucket on each side must match itself (plain = would drop it).
    // Spark treats EqualNullSafe as a genuine equi-join key — hash
    // partitionable, so this plans as a hash join, never a nested loop;
    // DuckDB spells it IS NOT DISTINCT FROM.
    QE("q179_nullsafe_join", Some("""
      WITH a AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k, COUNT(*) AS n_a
                 FROM orders GROUP BY 1),
      b AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_b
            FROM orders GROUP BY 1)
      SELECT a.k, n_a, total_b
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      ORDER BY a.k NULLS FIRST"""),
      (s, d) => {
        val key = nullif(col("o_orderpriority"), lit("3-MEDIUM"))
        val a = t(s, d, "orders").groupBy(key.as("k"))
          .agg(count(lit(1)).as("n_a"))
        val b = t(s, d, "orders").groupBy(key.as("kb"))
          .agg(Q.dsum(col("o_totalprice")).as("total_b"))
        a.join(b, col("k") <=> col("kb"))
          .select(col("k"), col("n_a"), col("total_b"))
          .orderBy(col("k").asc_nulls_first)
      }))
}
