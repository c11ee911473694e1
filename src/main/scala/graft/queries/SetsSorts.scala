package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sort / limit / top-k / sampling / set operations (reference sites
  * AstBuilder.scala:523-562,783-808,987-1038,1892-1913). Top-k goes through
  * Spark's TakeOrderedAndProject (no global sort materialization); set ops
  * are shuffle-partitioned on the full row.
  */
object SetsSorts {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // Top-k: ORDER BY ... LIMIT -> TakeOrderedAndProject.
    QE("q40_topk", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""),
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    // Multi-key mixed-direction sort with NULLS placement.
    QE("q41_sort_multi", Some("""
      SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
      ORDER BY s_nationkey DESC, s_acctbal ASC NULLS LAST, s_suppkey"""),
      (s, d) => t(s, d, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(col("s_nationkey").desc, col("s_acctbal").asc_nulls_last, col("s_suppkey"))),

    // DISTRIBUTE BY + SORT BY (repartition + per-partition sort), then a
    // global ORDER BY so the verified output is deterministic.
    QE("q42_distribute_sort", Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber FROM lineitem
      WHERE l_quantity > 48 ORDER BY l_suppkey, l_orderkey, l_linenumber"""),
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 48)
        .repartition(col("l_suppkey"))
        .sortWithinPartitions("l_suppkey", "l_orderkey")
        .select("l_suppkey", "l_orderkey", "l_linenumber")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")),

    // TABLESAMPLE — the sampled ROWS are engine-specific randomness no
    // second engine reproduces, but the sample's CONTRACT is checkable:
    // the entry runs the seeded 10% Bernoulli sample, then emits its
    // oracle-verifiable invariants — the sample is a subset of the source
    // (zero fabricated keys via anti-join) and the sampled fraction lands
    // inside [7%, 13%] (±3σ at sf0.001's ~6k rows is under ±1.2%, so the
    // bound is generous yet seed-stable). The oracle emits the same
    // constants; a hash match proves both invariants held.
    QE("q43_tablesample", Some(
      "SELECT TRUE AS subset_ok, TRUE AS fraction_ok"),
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sampled = li.sample(withReplacement = false, 0.1, seed = 42)
          .select("l_orderkey", "l_linenumber")
        val fabricated = sampled.join(
          li.select("l_orderkey", "l_linenumber"),
          Seq("l_orderkey", "l_linenumber"), "left_anti")
        sampled.agg(count(lit(1)).as("n"))
          .crossJoin(li.agg(count(lit(1)).as("total")))
          .crossJoin(fabricated.agg(count(lit(1)).as("bad")))
          .select((col("bad") === 0).as("subset_ok"),
            (col("n") >= col("total") * 0.07 && col("n") <= col("total") * 0.13)
              .as("fraction_ok"))
      }),

    // SELECT DISTINCT projection.
    QE("q44_distinct", Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""),
      (s, d) => t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // UNION ALL of two disjoint projections.
    QE("q50_union_all", Some("""
      SELECT o_orderkey AS k, 'hi' AS src FROM orders WHERE o_totalprice > 400000
      UNION ALL
      SELECT o_orderkey AS k, 'lo' AS src FROM orders WHERE o_totalprice < 2000
      ORDER BY k, src"""),
      (s, d) => {
        val o = t(s, d, "orders")
        o.filter(col("o_totalprice") > 400000).select(col("o_orderkey").as("k"), lit("hi").as("src"))
          .unionAll(o.filter(col("o_totalprice") < 2000).select(col("o_orderkey").as("k"), lit("lo").as("src")))
          .orderBy("k", "src")
      }),

    // UNION DISTINCT (dedups across the two branches).
    QE("q51_union_distinct", Some("""
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
      UNION
      SELECT s_nationkey AS nk FROM supplier
      ORDER BY nk"""),
      (s, d) => t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")),

    // INTERSECT (distinct) and INTERSECT ALL.
    QE("q52_intersect", Some("""
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      INTERSECT
      SELECT s_nationkey AS nk FROM supplier
      ORDER BY nk"""),
      (s, d) => t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    QE("q53_intersect_all", Some("""
      SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
      INTERSECT ALL
      SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
      ORDER BY k"""),
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.filter(col("l_quantity") > 49).select(col("l_suppkey").as("k"))
          .intersectAll(l.filter(col("l_discount") > 0.09).select(col("l_suppkey").as("k")))
          .orderBy("k")
      }),

    // EXCEPT (distinct) and EXCEPT ALL. Both right sides are FILTERED so a
    // known non-empty difference survives at every SF — at the gate SF the
    // unfiltered sets coincided and both entries returned 0 rows, which an
    // always-empty EXCEPT would also have "passed" (round-9 verdict note).
    QE("q54_except", Some("""
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey AS nk FROM supplier WHERE s_nationkey < 20
      ORDER BY nk"""),
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, d, "supplier").filter(col("s_nationkey") < 20)
          .select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    QE("q55_except_all", Some("""
      SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
      EXCEPT ALL
      SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09 AND l_quantity > 40
      ORDER BY k"""),
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.filter(col("l_quantity") > 49).select(col("l_suppkey").as("k"))
          .exceptAll(l.filter(col("l_discount") > 0.09 && col("l_quantity") > 40)
            .select(col("l_suppkey").as("k")))
          .orderBy("k")
      }))
}
