package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs every SparkEntry operator at sf0.001: non-empty schema, successful
  * execution, and rows > 0 for the entries where the data guarantees output.
  */
class QueriesSmokeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Entries that may legitimately return zero rows at sf0.001.
  private val mayBeEmpty = Set(
    "q13_join_full", "q15_join_anti", "q20_group_having", "q54_except",
    "q55_except_all", "q60_in_subquery", "q84_pg_params", "p03_minhash_neardup",
    "p05_ngram_jaccard", "p15_embedding_neardup")

  SparkEntry.all.foreach { q =>
    test(q.name) {
      val df = q.fn(spark, TestSpark.sfDir)
      assert(df.schema.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
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
        "q96_asof_join", "q98_range_join", "p21_seq_packing")) {
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
}
