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
}
