package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The injected range-join optimizer rule (graft.plans.RangeJoinRewrite):
  * a naive time-band theta join must become a binned equi-join with
  * identical results, and anything outside its narrow trigger — equi-keyed
  * joins, one-sided bands — must pass through untouched.
  */
class RangeJoinRewriteSuite extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val bandSql = """
    SELECT e.event_id, COUNT(*) AS n_nearby
    FROM events e JOIN events c
      ON c.event_type = 'click' AND e.event_type = 'error'
     AND c.ts >= e.ts - INTERVAL '5' MINUTE
     AND c.ts <= e.ts + INTERVAL '5' MINUTE
    GROUP BY e.event_id ORDER BY e.event_id"""

  private def withRule[A](f: => A): A = {
    val s = spark
    val prev = s.experimental.extraOptimizations
    if (!prev.contains(graft.plans.RangeJoinRewrite)) {
      s.experimental.extraOptimizations = prev :+ graft.plans.RangeJoinRewrite
    }
    try f finally s.experimental.extraOptimizations = prev
  }

  private def run(sql: String): (Seq[String], String) = {
    val df: DataFrame = spark.sql(sql)
    val rows = df.collect().map(_.toString).toSeq
    (rows, df.queryExecution.executedPlan.toString)
  }

  private def withoutRule[A](f: => A): A = {
    // q176's entry installs the rule session-wide when it runs earlier in
    // the same JVM — strip it so the naive baseline really is naive
    val s = spark
    val saved = s.experimental.extraOptimizations
    s.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.RangeJoinRewrite)
    try f finally s.experimental.extraOptimizations = saved
  }

  test("band theta join: nested loop without the rule, binned equi-join with it") {
    Tables.views(spark, TestSpark.sfDir)
    val (naiveRows, naivePlan) = withoutRule(run(bandSql))
    assert(naivePlan.contains("NestedLoop"),
      s"without the rule the band join must nest-loop (the problem being solved):\n$naivePlan")
    val (optRows, optPlan) = withRule(run(bandSql))
    assert(!optPlan.contains("NestedLoop") && !optPlan.contains("CartesianProduct"),
      s"rule must eliminate the nested loop:\n$optPlan")
    assert(optPlan.contains("Generate explode"),
      s"rule must plan the 2-bin explode:\n$optPlan")
    assert(optRows.nonEmpty && optRows == naiveRows,
      "binned rewrite must be result-identical to the naive join")
  }

  test("equi-keyed time-band join is left untouched") {
    Tables.views(spark, TestSpark.sfDir)
    val sql = """
      SELECT c.event_id AS click_id, e.event_id AS error_id
      FROM events c JOIN events e ON c.user_id = e.user_id
       AND c.event_type = 'click' AND e.event_type = 'error'
       AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL '1' HOUR
      ORDER BY click_id, error_id"""
    val (naiveRows, _) = run(sql)
    val (optRows, optPlan) = withRule(run(sql))
    assert(!optPlan.contains("__graft_bin"),
      s"a join with an equi key must not be binned:\n$optPlan")
    assert(optRows == naiveRows)
  }

  test("one-sided bound is left untouched") {
    Tables.views(spark, TestSpark.sfDir)
    val sql = """
      SELECT COUNT(*) AS n
      FROM events e JOIN events c
        ON c.event_type = 'click' AND e.event_type = 'error'
       AND c.ts >= e.ts - INTERVAL '5' MINUTE"""
    val (_, optPlan) = withRule(run(sql))
    assert(!optPlan.contains("__graft_bin"),
      s"a half-open range has unbounded bins per row — must not rewrite:\n$optPlan")
  }
}
