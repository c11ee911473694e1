package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join operator (graft.plans.AsOfJoinExec): plan shape
  * (custom node fed by co-partitioned exchanges), value equality with the
  * window formulation, null emission for match-less keys, determinism.
  */
class AsOfJoinSuite extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def asof() = {
    val ev = Tables.df(spark, TestSpark.sfDir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts")
    graft.plans.AsOf.join(spark, views, purchases,
      key = "user_id", ts = "ts", as = "last_purchase_ts")
      .orderBy("event_id")
  }

  test("plans the custom exec over co-partitioned sorted children") {
    val df = asof()
    df.collect()
    // AQE's string carries the initial plan after the final one — count in
    // the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), s"must plan the custom node:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 2,
      s"both sides must co-partition on the key:\n$plan")
    assert("Sort \\[user_id".r.findAllIn(plan).size == 2,
      s"both sides must sort (key, ts) per partition:\n$plan")
  }

  test("equals the union-tag window formulation on every row") {
    val native = asof().collect().map(_.toString).toSeq
    val window = SparkEntry.queries("q96_asof_join")(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "ts", "last_purchase_ts")
      .collect().map(_.toString).toSeq
    assert(native.nonEmpty)
    assert(native === window)
  }

  test("emits null for keys with no preceding match, deterministically") {
    val rows = asof().collect()
    // users whose first view precedes any purchase must get a null match
    assert(rows.exists(_.isNullAt(3)), "some view must precede every purchase")
    val again = asof().collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
