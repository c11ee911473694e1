package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the official-text TPC-DS battery (DsOfficial):
  * every star dimension must come in as a broadcast join (no dim may force
  * a fact shuffle), aggregation must be partial-then-final, and nothing may
  * degenerate into a cartesian product. The fact derivation itself
  * (lineitem JOIN orders on the fact's own key) is the only join allowed
  * to shuffle. These are the properties that keep the battery viable at
  * 100 TB — a dim that stops broadcasting turns a one-shuffle star into a
  * multi-shuffle disaster, silently.
  */
class DsOfficialPlanSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Execute (so AQE finalizes) and render the executed plan. */
  private def finalPlan(name: String): String = {
    val q = SparkEntry.all.find(_.name == name)
      .getOrElse(fail(s"no entry named $name"))
    val df = q.fn(spark, TestSpark.sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def countOf(p: String, token: String): Int =
    token.r.findAllIn(p).size

  test("q249_ds_q3: date_dim and item broadcast; partial-then-final agg") {
    val p = finalPlan("q249_ds_q3")
    assert(p.contains("BroadcastHashJoin"),
      s"star dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // partial + final HashAggregate pairs around the one agg shuffle
    assert(countOf(p, "HashAggregate") >= 2,
      s"aggregate must be partial-then-final:\n$p")
  }

  test("q252_ds_q19: six-table star keeps every dim on the broadcast side") {
    val p = finalPlan("q252_ds_q19")
    // date_dim, item, customer, customer_address, store are all dims —
    // at least four broadcast exchanges must survive planning
    assert(countOf(p, "BroadcastExchange") >= 4,
      s"six-table star must broadcast its dims:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q254_ds_q33: all three channel branches broadcast their dims") {
    val p = finalPlan("q254_ds_q33")
    assert(p.contains("Union"), s"three-channel plan must union:\n$p")
    assert(countOf(p, "BroadcastHashJoin") >= 3,
      s"each channel branch joins dims by broadcast:\n$p")
  }

  test("q255_ds_q36: rollup expands once; rank window sits above the agg") {
    val p = finalPlan("q255_ds_q36")
    assert(p.contains("Expand"), s"rollup must plan an Expand:\n$p")
    assert(p.contains("Window"), s"rank_within_parent needs a Window:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q266_ds_q98: ratio-over-class window follows a partial agg") {
    val p = finalPlan("q266_ds_q98")
    assert(p.contains("Window"), s"revenueratio needs a Window:\n$p")
    assert(countOf(p, "HashAggregate") >= 2,
      s"itemrevenue aggregates partially before the window shuffle:\n$p")
  }

  // ---- round-10 tranches: inventory/warehouse, week_seq, YoY self-joins ----

  test("q305_ds_q21: inventory star broadcasts warehouse/item/date dims") {
    val p = finalPlan("q305_ds_q21")
    assert(countOf(p, "BroadcastExchange") >= 2,
      s"inventory star must broadcast its dims:\n$p")
    assert(countOf(p, "HashAggregate") >= 2,
      s"before/after sums aggregate partially first:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q307_ds_q72: ten-table chain stays cartesian-free with broadcast dims") {
    val p = finalPlan("q307_ds_q72")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // demographics, warehouse, item, promotion, three date_dims are all
    // broadcast-sized; the only shuffling joins may be the fact-fact ones
    assert(countOf(p, "BroadcastExchange") >= 4,
      s"dims must broadcast in the q72 chain:\n$p")
  }

  test("q303_ds_q2: channel union aggregates partially under the week pivot") {
    val p = finalPlan("q303_ds_q2")
    assert(p.contains("Union"), s"ws+cs union must plan a Union:\n$p")
    assert(countOf(p, "HashAggregate") >= 2,
      s"weekly pivot aggregates partially before the shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q314_ds_q4: three-channel year_total self-join is cartesian-free " +
    "with partial aggs") {
    val p = finalPlan("q314_ds_q4")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(countOf(p, "HashAggregate") >= 2,
      s"year_total aggregates partially per channel:\n$p")
  }
}
