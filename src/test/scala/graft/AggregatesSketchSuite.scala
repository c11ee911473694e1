package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q162's HLL sketch cannot be oracle-checked (DuckDB has no DataSketches
  * HLL), so this suite pins the two properties that make the entry
  * trustworthy: the estimate tracks the exact distinct count, and the
  * whole computation is deterministic (DataSketches HLL is RNG-free, so a
  * re-run must match to the last bit of the estimate).
  */
class AggregatesSketchSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL estimates stay within 3% of exact per-type distinct users") {
    val est = SparkEntry.queries("q162_hll_sketch")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val events = Tables.df(spark, TestSpark.sfDir, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = events.select(countDistinct(col("user_id"))).head().getLong(0)
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n).toDouble / n <= 0.03,
        s"$k: HLL estimate $e vs exact $n drifts > 3%")
    }
  }

  test("HLL sketch entry is deterministic across re-runs") {
    def run() = SparkEntry.queries("q162_hll_sketch")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run() == run())
  }
}
