package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.graft.Internals

/** Column-level access to Spark's own bloom-filter expression pair — the
  * sketch `InjectRuntimeFilter` builds for runtime row-level join pruning
  * (`bloom_filter_agg` / `might_contain`; both registered internal-only, so
  * they are surfaced here through the same temp-function bridge as
  * [[CosineSimilarity]]). The aggregate builds the filter distributedly with
  * map-side partial merge; the membership probe is codegen'd and reads the
  * serialized filter from a constant, so a probe over a 100 TB scan costs
  * one hash per row with zero extra shuffle.
  */
object BloomFunctions {

  private def register(spark: SparkSession): Unit = {
    Internals.registerExprFunction(spark, "graft_bloom_agg",
      args => BloomFilterAggregate(args(0), args(1), args(2), 0, 0))
    Internals.registerExprFunction(spark, "graft_might_contain",
      args => BloomFilterMightContain(args(0), args(1)))
  }

  /** Aggregate a LONG column into a serialized bloom filter (binary). */
  def bloomAgg(spark: SparkSession, item: Column, estItems: Long, numBits: Long): Column = {
    register(spark)
    call_function("graft_bloom_agg", item, lit(estItems), lit(numBits))
  }

  /** Membership probe of a LONG item against a serialized filter. */
  def mightContain(spark: SparkSession, bloom: Column, item: Column): Column = {
    register(spark)
    call_function("graft_might_contain", bloom, item)
  }
}
