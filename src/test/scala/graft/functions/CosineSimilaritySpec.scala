package graft.functions

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** the HOF spelling the expression must match bit-for-bit */
  private def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("bit-identical to the higher-order-function fold on real embeddings") {
    val e = Tables.df(spark, TestSpark.sfDir, "embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") < 3).select(col("embedding").as("b")))
    val mismatches = pairs.select(
      CosineSimilarity(spark, col("a"), col("b")).as("fast"),
      hofCos(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches === 0)
  }

  test("participates in whole-stage codegen") {
    val e = Tables.df(spark, TestSpark.sfDir, "embeddings").limit(10)
    val df = e.select(CosineSimilarity(spark, col("embedding"), col("embedding")).as("c"))
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), "expression must not fall back")
  }

  test("null array yields null") {
    val df = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
    assert(df.collect().head.isNullAt(0))
  }
}
