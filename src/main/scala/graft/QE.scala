package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One engine operator exposed to the driver: a named DataFrame query plus
  * (when SQL-expressible) the equivalent DuckDB oracle SQL.
  */
final case class QE(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

/** Oracle-determinism helpers.
  *
  * All double measure columns in the test data are exact 2-decimal values, so
  * `cast(x as decimal)` is lossless and decimal aggregation is exact and
  * associative — both Spark and DuckDB then produce bit-identical results
  * regardless of partitioning / evaluation order. Final outputs are cast back
  * to double so the output schema matches the oracle's.
  */
object Q {
  val dec: DecimalType = DecimalType(12, 2)

  /** Exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast(DoubleType)

  /** Exact mean (decimal sum / count), as double. */
  def davg(c: Column): Column = (sum(c.cast(dec)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Per-row revenue term price*(1-discount) as exact decimal. */
  def revenue(price: Column, discount: Column): Column =
    price.cast(dec) * (lit(1).cast(dec) - discount.cast(dec))

  /** DuckDB-side spellings of the same. */
  def oSum(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
  def oAvg(col: String): String =
    s"CAST(CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) / COUNT($col) AS DOUBLE)"
  def oRev(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(12,2)) * (1 - CAST($discount AS DECIMAL(12,2)))"
}
