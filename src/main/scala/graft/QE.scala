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

  /** Exact sum of an already-exact decimal expression (e.g. [[revenue]]), as
    * double. Unlike [[dsum]] it does NOT re-cast the argument to (12,2), so
    * higher-scale products are summed losslessly.
    */
  def dsumx(c: Column): Column = sum(c).cast(DoubleType)

  /** Exact mean (decimal sum / count), as double. */
  def davg(c: Column): Column = (sum(c.cast(dec)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Per-row revenue term price*(1-discount) as exact decimal (scale 4). */
  def revenue(price: Column, discount: Column): Column =
    price.cast(dec) * (lit(1).cast(dec) - discount.cast(dec))

  /** price*(1-d)*(1+t): the scale-6 triple product overflows DECIMAL(38) if
    * kept exact symbolically, so both engines compute it in IEEE double (same
    * op order -> bit-identical) and round once to DECIMAL(18,6); decimal
    * summation from there is exact. A double is never exactly a 6-decimal
    * midpoint, so the rounding is engine-independent.
    */
  def charge(price: Column, discount: Column, tax: Column): Column =
    (price * (lit(1.0) - discount) * (lit(1.0) + tax)).cast(DecimalType(18, 6))

  /** DuckDB-side spellings of the same. */
  def oSum(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
  def oAvg(col: String): String =
    s"CAST(CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) / COUNT($col) AS DOUBLE)"
  def oRev(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST($discount AS DECIMAL(12,2)))"
  def oSumRev(price: String, discount: String): String =
    s"CAST(SUM(${oRev(price, discount)}) AS DOUBLE)"
  def oCharge(price: String, discount: String, tax: String): String =
    s"CAST($price * (1.0::DOUBLE - $discount) * (1.0::DOUBLE + $tax) AS DECIMAL(18,6))"
}
