package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic (oracle-exact) aggregate arithmetic.
  *
  * Floating-point SUM/AVG is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's single-threaded order — a raw
  * `sum(double)` can hash-mismatch the oracle at the last ulp. All fixture
  * money/quantity columns carry <= 2 decimal digits, so we do the aggregation
  * in exact DECIMAL arithmetic (associative, order-independent) and cast the
  * final value to DOUBLE. Both engines round the same double to the same
  * decimal (half-away-from-zero) and convert the same decimal to the same
  * double, so results are bit-identical regardless of parallelism — this
  * property survives a 1000-executor shuffle unchanged.
  */
object Exact {
  val D2: DecimalType = DecimalType(18, 2)

  /** Cast a 2-dp double column to exact decimal. */
  def dec2(c: Column): Column = c.cast(D2)

  /** Exact sum of a 2-dp double column, returned as double.
    * Oracle: CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, divided in double.
    * Oracle: CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact revenue term: price * (1 - discount) in decimal.
    * Oracle: CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))
    */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - dec2(discount))

  /** Exact revenue sum as double. */
  def dsumRevenue(price: Column, discount: Column): Column =
    sum(revenue(price, discount)).cast(DoubleType)
}
