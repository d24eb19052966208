package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One oracle-checked query: a Spark-side plan plus (optionally) the
  * equivalent DuckDB SQL. Column names/ordering must match between the two —
  * the driver sorts columns by name and hashes values. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Oracle-parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB. Floating-point
  * aggregation order differs between engines, so any double aggregate must be
  * made bit-deterministic: route sums through exact DECIMAL(18,4) arithmetic
  * (exact in both engines, then a correctly-rounded cast back to double), and
  * round inherently inexact stats (variance family, percentiles) to a safe
  * number of decimals on BOTH sides.
  */
object Par {
  /** Exact sum of a double column: sum in DECIMAL(18,4), emit DOUBLE.
    * Oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact mean built from the exact sum (double division of identical
    * doubles is bit-identical across engines).
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)/COUNT(x). */
  def davg(c: Column): Column = dsum(c) / count(c)

  def r4(c: Column): Column = round(c, 4)
  def r2(c: Column): Column = round(c, 2)
}
