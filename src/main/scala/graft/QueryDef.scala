package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One oracle-checked query: a Spark-side plan plus (optionally) the
  * equivalent DuckDB SQL. Column names must match between the two —
  * the driver sorts columns by name and hashes values.
  *
  * `setup` is the build phase of gates that construct catalog state first
  * (bucketed tables, incremental-dedup indexes): Verify runs setup then
  * run; Bench times them SEPARATELY so the headline number measures the
  * operator, not saveAsTable commit ceremony — and `run` must therefore
  * be idempotent given setup's side effects (re-timable). */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    setup: Option[(SparkSession, String) => Unit] = None)

/** Oracle-parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB.
  * Floating-point aggregation order differs between engines, so double
  * aggregates must be made bit-deterministic. The testdata's double columns
  * are all 2-decimal values by construction (verified vs TESTDATA.md), so
  * the recipe is:
  *
  *   1. Lift raw doubles into exact decimals FIRST (`money`/`pct` — lossless
  *      for 2-dp values in both engines: Spark casts via the shortest decimal
  *      string, DuckDB rounds the binary value; both land on the same 2-dp
  *      decimal).
  *   2. Do arithmetic in decimal (exact, engine-independent, and with tight
  *      input precisions so neither engine hits its precision-38 cap).
  *   3. Cast the final aggregate back to double — one correctly-rounded
  *      conversion of the same exact rational on both sides. Identical while
  *      the scaled sum stays under 2^53 (true at the sf0.01 gate; DuckDB's
  *      decimal->double is a two-step int128->double/10^s at larger scales —
  *      ADVICE r1 #2).
  *
  * Inherently inexact stats (native variance family, percentiles) are
  * instead computed from exact decimal moments or rounded on BOTH sides.
  */
object Par {
  /** Lossless lift of a 2-dp money column (|x| < 1e10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Lossless lift of a 2-dp rate column (|x| < 100). */
  def pct(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Decimal literal 1.00 (keeps decimal arithmetic tight). */
  val oneD: Column = lit(1).cast(DecimalType(3, 2))

  /** Exact sum of a 2-dp double column, emitted as DOUBLE.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE). Wide precision so
    * large values can't overflow to NULL in non-ANSI mode (ADVICE r1 #1). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Exact sum of a computed decimal expression (up to 6 fractional digits).
    * Oracle: CAST(SUM(CAST(expr AS DECIMAL(30,6))) AS DOUBLE). */
  def wsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Exact mean from the exact sum (double/long division is bit-identical
    * across engines). Oracle: dsum-SQL / COUNT(x). */
  def davg(c: Column): Column = dsum(c) / count(c)

  def r4(c: Column): Column = round(c, 4)
  def r2(c: Column): Column = round(c, 2)
  def r6(c: Column): Column = round(c, 6)

  /** Quantized-long lift of a NON-NEGATIVE 2-dp column: round(x·100) as
    * long — the primitive-long twin of [[money]]/[[pct]] for hot
    * aggregates. floor(v+0.5) IS round-half-up for non-negative v and is
    * pure codegen (Spark's round on double allocates a BigDecimal per
    * row); x·100 sits ~1e-12 from an integer so the half-boundary is
    * never in play. Products of quantized values stay in long range by
    * construction (document the bound per use). */
  def q2(c: Column): Column = floor(c * 100 + 0.5)

  /** Exact descaled sum of a scaled-long per-row expression: accumulate in
    * DECIMAL(38,0) (compact-long adds while the total fits, exact at any
    * row count), then ONE double conversion and ONE divide — the same op
    * order as the oracle twin, so the doubles are bit-identical. */
  def qsum(c: Column, scale: Double): Column =
    sum(c.cast(DecimalType(38, 0))).cast("double") / scale

  /** DuckDB CTE lifting `events` to microsecond-truncated timestamps, the
    * same truncation Tables.load applies on the Spark side (Spark
    * TimestampType is micros; the file stores nanos). Use `ev` in oracle
    * SQL wherever the Spark side reads Tables.events. */
  val evCte: String =
    "ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM main.events)"
  def evOracle(body: String): String = s"WITH $evCte $body"
}

/** DuckDB-side twins of the [[Par]] helpers — string fragments for oracle
  * SQL. Exactness (not precision-rule parity) is what makes the two engines
  * agree: decimal arithmetic is exact in both as long as nothing overflows,
  * so matching the *mathematical* expression suffices. */
object ParSql {
  def money(c: String): String = s"CAST($c AS DECIMAL(12,2))"
  def pct(c: String): String = s"CAST($c AS DECIMAL(4,2))"
  val oneD: String = "CAST(1.00 AS DECIMAL(3,2))"
  def dsum(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(28,4))) AS DOUBLE)"
  def wsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(30,6))) AS DOUBLE)"
  def davg(c: String): String = s"(${dsum(c)} / COUNT($c))"
  /** Twin of Par.q2 (non-negative 2-dp inputs). */
  def q2(c: String): String = s"CAST(FLOOR($c*100 + 0.5) AS BIGINT)"
  /** Twin of Par.qsum — DuckDB sums BIGINT into exact HUGEINT. */
  def qsum(e: String, scale: String): String =
    s"(CAST(SUM(CAST($e AS HUGEINT)) AS DOUBLE)/$scale)"
  /** Shared 60-bit hash: first 15 md5 hex digits, base-16. Twin of
    * graft.functions.Scalars.hash60. */
  def hash60(e: String): String = s"('0x' || substr(md5($e), 1, 15))::BIGINT"
}
