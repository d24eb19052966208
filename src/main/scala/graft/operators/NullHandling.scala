package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference null semantics (SURVEY §1.1): Pinot has no SQL NULLs by
  * default — every type carries a sentinel default
  * (`FieldSpec.java:49-66`: Integer.MIN_VALUE for dimension numerics, 0 for
  * metrics, "null" for strings), and real null handling is an opt-in query
  * option (`enableNullHandling`).
  *
  * Spark has native nulls, so the default mode is *emulated at ingest*:
  * [[sentinelFill]] replaces nulls with the reference defaults (the
  * `CompositeTransformer` null-value step), and [[withNulls]] restores
  * SQL-null behavior (the enableNullHandling path). Both are plain Column
  * maps — no shuffle, codegen-friendly. */
object NullHandling {
  /** Pinot dimension-field defaults by Spark type. */
  def dimensionDefault(dt: DataType): Any = dt match {
    case IntegerType => Int.MinValue
    case LongType => Long.MinValue
    case FloatType => Float.NegativeInfinity
    case DoubleType => Double.NegativeInfinity
    case StringType => "null"
    case BooleanType => false
    case _ => null
  }

  /** Pinot metric-field defaults (numeric zero). */
  def metricDefault(dt: DataType): Any = dt match {
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0f
    case DoubleType => 0d
    case _ => null
  }

  /** Ingest-side sentinel fill: nulls → per-type defaults for the given
    * columns (metric roles use zero defaults). */
  def sentinelFill(df: DataFrame, metrics: Set[String] = Set.empty)
  : DataFrame = {
    val cols = df.schema.fields.map { f =>
      val default =
        if (metrics(f.name)) metricDefault(f.dataType)
        else dimensionDefault(f.dataType)
      if (default == null) col(f.name)
      else coalesce(col(f.name), lit(default)).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Query-side enableNullHandling: sentinel values back to SQL NULL. */
  def withNulls(c: Column, dt: DataType, metric: Boolean = false): Column = {
    val sentinel = if (metric) metricDefault(dt) else dimensionDefault(dt)
    if (sentinel == null) c else nullif(c, lit(sentinel))
  }
}
