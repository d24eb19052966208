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
  * Scale shape: ONE aggregation over the table (Spark plans the
  * multi-distinct agg via Expand — rows × profiled columns on the map
  * side, map-side-combined before the single shuffle); the unpivot to
  * narrow rows is a driver-free projection of the 1-row result. At
  * 100 TB this is the same job shape as ANALYZE TABLE ... COMPUTE
  * STATISTICS FOR COLUMNS. */
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
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        (if (isNum(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__minn_$c"),
        (if (isNum(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (isNum(c)) lit(null).cast("string")
         else min(col(c)).cast("string")).as(s"__mins_$c"),
        (if (isNum(c)) lit(null).cast("string")
         else max(col(c)).cast("string")).as(s"__maxs_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n"),
      (col("__n") - col(s"__cnt_$c")).as("nulls"),
      col(s"__ndv_$c").as("ndv"),
      col(s"__minn_$c").as("min_num"),
      col(s"__maxn_$c").as("max_num"),
      col(s"__mins_$c").as("min_str"),
      col(s"__maxs_$c").as("max_str")))
    one.select(inline(array(rows: _*)))
  }
}
