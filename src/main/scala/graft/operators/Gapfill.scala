package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Time-series gap filling (reference: broker-side `GAPFILL(...)`
  * post-processing — `pinot-core/.../reduce/GapfillProcessor.java:49,133-170`,
  * fill modes `GapfillUtils.java:358-359`: FILL_DEFAULT_VALUE /
  * FILL_PREVIOUS_VALUE).
  *
  * Spark-first design: instead of a driver-side post-processor, the bucket
  * spine is generated *distributed* (`sequence` + `explode` on a per-key
  * frame), left-joined to the aggregated buckets, and FILL_PREVIOUS_VALUE is
  * a `last(ignoreNulls) OVER (PARTITION BY key ORDER BY bucket)` window —
  * one shuffle on the series key, linear in buckets×keys, no collect. At
  * 100 TB the spine is tiny relative to the data (buckets × distinct keys)
  * and the window partitions by series key, so no skew hot-spot.
  */
object Gapfill {
  sealed trait FillMode
  case object FillPrevious extends FillMode
  final case class FillDefault(value: Column) extends FillMode

  /** Gap-fill `df` (already aggregated to one row per (key, bucket)).
    *
    * @param df       input with columns: keyCols ++ (bucketCol: timestamp)
    *                 ++ valueCols
    * @param bucketCol    name of the time-bucket column
    * @param keyCols  series identity columns
    * @param start    first bucket (inclusive)
    * @param end      last bucket (inclusive)
    * @param stepSec  bucket width in seconds
    * @param fills    per-value-column fill mode
    */
  def gapfill(df: DataFrame, bucketCol: String, keyCols: Seq[String],
              start: Timestamp, end: Timestamp, stepSec: Long,
              fills: Map[String, FillMode]): DataFrame = {
    val spark = df.sparkSession
    // Distributed spine: every key × every bucket in [start, end].
    val buckets = spark.range(1).select(explode(sequence(
      lit(start), lit(end),
      expr(s"INTERVAL $stepSec SECONDS"))).as(bucketCol))
    val keys = df.select(keyCols.map(col): _*).distinct()
    val spine = keys.crossJoin(buckets)

    val joined = spine.join(df, keyCols :+ bucketCol, "left")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fills.foldLeft(joined) { case (acc, (c, mode)) =>
      mode match {
        case FillPrevious =>
          acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
        case FillDefault(v) =>
          acc.withColumn(c, coalesce(col(c), v))
      }
    }
  }
}
