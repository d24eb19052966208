package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-tree pre-aggregation analog (SURVEY §4.3; reference
  * `StarTreeV2.java:29`, `AggregationFunctionColumnPair.java:25`, plan
  * swap-in at `AggregationPlanNode.java:133-140`).
  *
  * The reference materializes per-segment aggregation trees and swaps them
  * into the plan when a query's filter+agg columns fit. The Spark-idiomatic
  * realization is a *summary table*: one pre-aggregated DataFrame at the
  * chosen dimension grain, carrying mergeable partial metrics
  * (count/sum/min/max — the same mergeable-aggregate contract). A query on
  * any SUBSET of the dimensions re-aggregates the summary instead of the
  * fact table — |summary| ≪ |facts|, and the rewrite is exact because the
  * metrics are associative. At 100 TB this is the difference between
  * scanning the corpus and scanning a few million summary rows. */
object StarTree {
  /** Mergeable metric spec: column → aggregations to pre-compute. */
  final case class Metric(column: String, fns: Seq[String])

  /** Build the summary at the dims grain. Metric columns are named
    * `<fn>_<col>`; `n_rows` carries the row count so AVG can be derived. */
  def build(facts: DataFrame, dims: Seq[String], metrics: Seq[Metric])
  : DataFrame = {
    val aggs = metrics.flatMap { m =>
      m.fns.map {
        case "sum" => sum(col(m.column)).as(s"sum_${m.column}")
        case "min" => min(col(m.column)).as(s"min_${m.column}")
        case "max" => max(col(m.column)).as(s"max_${m.column}")
        case f => throw new IllegalArgumentException(s"non-mergeable: $f")
      }
    } :+ count(lit(1)).as("n_rows")
    facts.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Re-aggregate the summary at a coarser dim subset — the "star node"
    * traversal. `filter` may reference summary dims only. */
  def query(summary: DataFrame, selectDims: Seq[String],
            filter: Option[Column] = None): DataFrame = {
    val base = filter.fold(summary)(summary.filter)
    val metricCols = summary.columns.filter(c =>
      c.startsWith("sum_") || c.startsWith("min_") || c.startsWith("max_") ||
        c == "n_rows")
    val aggs = metricCols.toSeq.map {
      case c if c.startsWith("sum_") => sum(col(c)).as(c)
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case c => sum(col(c)).as(c)
    }
    if (selectDims.isEmpty) base.agg(aggs.head, aggs.tail: _*)
    else base.groupBy(selectDims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
