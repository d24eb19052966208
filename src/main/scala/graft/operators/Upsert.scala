package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert semantics (reference: `UpsertConfig.java:33-39` — FULL or PARTIAL
  * mode keyed by primary key, newest-by-comparison-column wins; partial
  * per-column strategies in `pinot-segment-local/.../upsert/merger/`).
  *
  * Batch (merge-on-read) realization: a window `row_number` picks the latest
  * row per PK — one shuffle on the PK, partial-agg free, AQE handles skewed
  * hot keys. Streaming realization would be
  * `dropDuplicatesWithinWatermark` / `flatMapGroupsWithState` over the same
  * key; the batch view is the correctness-checkable core.
  */
object Upsert {
  /** FULL upsert view: latest row per `pks` by `cmpCols` (descending,
    * left-to-right precedence). `cmpCols` must make rows totally ordered
    * within a key for deterministic results — same requirement as the
    * reference's comparison column. */
  def latestView(df: DataFrame, pks: Seq[String], cmpCols: Seq[String])
  : DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(cmpCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** FULL upsert with delete support (`UpsertConfig.deleteRecordColumn`):
    * a true `deleteCol` on the winning (latest) record tombstones the key —
    * the key disappears from the view entirely, exactly the reference's
    * semantics (older live rows do NOT resurrect). Same single keyed
    * window as [[latestView]]; the tombstone filter is free. */
  def latestViewWithDeletes(df: DataFrame, pks: Seq[String],
                            cmpCols: Seq[String], deleteCol: String)
  : DataFrame =
    latestView(df, pks, cmpCols)
      .filter(!coalesce(col(deleteCol), lit(false))).drop(deleteCol)

  /** Partial-upsert merge strategies
    * (`UpsertConfig.Strategy`: APPEND, IGNORE, INCREMENT, MAX, MIN,
    * OVERWRITE, UNION). Collapses the full history per PK in one grouped
    * pass (partial-aggregated; APPEND/UNION use collect_list/set which the
    * reference also bounds per key). `cmp` orders history (ascending —
    * latest = max). */
  sealed trait Strategy
  case object Append extends Strategy     // concat values in arrival order
  case object Ignore extends Strategy     // keep first (earliest) value
  case object Increment extends Strategy  // sum of values
  case object MaxOf extends Strategy
  case object MinOf extends Strategy
  case object Overwrite extends Strategy  // keep latest value
  case object UnionOf extends Strategy    // distinct set, sorted

  def partialUpsert(df: DataFrame, pks: Seq[String], cmp: String,
                    strategies: Map[String, Strategy]): DataFrame = {
    val aggs = strategies.map { case (c, s) =>
      val v = col(c)
      (s match {
        case Append    => array_sort(collect_list(struct(col(cmp), v)))
                            .getField(c)
        case Ignore    => min_by(v, col(cmp))
        case Increment => sum(v)
        case MaxOf     => max(v)
        case MinOf     => min(v)
        case Overwrite => max_by(v, col(cmp))
        case UnionOf   => array_sort(collect_set(v))
      }).as(c)
    }.toSeq
    df.groupBy(pks.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
