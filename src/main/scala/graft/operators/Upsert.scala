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
    * left-to-right precedence).
    *
    * Tie-breaking: the reference resolves EQUAL comparison values in favor
    * of the later-arrived row (`ConcurrentMapPartitionUpsertMetadataManager
    * .java:93,194` — "when there is a tie … keep the newer record":
    * `comparisonResult >= 0` replaces, and record/segment iteration is in
    * arrival order).
    * Arrival order in data at rest must be carried by a column (a Kafka
    * offset, ingest timestamp, segment sequence); pass it as `arrivalCol`
    * and ties resolve to its HIGHEST value, deterministically. Without it,
    * `cmpCols` must totally order rows within a key — tied rows otherwise
    * leave the winner to partitioning order. */
  def latestView(df: DataFrame, pks: Seq[String], cmpCols: Seq[String],
                 arrivalCol: Option[String] = None): DataFrame = {
    val order = cmpCols.map(c => col(c).desc) ++
      arrivalCol.map(c => col(c).desc)
    val w = Window.partitionBy(pks.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** FULL upsert with delete support (`UpsertConfig.deleteRecordColumn`):
    * a true `deleteCol` on the winning (latest) record tombstones the key —
    * the key disappears from the view entirely, exactly the reference's
    * semantics (older live rows do NOT resurrect). Same single keyed
    * window as [[latestView]]; the tombstone filter is free. */
  def latestViewWithDeletes(df: DataFrame, pks: Seq[String],
                            cmpCols: Seq[String], deleteCol: String,
                            arrivalCol: Option[String] = None)
  : DataFrame =
    latestView(df, pks, cmpCols, arrivalCol)
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

  /** @param maxHistory optional per-key bound for the accumulating
    *   strategies (the reference's bounded mergers): APPEND keeps the
    *   LATEST n values (arrival order), UNION the distinct values among
    *   the latest n. The bound is enforced INSIDE the aggregate — rows
    *   past the cap contribute null, which collect_list/set skip — so a
    *   hot PK bounds the agg buffer itself, not just the output array.
    *   Scalar strategies (INCREMENT, MIN/MAX, …) still see full history.
    *   The ranking window shuffles on the same PK the groupBy uses, so
    *   AQE reuses the partitioning — no extra shuffle. */
  def partialUpsert(df: DataFrame, pks: Seq[String], cmp: String,
                    strategies: Map[String, Strategy],
                    maxHistory: Option[Int] = None): DataFrame = {
    val ranked = maxHistory.fold(df) { _ =>
      val w = Window.partitionBy(pks.map(col): _*).orderBy(col(cmp).desc)
      df.withColumn("__rn", row_number().over(w))
    }
    // under the cap: latest-n filter applied inside the aggregate
    def recent(e: Column): Column =
      maxHistory.fold(e)(n => when(col("__rn") <= n, e))
    val aggs = strategies.map { case (c, s) =>
      val v = col(c)
      (s match {
        case Append    => array_sort(collect_list(recent(struct(col(cmp), v))))
                            .getField(c)
        case Ignore    => min_by(v, col(cmp))
        case Increment => sum(v)
        case MaxOf     => max(v)
        case MinOf     => min(v)
        case Overwrite => max_by(v, col(cmp))
        case UnionOf   => array_sort(collect_set(recent(v)))
      }).as(c)
    }.toSeq
    ranked.groupBy(pks.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
