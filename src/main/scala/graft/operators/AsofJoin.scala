package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the latest right row with
  * `right.ts <= left.ts` under equal keys — the time-series/training-data
  * staple (feature lookup at example time, point-in-time correctness).
  *
  * Neither the reference nor Spark has a native operator (SURVEY §2.4
  * "no nested-loop/range/as-of joins"); this is a superset item. The
  * realization is the scalable union+window plan: tag sides, union, one
  * window per key ordered by (ts, side) carrying the last right payload
  * forward, keep left rows. Exactly ONE hash-shuffle on the keys and a
  * per-key sort — linear, no range cross-join, no per-row probe. Skewed
  * keys ride AQE or [[Skew]] salting like any other keyed shuffle. */
object AsofJoin {
  /** @param left      probe side (rows preserved, left-join semantics)
    * @param right     build side (payload carried forward in time)
    * @param keys      equi-join keys present on both sides
    * @param tsCol     event-time column name (both sides)
    * @param payload   right-side columns to attach (renamed as given)
    * @param tieBreak  right-side column ordering ties at equal ts
    *                  (latest wins) */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payload: Map[String, String],
                   tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // __side orders right rows BEFORE left at the same ts so an equal-ts
    // right row is visible to the left row (ts >= semantics)
    val l = left.withColumn("__side", lit(1))
    // The whole right payload (ts + every attached column) travels as ONE
    // struct, null for left rows. `last(.., ignoreNulls)` over the struct
    // then picks the latest right ROW atomically: all payload fields come
    // from the same as-of match, and a genuinely NULL payload field inside
    // the matched row is preserved (a per-column last would backfill it
    // from an older right row — a combination that never existed).
    val payloadStruct = struct(
      col(tsCol).as("__ts") +: payload.toSeq.map { case (src, dst) =>
        col(src).as(dst)
      }: _*)
    val r = right.select(
      (keys.map(col) :+ col(tsCol) :+
        tieBreak.map(col).getOrElse(lit(0L)).as("__tie") :+
        payloadStruct.as("__pay")): _*)
      .withColumn("__side", lit(0))
    val unioned = l.drop("__tie").withColumn("__tie", lit(0L))
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))

    attached.filter(col("__side") === 1)
      .select((leftCols.map(col) :+
        col("__asof.__ts").as(s"${tsCol}_right")) ++
        payload.values.toSeq.map(dst => col(s"__asof.$dst").as(dst)): _*)
  }
}
