package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event funnels (superset: upstream Apache Pinot grew
  * FUNNEL_COUNT / FUNNEL_MATCH_STEP / FUNNEL_COMPLETE_COUNT for exactly
  * this; the reference fork predates them — re-expressed here with the
  * greedy-earliest matching those functions use).
  *
  * Semantics: per user, step 1 anchors at the EARLIEST matching event;
  * step i (i > 1) matches the earliest event STRICTLY after step i−1
  * and within the window — which is measured from the ANCHOR
  * ([[WindowMode.Anchor]], the FUNNEL_COUNT default: the whole funnel
  * completes within `windowSec` of step 1) or from the PREVIOUS step
  * ([[WindowMode.PerStep]], the maxStepDuration-style mode: each
  * consecutive gap is at most `windowSec`, the funnel's total span may
  * reach (k−1)·windowSec). Greedy-earliest is the standard funnel
  * contract — it can miss sequences a later anchor would catch
  * (documented trade-off of every funnel engine; exhaustive anchoring
  * is quadratic in events-per-user).
  *
  * Scale shape: k steps = k (filter → keyed partial-min aggregation →
  * join on the user key) rounds. Every shuffle is on the user key and
  * carries one row per user per round; no per-user event lists ever
  * materialize (the collect_list-per-user formulation every naive
  * funnel takes is the anti-pattern — a hot user would explode a row).
  * Step predicates push into the event scan as disjuncts of the step
  * filters. */
object Funnel {

  /** Window anchoring mode — see the object doc. */
  sealed trait WindowMode
  object WindowMode {
    /** Every step within `windowSec` of the step-1 anchor (default). */
    case object Anchor extends WindowMode
    /** Every step within `windowSec` of the PREVIOUS step. */
    case object PerStep extends WindowMode
  }

  /** Per-user funnel match: (userCol, t_1 … t_k timestamp-or-null,
    * steps_matched). t_i is null (and counting stops) at the first
    * unreached step. */
  def matchSteps(events: DataFrame, userCol: String, tsCol: String,
                 steps: Seq[Column], windowSec: Long,
                 mode: WindowMode = WindowMode.Anchor): DataFrame = {
    require(steps.nonEmpty, "need at least one step predicate")
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val user = col(userCol)
    val ts = col(tsCol)
    val anchor = events.filter(steps.head)
      .groupBy(user).agg(min(ts).as("t_1"))
    val matched = steps.zipWithIndex.drop(1).foldLeft(anchor) {
      case (prev, (pred, i)) =>
        val stepN = i + 1 // 1-based step number
        val windowFrom = mode match {
          case WindowMode.Anchor => col("__a")
          case WindowMode.PerStep => col(s"t_$i")
        }
        val cand = events.filter(pred)
          .join(prev.select(user, col(s"t_$i"), col("t_1").as("__a")), userCol)
          .filter(ts > col(s"t_$i") &&
            ts <= windowFrom + expr(s"INTERVAL $windowSec SECOND"))
          .groupBy(user).agg(min(ts).as(s"t_$stepN"))
        prev.join(cand, Seq(userCol), "left")
    }
    // steps_matched = contiguous non-null prefix length; a null t_i makes
    // every later t_j null by construction (each round joins on the
    // previous step's survivors), so counting non-nulls is equivalent.
    val reached = steps.indices
      .map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    matched.withColumn("steps_matched", reached.cast("int"))
  }

  /** Funnel drop-off curve: for each step, how many users reached it
    * (FUNNEL_COUNT role). One aggregation over [[matchSteps]]' one-row-
    * per-user output. */
  def count(events: DataFrame, userCol: String, tsCol: String,
            steps: Seq[Column], windowSec: Long,
            mode: WindowMode = WindowMode.Anchor): DataFrame = {
    val m = matchSteps(events, userCol, tsCol, steps, windowSec, mode)
    // coalesce: sum over zero matched users is NULL in SQL; the funnel
    // contract (and the COUNT(*)-style oracle) wants 0 at every step.
    val perStep = steps.indices.map { i =>
      coalesce(sum(when(col("steps_matched") >= i + 1, 1L).otherwise(0L)),
        lit(0L)).as(s"n_step_${i + 1}")
    }
    m.agg(perStep.head, perStep.tail: _*)
      .select(explode(array(steps.indices.map(i =>
        struct(lit(i + 1).as("step"),
          col(s"n_step_${i + 1}").as("n_users"))): _*)).as("s"))
      .select(col("s.step").as("step"), col("s.n_users").as("n_users"))
  }

  /** FUNNEL_COMPLETE_COUNT role: how many users completed EVERY step —
    * one row, (n_complete). The last point of [[count]]'s curve without
    * materializing the curve. */
  def completeCount(events: DataFrame, userCol: String, tsCol: String,
                    steps: Seq[Column], windowSec: Long,
                    mode: WindowMode = WindowMode.Anchor): DataFrame =
    matchSteps(events, userCol, tsCol, steps, windowSec, mode)
      .agg(coalesce(sum(
        when(col("steps_matched") === steps.size, 1L).otherwise(0L)),
        lit(0L)).as("n_complete"))

  /** GAP-based SESSIONIZATION — the batch twin of the streaming
    * session window (SURVEY §2.9) and the "interaction logs →
    * training episodes" step an agent-data pipeline runs before
    * [[graft.operators.Chats.treePaths]]-style episode assembly:
    * per key, events sort by (ts, tieCols…) and a new session starts
    * wherever the gap to the previous event EXCEEDS `gapSec`
    * (microsecond arithmetic — sub-second gaps count). Adds
    * `session_idx` (0-based per key, deterministic at any
    * parallelism given a deciding tie order). One lag + one running
    * sum over the SAME key-partitioned window — one exchange. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapSec: Long,
                 tieCols: Seq[String] = Seq.empty): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val W = org.apache.spark.sql.expressions.Window
    val ord: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = W.partitionBy(col(keyCol)).orderBy(ord: _*)
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val isNew = when(prevUs.isNull ||
      us - prevUs > gapSec * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(W.unboundedPreceding,
        W.currentRow)) - 1)
  }

  /** Per-session SUMMARY over [[sessionize]] — the episode card:
    * (keyCol, session_idx, n_events, ts_start, ts_end, duration_us).
    * The keyed agg reuses the sessionize exchange's partitioning. */
  def sessionSummary(events: DataFrame, keyCol: String, tsCol: String,
                     gapSec: Long,
                     tieCols: Seq[String] = Seq.empty): DataFrame =
    sessionize(events, keyCol, tsCol, gapSec, tieCols)
      .groupBy(col(keyCol), col("session_idx"))
      // Funnel.count (the FUNNEL_COUNT role) shadows functions.count
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_events"),
        min(col(tsCol)).as("ts_start"),
        max(col(tsCol)).as("ts_end"))
      .withColumn("duration_us",
        unix_micros(col("ts_end")) - unix_micros(col("ts_start")))

  /** SESSION → EPISODE assembly — the step between [[sessionize]]'s
    * card and the chat-shaped training stack: each session becomes
    * one CONVERSATION in the (conv_id, turn_idx, role, content)
    * interchange shape, so [[graft.operators.Chats.validateTurns]],
    * [[graft.operators.Chats.packWithMask]], and
    * [[graft.operators.Chats.tokenSpans]] apply UNCHANGED — the
    * batch twin of the streaming ingest capstones.
    *
    *   - `conv_id` = key ':' session_idx (string — collision-free by
    *     construction);
    *   - `turn_idx` = the event's 0-based rank in (ts, tieCols…)
    *     order within its session;
    *   - `role` = `roleOf(turn_idx)` — default alternating
    *     user/assistant from turn 0, the "interaction log as
    *     dialogue" convention (so protocol validation is REAL:
    *     odd-length sessions fail the ends-on-assistant rule and
    *     singleton sessions drop — attrition the pipeline reports,
    *     not hides);
    *   - `content` = `contentCol`, any per-event expression.
    *
    * Scale shape: the rank window shares [[sessionize]]'s
    * key-partitioned exchange (Catalyst reuses the partitioning),
    * so the whole assembly is ONE exchange on the session key. */
  def sessionEpisodes(events: DataFrame, keyCol: String, tsCol: String,
                      gapSec: Long, contentCol: Column,
                      tieCols: Seq[String] = Seq.empty,
                      roleOf: Column => Column = idx =>
                        when(idx % 2 === 0, "user")
                          .otherwise("assistant")): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ord: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = W.partitionBy(col(keyCol), col("session_idx"))
      .orderBy(ord: _*)
    // a NULL key would make conv_id NULL for EVERY null-key session —
    // distinct sessions silently merge into one garbage conversation
    // downstream (duplicate turn 0s) — fail loudly instead, the
    // bucketBatches/cohenKappa null-guard class
    val key = when(
      assert_true(col(keyCol).isNotNull,
        lit(s"sessionEpisodes: null $keyCol — anonymous events have " +
          "no episode key; filter or impute first")).isNull,
      col(keyCol))
    sessionize(events, keyCol, tsCol, gapSec, tieCols)
      .withColumn("turn_idx", row_number().over(w).cast("long") - 1)
      .select(
        concat(key.cast("string"), lit(":"),
          col("session_idx").cast("string")).as("conv_id"),
        col("turn_idx"), roleOf(col("turn_idx")).as("role"),
        contentCol.as("content"))
  }
}
