package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; the bench needs to flush
  * it so each query's task metrics land in that query's bucket. Thin
  * accessor in the spark namespace — same technique as the sketch-agg
  * bridges under `org/apache/spark/sql/graft`. */
object ListenerBusAccess {
  /** Best-effort flush: waits up to `ms` for queued listener events. */
  def waitUntilEmpty(sc: SparkContext, ms: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(ms) catch { case _: Throwable => () }
}
