package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

/** Streaming (gRPC) result delivery analog (reference
  * `pinot-core/.../query/reduce/StreamingReduceService.java` +
  * `SelectionOnlyStreamingReducer.java`: server blocks stream to the
  * broker/client incrementally instead of one materialized payload).
  *
  * Spark realization: `toLocalIterator` pulls ONE partition's results at a
  * time — driver memory is bounded by a partition + a batch, never the
  * full result set, and downstream consumption starts before the last
  * partition has even run. The per-partition jobs are the stream "blocks".
  * Selection queries (no global agg/sort) are exactly the reference's
  * streamable class; plans with a global ordering still deliver
  * incrementally but only after the sort completes (same constraint the
  * reference's non-selection reducers have). */
object StreamingReduce {

  /** Batched incremental fetch: lazily yields `batchSize`-row blocks. */
  def batches(df: DataFrame, batchSize: Int): Iterator[Seq[Row]] = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    df.toLocalIterator().asScala.grouped(batchSize)
  }

  /** Stream blocks to a consumer; returns rows delivered. The consumer
    * sees block k before block k+1's partitions are necessarily computed —
    * the backpressure shape of the reference's stream observer. */
  def foreachBatch(df: DataFrame, batchSize: Int)(f: Seq[Row] => Unit)
  : Long = {
    var n = 0L
    batches(df, batchSize).foreach { b => f(b); n += b.length }
    n
  }
}
