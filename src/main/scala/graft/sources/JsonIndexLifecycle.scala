package graft.sources

import graft.operators.JsonIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Incremental lifecycle for the persisted json posting table
  * (`JsonIndex.materialize` writes it path-partitioned so a predicate
  * reads exactly one `path=` dir; reference: the json index is built at
  * ingest per segment, `pinot-segment-local/.../invertedindex/json/`).
  * Same [[IncrementalIndex]] protocol as the text and IVF indexes, with
  * the staged moves preserving the `path=` partition dirs so appended
  * batches keep the one-partition-per-predicate pruning property. */
object JsonIndexLifecycle {

  private def spec(indexRoot: String, column: String) =
    IncrementalIndex.Spec(indexRoot, s"json_$column",
      partitionCol = Some("path"))

  def postingsDir(indexRoot: String, column: String): String =
    spec(indexRoot, column).liveDir

  /** Drop the whole index (all lifecycle dirs) — gate/test hygiene. */
  def deleteRoot(indexRoot: String): Unit = IncrementalIndex.rmTree(indexRoot)

  /** Append a document batch: flatten ONLY the batch's json documents to
    * postings (O(batch)), staged move under the batch tag. Replays no-op. */
  def append(spark: SparkSession, indexRoot: String, column: String,
             idCol: String, schema: StructType, batch: DataFrame,
             batchTag: String): Unit =
    IncrementalIndex.append(spark, spec(indexRoot, column),
      JsonIndex.postings(batch, column, idCol, schema), batchTag)

  /** Tombstone whole documents out of the posting table. */
  def delete(spark: SparkSession, indexRoot: String, column: String,
             ids: DataFrame, idCol: String, batchTag: String): Unit =
    IncrementalIndex.delete(spark, spec(indexRoot, column), ids, idCol,
      batchTag)

  /** Live postings: base + appends minus tombstoned docs. */
  def load(spark: SparkSession, indexRoot: String, column: String,
           idCol: String): DataFrame =
    IncrementalIndex.load(spark, spec(indexRoot, column), idCol)

  /** Fold tombstones in and merge append dust per path partition. */
  def compact(spark: SparkSession, indexRoot: String, column: String,
              idCol: String): Unit =
    IncrementalIndex.compact(spark, spec(indexRoot, column), idCol)
}
