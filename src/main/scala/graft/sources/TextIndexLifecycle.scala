package graft.sources

import graft.operators.HybridTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental lifecycle for the persisted positional text index
  * ([[IndexedTable]] builds it once at open; a daily pipeline also needs
  * append / delete / compact — the reference rebuilds Lucene indexes per
  * sealed segment and drops them with the segment, so segment-granular
  * add/remove IS its lifecycle; here the index is one parquet postings
  * dir, so the lifecycle is file-granular via the shared
  * [[IncrementalIndex]] protocol: O(batch) tag-idempotent crash-safe
  * appends, tombstone deletes visible at load, staged two-rename
  * compaction with interrupted-swap recovery). */
object TextIndexLifecycle {

  // postings are hive-partitioned by the token's tp prefix
  // ([[graft.operators.TextMatch.tpCol]], 16 values): an exact-term or
  // phrase probe prunes to its terms' partitions — the json index's
  // path-partition discipline applied to the text index. Wildcard/fuzzy
  // probes scan all 16 (they match unknown tokens), same as Lucene
  // walking the whole term dictionary.
  private def spec(indexRoot: String, column: String) =
    IncrementalIndex.Spec(indexRoot, s"text_$column",
      partitionCol = Some("tp"))

  def postingsDir(indexRoot: String, column: String): String =
    spec(indexRoot, column).liveDir

  /** Drop the whole index (all lifecycle dirs) — gate/test hygiene. */
  def deleteRoot(indexRoot: String): Unit = IncrementalIndex.rmTree(indexRoot)

  /** Append a document batch: tokenize ONLY the batch (O(batch), never a
    * corpus re-index), then the shared staged move. Replayed tags no-op. */
  def append(spark: SparkSession, indexRoot: String, column: String,
             idCol: String, batch: DataFrame, batchTag: String): Unit =
    IncrementalIndex.append(spark, spec(indexRoot, column),
      HybridTable.positionalTextIndex(batch, column, idCol)
        .withColumn("tp", graft.operators.TextMatch.tpCol(
          org.apache.spark.sql.functions.col("token"))), batchTag)

  /** Tombstone whole documents out of the index. */
  def delete(spark: SparkSession, indexRoot: String, column: String,
             ids: DataFrame, idCol: String, batchTag: String): Unit =
    IncrementalIndex.delete(spark, spec(indexRoot, column), ids, idCol,
      batchTag)

  /** Live postings view: base + appended files minus tombstoned docs. */
  def load(spark: SparkSession, indexRoot: String, column: String,
           idCol: String): DataFrame =
    IncrementalIndex.load(spark, spec(indexRoot, column), idCol)

  /** Fold tombstones in and merge append dust. */
  def compact(spark: SparkSession, indexRoot: String, column: String,
              idCol: String): Unit =
    IncrementalIndex.compact(spark, spec(indexRoot, column), idCol)
}
