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
  // pre-round-12 roots hold FLAT postings (no tp column); the migrate
  // hook derives it so the shared protocol rewrites such a root once
  // instead of corrupting it with a mixed layout on the next append
  private def addTp(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("tp", graft.operators.TextMatch.tpCol(col("token")))
  }

  private def spec(indexRoot: String, column: String) =
    IncrementalIndex.Spec(indexRoot, s"text_$column",
      partitionCol = Some("tp"), migrate = Some(addTp))

  // Lucene's term dictionary alongside the postings: one (token, tp) row
  // per DISTINCT batch token, append-only on the same tag protocol.
  // Dictionary-shaped probes (prefix/wildcard/fuzzy) resolve candidate
  // tokens here — |vocab| ≪ |postings| — then semi-join the postings.
  // Deletes deliberately do NOT touch the vocab: an over-claiming
  // dictionary is still CORRECT (a retired token's candidates simply
  // find no postings rows in the semi-join), which is what makes the
  // maintenance O(batch) instead of O(corpus). loadVocab distincts at
  // read, so cross-append duplicates cost space (folded by compact's
  // file merge), never correctness.
  private def vocabSpec(indexRoot: String, column: String) =
    IncrementalIndex.Spec(indexRoot, s"text_${column}_vocab",
      partitionCol = Some("tp"), migrate = Some(addTp))

  def postingsDir(indexRoot: String, column: String): String =
    spec(indexRoot, column).liveDir

  /** Drop the whole index (all lifecycle dirs) — gate/test hygiene. */
  def deleteRoot(indexRoot: String): Unit = IncrementalIndex.rmTree(indexRoot)

  /** Append a document batch: tokenize ONLY the batch (O(batch), never a
    * corpus re-index), then the shared staged move. Replayed tags no-op. */
  def append(spark: SparkSession, indexRoot: String, column: String,
             idCol: String, batch: DataFrame, batchTag: String): Unit = {
    import org.apache.spark.sql.functions.col
    val postings = addTp(HybridTable.positionalTextIndex(batch, column, idCol))
    // vocab FIRST: a crash between the two appends then leaves an
    // OVER-claiming dictionary (extra candidates that find no postings
    // in the semi-join — correct), where postings-first would leave an
    // UNDER-claiming one that silently drops the batch's docs from
    // dictionary-shaped probes until the tag is replayed
    IncrementalIndex.append(spark, vocabSpec(indexRoot, column),
      postings.select(col("token"), col("tp")).distinct(), batchTag)
    IncrementalIndex.append(spark, spec(indexRoot, column), postings,
      batchTag)
  }

  /** The persisted term dictionary (distinct at read — see
    * [[vocabSpec]]); None for a pre-dictionary index layout. */
  def loadVocab(spark: SparkSession, indexRoot: String, column: String)
  : Option[DataFrame] = {
    val vs = vocabSpec(indexRoot, column)
    // heal an interrupted compaction swap BEFORE the exists probe: a
    // crash between its two renames leaves no live dir (only tmp), and
    // a bare exists() would misread that as "no dictionary" forever
    IncrementalIndex.recover(vs)
    if (!IncrementalIndex.exists(vs)) None
    else Some(IncrementalIndex.load(spark, vs, "token").distinct())
  }

  /** Tombstone whole documents out of the index. */
  def delete(spark: SparkSession, indexRoot: String, column: String,
             ids: DataFrame, idCol: String, batchTag: String): Unit =
    IncrementalIndex.delete(spark, spec(indexRoot, column), ids, idCol,
      batchTag)

  /** Live postings view: base + appended files minus tombstoned docs. */
  def load(spark: SparkSession, indexRoot: String, column: String,
           idCol: String): DataFrame =
    IncrementalIndex.load(spark, spec(indexRoot, column), idCol)

  /** Fold tombstones in and merge append dust — the vocab's compaction
    * also folds its cross-append duplicate (token, tp) rows (load
    * distincts at read, so the rewrite lands deduplicated). */
  def compact(spark: SparkSession, indexRoot: String, column: String,
              idCol: String): Unit = {
    IncrementalIndex.compact(spark, spec(indexRoot, column), idCol)
    // the vocab rides the same protocol with a dedup transform (plain
    // compact rewrites rows as-is, which would keep the cross-append
    // duplicates) — recover-on-entry and the staged swap come with it
    IncrementalIndex.compact(spark, vocabSpec(indexRoot, column), "token",
      transform = _.distinct())
  }
}
