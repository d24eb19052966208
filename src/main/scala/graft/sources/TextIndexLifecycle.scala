package graft.sources

import graft.operators.HybridTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Incremental lifecycle for the persisted positional text index
  * ([[IndexedTable]] builds it once at open; a daily pipeline also needs
  * append / delete / compact — the reference rebuilds Lucene indexes per
  * sealed segment and drops them with the segment, so segment-granular
  * add/remove IS its lifecycle; here the index is one parquet postings
  * dir, so the lifecycle is file-granular with the same crash-safety
  * protocol as the IVF index ([[graft.operators.Similarity]]):
  *
  *  - **append**: tokenize ONLY the new batch (O(batch), never a corpus
  *    re-index), stage under a tag-scoped temp path, move files in under
  *    deterministic `tag-<batchTag>-` names (a replay sweeps partial
  *    moves of the same tag first), then write the marker — batchTag
  *    idempotent, crash-safe in either direction.
  *  - **delete**: tag-scoped tombstone parquet (overwrite mode — replays
  *    rewrite the same path); readers subtract with one broadcast
  *    anti-join, so deletes are visible immediately without a rewrite.
  *  - **compact**: rewrite the postings without tombstoned docs and
  *    merge the per-append file dust; staged copy + two-rename swap,
  *    [[recover]] completes an interrupted swap; re-running after
  *    success is a harmless rewrite. Append markers survive compaction
  *    so a pre-compaction batch replayed later still no-ops. */
object TextIndexLifecycle {

  def postingsDir(indexRoot: String, column: String): String =
    s"$indexRoot/text_$column"
  private def tagsDir(r: String, c: String) = s"$r/text_${c}_tags"
  private def tombsDir(r: String, c: String) = s"$r/text_${c}_tombstones"
  private def tmpDir(r: String, c: String) = s"$r/text_${c}_compact_tmp"
  private def retiringDir(r: String, c: String) = s"$r/text_${c}_retiring"
  private def stagingDir(r: String, c: String, tag: String) =
    s"$r/text_${c}_staging/$tag"

  /** Drop the whole index (all lifecycle dirs) — gate/test hygiene. */
  def deleteRoot(indexRoot: String): Unit = rmTree(indexRoot)

  private def rmTree(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val st = Files.walk(root)
      try st.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      finally st.close()
    }
  }

  /** Complete a compaction swap interrupted between its two renames. */
  private def recover(indexRoot: String, column: String): Unit = {
    val live = Paths.get(postingsDir(indexRoot, column))
    val tmp = Paths.get(tmpDir(indexRoot, column))
    val retiring = Paths.get(retiringDir(indexRoot, column))
    if (!Files.isDirectory(live) && Files.isDirectory(tmp)) {
      Files.move(tmp, live)
      rmTree(retiringDir(indexRoot, column))
      rmTree(tombsDir(indexRoot, column))
    } else if (Files.isDirectory(live) && Files.isDirectory(retiring)) {
      rmTree(retiringDir(indexRoot, column))
      rmTree(tombsDir(indexRoot, column))
    }
  }

  /** Append a document batch: tokenize the batch, stage, move in under
    * tag-prefixed names, mark. Replayed tags no-op. */
  def append(spark: SparkSession, indexRoot: String, column: String,
             idCol: String, batch: DataFrame, batchTag: String): Unit = {
    recover(indexRoot, column)
    val marker = new java.io.File(s"${tagsDir(indexRoot, column)}/$batchTag")
    if (marker.isFile) return
    val staging = stagingDir(indexRoot, column, batchTag)
    HybridTable.positionalTextIndex(batch, column, idCol)
      .write.mode("overwrite").parquet(staging)
    val liveRoot = Paths.get(postingsDir(indexRoot, column))
    Files.createDirectories(liveRoot)
    val prefix = s"tag-$batchTag-"
    // sweep a partial prior move of this tag, then move staged files in
    val old = Files.list(liveRoot)
    try old.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith(prefix))
      .foreach(Files.deleteIfExists(_))
    finally old.close()
    val st = Files.walk(Paths.get(staging))
    try st.iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.move(p, liveRoot.resolve(
        prefix + p.getFileName.toString), StandardCopyOption.REPLACE_EXISTING))
    finally st.close()
    marker.getParentFile.mkdirs()
    Files.write(marker.toPath, batchTag.getBytes("UTF-8"))
    rmTree(s"$indexRoot/text_${column}_staging")
  }

  /** Tombstone whole documents out of the index (tag-idempotent; visible
    * at [[load]] immediately; physical at [[compact]]). Re-adding a
    * deleted id requires a compact between delete and append. */
  def delete(spark: SparkSession, indexRoot: String, column: String,
             ids: DataFrame, idCol: String, batchTag: String): Unit = {
    recover(indexRoot, column)
    ids.select(col(idCol)).distinct().coalesce(1)
      .write.mode("overwrite")
      .parquet(s"${tombsDir(indexRoot, column)}/tag=$batchTag")
  }

  /** Live postings view: base + appended files minus tombstoned docs. */
  def load(spark: SparkSession, indexRoot: String, column: String,
           idCol: String): DataFrame = {
    recover(indexRoot, column)
    val all = spark.read.parquet(postingsDir(indexRoot, column))
    val tombs = new java.io.File(tombsDir(indexRoot, column))
    if (!tombs.isDirectory || tombs.listFiles().isEmpty) all
    else all.join(
      broadcast(spark.read.parquet(tombsDir(indexRoot, column))
        .select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")
  }

  /** Fold tombstones in and merge append dust; crash-safe two-rename
    * swap, replay-idempotent. */
  def compact(spark: SparkSession, indexRoot: String, column: String,
              idCol: String): Unit = {
    recover(indexRoot, column)
    val live = load(spark, indexRoot, column, idCol)
    live.write.mode("overwrite").parquet(tmpDir(indexRoot, column))
    rmTree(retiringDir(indexRoot, column)) // stale from a prior crash
    Files.move(Paths.get(postingsDir(indexRoot, column)),
      Paths.get(retiringDir(indexRoot, column)))
    Files.move(Paths.get(tmpDir(indexRoot, column)),
      Paths.get(postingsDir(indexRoot, column)))
    rmTree(retiringDir(indexRoot, column))
    rmTree(tombsDir(indexRoot, column))
  }
}
