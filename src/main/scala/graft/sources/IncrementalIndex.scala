package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Shared crash-safe incremental lifecycle for parquet-backed index
  * directories — the one protocol behind the IVF, text-postings, and
  * json-postings lifecycles:
  *
  *  - **append**: stage the batch's rows under a tag-scoped temp dir,
  *    move files into the live dir under deterministic
  *    `tag-<batchTag>-` names preserving any partition subdirs (a replay
  *    first sweeps partial moves of the same tag), then write the
  *    marker. Tag-idempotent; crash-safe in either direction.
  *  - **delete**: tag-scoped tombstone parquet of ids (overwrite mode —
  *    replays rewrite the same path); [[load]] subtracts them with one
  *    broadcast anti-join so deletes are visible without a rewrite.
  *  - **compact**: rewrite live-minus-tombstones to a staged copy, then
  *    a two-rename swap; [[recover]] (called from every entry point)
  *    completes a swap interrupted between the renames. Re-running
  *    compact after success is a harmless rewrite; append markers
  *    survive compaction so pre-compaction batches replayed later still
  *    no-op. */
object IncrementalIndex {

  /** Directory layout + partitioning of one incremental index. All dirs
    * are siblings derived from (root, name); `partitionCol` is the
    * hive-style partition column of the live parquet (None = flat).
    * `migrate`, when set, derives the partition column from a legacy
    * FLAT live dir written before the spec declared `partitionCol`
    * (e.g. the text postings gained `tp` in round 12): every entry
    * point detects the flat layout and rewrites it once via the staged
    * two-rename swap, so old roots keep working and a partitioned
    * append can never interleave `col=value` subdirs with flat files
    * (which would break parquet partition discovery for good). */
  final case class Spec(root: String, name: String,
                        partitionCol: Option[String],
                        migrate: Option[DataFrame => DataFrame] = None) {
    def liveDir: String = s"$root/$name"
    def tagsDir: String = s"$root/${name}_tags"
    def tombsDir: String = s"$root/${name}_tombstones"
    def tmpDir: String = s"$root/${name}_compact_tmp"
    def retiringDir: String = s"$root/${name}_retiring"
    def stagingRoot: String = s"$root/${name}_staging"
  }

  def rmTree(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val st = Files.walk(root)
      try st.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      finally st.close()
    }
  }

  /** Complete a compaction swap interrupted between its two renames. */
  def recover(s: Spec): Unit = {
    val live = Paths.get(s.liveDir)
    val tmp = Paths.get(s.tmpDir)
    val retiring = Paths.get(s.retiringDir)
    // tombstones are removed BEFORE the retiring dir in both branches:
    // the retiring dir's presence must cover the whole cleanup window,
    // else a crash between the two rmTrees leaves stale tombstones that
    // no recover() branch cleans and load() silently filters re-appended
    // ids forever.
    if (!Files.isDirectory(live) && Files.isDirectory(tmp)) {
      Files.move(tmp, live)
      rmTree(s.tombsDir)
      rmTree(s.retiringDir)
    } else if (Files.isDirectory(live) && Files.isDirectory(retiring)) {
      rmTree(s.tombsDir)
      rmTree(s.retiringDir)
    }
  }

  // ---- legacy flat-layout migration ----------------------------------

  /** Top-level data files of the live dir. Under a declared
    * `partitionCol` the staged moves only ever place parquet inside
    * `col=value` subdirs, so any top-level parquet file marks a legacy
    * flat layout written before the spec was partitioned. */
  private def topLevelParquet(s: Spec): Seq[Path] = {
    val root = Paths.get(s.liveDir)
    if (!Files.isDirectory(root)) Nil
    else {
      val ls = Files.list(root)
      try ls.iterator().asScala.toSeq.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      finally ls.close()
    }
  }

  private def hasPartitionSubdirs(s: Spec): Boolean =
    s.partitionCol.exists { c =>
      val root = Paths.get(s.liveDir)
      Files.isDirectory(root) && {
        val ls = Files.list(root)
        try ls.iterator().asScala.exists(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"$c="))
        finally ls.close()
      }
    }

  /** One-time rewrite of a pre-partitioning flat live dir into the
    * spec's declared layout — called from every entry point, no-op on
    * a current layout. Folds pending tombstones like [[compact]] (the
    * tombstone parquet's single column IS the id column), then swaps
    * via the same staged two-rename protocol, so a crash anywhere is
    * healed by [[recover]]. Append markers survive: replays of
    * pre-migration tags still no-op. */
  private def migrateLegacy(spark: SparkSession, s: Spec): Unit = {
    if (s.partitionCol.isEmpty) return
    val flat = topLevelParquet(s)
    if (flat.isEmpty) return
    require(!hasPartitionSubdirs(s),
      s"${s.liveDir}: mixed flat + ${s.partitionCol.get}= layout — a " +
        "partitioned append ran against a legacy flat dir with " +
        "pre-migration code; restore from the flat layout and re-append")
    val m = s.migrate.getOrElse(throw new IllegalStateException(
      s"${s.liveDir} has a legacy flat layout but the spec declares " +
        s"partitionCol=${s.partitionCol.get} and no migrate function"))
    val base = spark.read.parquet(s.liveDir)
    val tombs = new java.io.File(s.tombsDir)
    val live =
      if (!tombs.isDirectory || tombs.listFiles().isEmpty) base
      else {
        val t = spark.read.parquet(s.tombsDir)
        val idCol = t.columns.head
        base.join(broadcast(t.select(col(idCol)).distinct()),
          Seq(idCol), "left_anti")
      }
    swapIn(spark, s, m(live))
  }

  /** Append `rows` (already in index schema) under `batchTag`. */
  def append(spark: SparkSession, s: Spec, rows: DataFrame,
             batchTag: String): Unit =
    if (stage(spark, s, rows, batchTag).isDefined)
      commitStaged(s, batchTag)

  /** Phase 1 of [[append]]: write the batch under the tag-scoped staging
    * dir and return its path, or None when the tag already committed.
    * Callers that derive a SECOND index from the same rows (e.g. the
    * text vocab sidecar from its postings) read the staged parquet back
    * instead of recomputing the batch transform — one pass over the
    * expensive job, two sinks — then [[commitStaged]] finishes the move.
    * Nothing is visible to [[load]] until commit; an uncommitted staging
    * dir is swept by the next append's replay or [[drop]]. */
  def stage(spark: SparkSession, s: Spec, rows: DataFrame,
            batchTag: String): Option[String] = {
    recover(s)
    if (new java.io.File(s"${s.tagsDir}/$batchTag").isFile) return None
    migrateLegacy(spark, s)
    val staging = s"${s.stagingRoot}/$batchTag"
    // co-locate each partition value's rows into one task before the
    // partitioned write: without this, every (task, partition-value)
    // pair emits its own file — a 32-task batch over 256 values could
    // stage thousands of one-row files, and probe-side listing cost
    // compounds per append. With it, one file per value per append.
    // (Optimization round 19 measured a coalesce(1) alternative for
    // small batches and REVERTED it: coalesce collapses the upstream
    // computation — including a lazily-checkpointed survivor frame —
    // into one task, serializing the whole protocol; the exchange's
    // map side keeps the batch transform parallel.)
    val staged = s.partitionCol.fold(rows)(c => rows.repartition(col(c)))
    val writer = staged.write.mode("overwrite")
    s.partitionCol.fold(writer)(c => writer.partitionBy(c)).parquet(staging)
    Some(staging)
  }

  /** Phase 2 of [[append]]: move the staged parquet files into the live
    * dir under deterministic `tag-` names (sweeping any partial prior
    * move of the same tag first), write the marker, clear staging. */
  def commitStaged(s: Spec, batchTag: String): Unit = {
    val liveRoot = Paths.get(s.liveDir)
    Files.createDirectories(liveRoot)
    val prefix = s"tag-$batchTag-"
    // sweep a partial prior move of this tag (any depth), then move the
    // staged parquet files in, preserving partition subdirs
    val sweep = Files.walk(liveRoot)
    try sweep.iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.startsWith(prefix))
      .foreach(Files.deleteIfExists(_))
    finally sweep.close()
    val stagingPath = Paths.get(s"${s.stagingRoot}/$batchTag")
    val st = Files.walk(stagingPath)
    try st.iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        val rel: Path = stagingPath.relativize(p.getParent)
        val dst = liveRoot.resolve(rel)
        Files.createDirectories(dst)
        Files.move(p, dst.resolve(prefix + p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
      }
    finally st.close()
    val marker = new java.io.File(s"${s.tagsDir}/$batchTag")
    marker.getParentFile.mkdirs()
    Files.write(marker.toPath, batchTag.getBytes("UTF-8"))
    rmTree(s.stagingRoot)
  }

  /** Tombstone ids (tag-idempotent; visible at [[load]]; physical at
    * [[compact]]). Re-adding a deleted id requires a compact first. */
  def delete(spark: SparkSession, s: Spec, ids: DataFrame,
             idCol: String, batchTag: String): Unit = {
    recover(s)
    ids.select(col(idCol)).distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"${s.tombsDir}/tag=$batchTag")
  }

  /** Live rows: base + appends minus tombstoned ids. `prune`, when set,
    * filters immediately over the scan — a predicate on `partitionCol`
    * becomes hive-style DIRECTORY pruning (only the matching `col=value`
    * subdirs are listed and read), the lever that keeps an incremental
    * probe from re-reading the whole accumulated index. `mergeSchema`
    * unions the footers' schemas instead of sampling one file — set it
    * when the index's schema has EVOLVED (columns added by later
    * appends), otherwise column visibility depends on file-listing
    * order (ADVICE r16). */
  def load(spark: SparkSession, s: Spec, idCol: String,
           prune: Option[org.apache.spark.sql.Column] = None,
           mergeSchema: Boolean = false): DataFrame = {
    recover(s)
    migrateLegacy(spark, s)
    val base = spark.read
      .option("mergeSchema", mergeSchema.toString).parquet(s.liveDir)
    val all = prune.fold(base)(base.filter)
    val tombs = new java.io.File(s.tombsDir)
    if (!tombs.isDirectory || tombs.listFiles().isEmpty) all
    else all.join(
      broadcast(spark.read.parquet(s.tombsDir).select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")
  }

  /** Has `batchTag`'s append already committed? O(1) marker-file check —
    * the probe-side twin of [[append]]'s idempotency. */
  def hasTag(s: Spec, batchTag: String): Boolean =
    new java.io.File(s"${s.tagsDir}/$batchTag").isFile

  /** All committed batch tags. */
  def tags(s: Spec): Set[String] =
    Option(new java.io.File(s.tagsDir).listFiles()).toSeq.flatten
      .filter(_.isFile).map(_.getName).toSet

  /** Commit a marker WITHOUT data — for derived indexes whose rows for
    * `batchTag` landed under another tag (e.g. a combined lazy fold) or
    * whose batch was empty. Idempotent like [[append]]'s marker. */
  def markTag(s: Spec, batchTag: String): Unit = {
    val marker = new java.io.File(s"${s.tagsDir}/$batchTag")
    marker.getParentFile.mkdirs()
    Files.write(marker.toPath, batchTag.getBytes("UTF-8"))
  }

  /** Live-dir parquet files belonging to `batchTag`'s append (any
    * partition depth). Empty after a compaction has folded the tag's
    * rows into plain `part-` files — callers using per-tag files must
    * handle that window (see TextIndexLifecycle's vocab fold). */
  def tagFiles(s: Spec, batchTag: String): Seq[String] = {
    val root = Paths.get(s.liveDir)
    if (!Files.isDirectory(root)) Nil
    else {
      val prefix = s"tag-$batchTag-"
      val st = Files.walk(root)
      try st.iterator().asScala.toSeq
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith(prefix))
        .map(_.toString)
      finally st.close()
    }
  }

  /** Does the index hold any DATA on disk? Requires at least one parquet
    * file, not just the directory: an empty-batch append creates the
    * live dir with zero files (its marker still commits, so replays
    * no-op), and a later probe must treat that as "no index yet" — a
    * bare spark.read.parquet on a fileless dir fails schema inference. */
  def exists(s: Spec): Boolean = {
    val root = Paths.get(s.liveDir)
    Files.isDirectory(root) && {
      val st = Files.walk(root)
      try st.iterator().asScala.exists(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      finally st.close()
    }
  }

  /** Remove the whole index: live dir, markers, tombstones, and any
    * in-flight staging/compaction state. */
  def drop(s: Spec): Unit =
    Seq(s.liveDir, s.tagsDir, s.tombsDir, s.tmpDir, s.retiringDir,
      s.stagingRoot).foreach(rmTree)

  /** Any pending work for [[compact]] to fold? Tombstones, append dust
    * (files carrying a `tag-` prefix — [[swapIn]]'s rewrite emits plain
    * `part-` names, so a freshly compacted dir has none), or a legacy
    * flat layout awaiting migration. */
  private def hasPendingWork(s: Spec): Boolean = {
    val tombs = new java.io.File(s.tombsDir)
    if (tombs.isDirectory && tombs.listFiles().nonEmpty) return true
    if (s.partitionCol.isDefined && topLevelParquet(s).nonEmpty) return true
    val root = Paths.get(s.liveDir)
    Files.isDirectory(root) && {
      val st = Files.walk(root)
      try st.iterator().asScala.exists(p => Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("tag-"))
      finally st.close()
    }
  }

  /** Fold tombstones in + merge append dust; crash-safe, replayable.
    * `transform` rewrites the folded rows on the way out (e.g. the text
    * vocab's cross-append duplicate fold) — it must preserve the index
    * schema including `partitionCol`. A replay against an already-
    * compacted dir (no tombstones, no `tag-` append files, no legacy
    * layout) no-ops at file-listing cost instead of rewriting the whole
    * index — the idempotence the protocol promises, at the price it
    * implies. */
  def compact(spark: SparkSession, s: Spec, idCol: String,
              transform: DataFrame => DataFrame = identity): Unit = {
    recover(s)
    if (!exists(s)) return // marker-only (empty-batch) index: no data to fold
    if (!hasPendingWork(s)) return // replay after success: nothing to fold
    swapIn(spark, s, transform(load(spark, s, idCol)))
  }

  /** Staged rewrite + two-rename swap of the live dir — the crash-safe
    * tail shared by [[compact]] and [[migrateLegacy]]. Tombstones must
    * already be folded into `rows`; the swap clears them. */
  private def swapIn(spark: SparkSession, s: Spec, rows: DataFrame): Unit = {
    // one file per partition value after the rewrite (see append)
    val staged = s.partitionCol.fold(rows)(c => rows.repartition(col(c)))
    val writer = staged.write.mode("overwrite")
    s.partitionCol.fold(writer)(c => writer.partitionBy(c)).parquet(s.tmpDir)
    rmTree(s.retiringDir) // stale from a prior crashed run
    Files.move(Paths.get(s.liveDir), Paths.get(s.retiringDir))
    Files.move(Paths.get(s.tmpDir), Paths.get(s.liveDir))
    // tombstones before retiring dir — see recover() for the crash-window
    // reasoning; retiringDir's presence keys the cleanup branch.
    rmTree(s.tombsDir)
    rmTree(s.retiringDir)
  }
}
