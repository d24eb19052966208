package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) table layout — the Spark analog of the reference's
  * partitioned-replica-group routing (`SegmentPartitionConfig`,
  * `pinot-core/.../routing/segmentpruner/PartitionSegmentPruner`): data is
  * pre-hashed into a fixed number of buckets on the join/agg key at WRITE
  * time, so every later equi-join or groupBy on that key reads co-located
  * buckets and skips the shuffle entirely.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and shuffling it once at ingest: a bucketed scan feeds
  * SortMergeJoin with NO Exchange on either side (verified by spec), which
  * is the single biggest plan win available for repeated large-table joins.
  *
  * Tables are registered in an explicit-location database so the layout is
  * independent of the session's warehouse configuration; [[bucketed]] is
  * build-once per (table, source-path) within a session. The sandbox
  * catalog is in-memory, so a NEW session can't resolve last session's
  * entries — stale locations are detected and rebuilt (on a real cluster
  * a persistent metastore makes build-once durable; the layout mechanics
  * are identical).
  */
object Bucketing {

  private val DbName = "graft_bucketed"

  /** Warehouse location scoped by the Spark APPLICATION id: two concurrent
    * sessions (parallel test runs, bench + tests) writing the same
    * table/index names get disjoint directories instead of deleting each
    * other's live data. The layout dies with the app, like the in-memory
    * catalog that names it (a real cluster swaps in a persistent metastore
    * + durable warehouse path; the mechanics are identical). */
  private def dbLocation(spark: SparkSession): String =
    s"/tmp/graft-warehouse/apps/${spark.sparkContext.applicationId}/$DbName"

  private def ensureDb(spark: SparkSession): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $DbName " +
      s"LOCATION '${dbLocation(spark)}'")

  /** Delete a table's on-disk location. The catalog is in-memory, so a
    * dropped-then-recreated table within one session must not hit
    * LOCATION_ALREADY_EXISTS on the old files. */
  private def cleanStaleLocation(spark: SparkSession, table: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(
      s"${dbLocation(spark)}/${table.stripPrefix(s"$DbName.")}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  /** Stable suffix: 64-bit fold of the source/key/bucket spec. */
  private def tag(src: String): String =
    java.lang.Long.toHexString(
      src.foldLeft(1125899906842597L)((h, c) => 31 * h + c))

  /** Write `df` as a bucketed+sorted table on `key` (build-once: if the
    * table already exists for this exact frame it is reused) and return
    * it as a DataFrame whose scan carries the bucket layout. The
    * build-once key folds the frame's analyzed-plan semanticHash, so two
    * call sites reusing a logical `name` with different projections get
    * distinct physical tables instead of silently sharing the first
    * caller's schema. */
  def bucketed(spark: SparkSession, df: DataFrame, name: String, src: String,
               key: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    ensureDb(spark)
    val sem = df.queryExecution.analyzed.semanticHash()
    val table = s"$DbName.${name}_${tag(s"$src:$key:$buckets:$sem")}"
    if (!spark.catalog.tableExists(table)) {
      cleanStaleLocation(spark, table) // same-session drop/recreate
      df.write.bucketBy(buckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(table)
    }
    spark.table(table)
  }

  /** Equi-join two same-bucketed tables on their bucket key. The MERGE hint
    * pins SortMergeJoin (broadcast would mask the layout win at test scale);
    * with both sides bucketed identically Spark plans it with zero Exchange
    * — the co-located join. */
  def coLocatedJoin(left: DataFrame, right: DataFrame, key: String)
  : DataFrame =
    left.hint("MERGE").join(right.hint("MERGE"), Seq(key))

  /** Fully-qualified table name for a named auxiliary index (e.g. the
    * incremental-dedup hash index), created in the bucketed database. */
  def indexTable(spark: SparkSession, name: String): String = {
    require(name.matches("[A-Za-z0-9_]+"), s"bad index name: $name")
    ensureDb(spark)
    val table = s"$DbName.idx_$name"
    // a location left by a previous session (whose catalog entry died with
    // it) would fail this session's first saveAsTable
    if (!spark.catalog.tableExists(table)) cleanStaleLocation(spark, table)
    table
  }

  /** Drop a table AND its files (the catalog alone is session-scoped). */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    cleanStaleLocation(spark, table)
  }

  /** Drop the bucketed-table database (test hygiene). */
  def reset(spark: SparkSession): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $DbName CASCADE")
}
