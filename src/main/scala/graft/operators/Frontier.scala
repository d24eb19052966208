package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted crawl-frontier ledger — the state of the continuous-crawl
  * LOOP between discovery ([[Sitemaps.discoverFrontier]], link
  * extraction, sitemap parses) and policy/scheduling
  * ([[Robots.frontierFilter]]/[[Robots.schedule]]): what has been seen,
  * what has been fetched, and therefore what to fetch next.
  *
  * Two append-only ledgers per frontier name, the LinkGraph edge-index
  * discipline: `discovered` holds (url, from_sitemap, from_link)
  * provenance PARTIALS (one row per sighting — OR-folded at read), and
  * `fetched` holds fetch receipts. Appends are O(batch) and
  * tag-idempotent (an at-least-once replay of a committed tag no-ops);
  * the accumulated state is never read on the ingest path. The PENDING
  * frontier — distinct discoveries minus fetch receipts — is computed
  * at read time by the periodic scheduling pass, exactly like
  * [[LinkGraph.loadEdges]] feeds the periodic re-rank. */
object Frontier {

  private def spec(spark: org.apache.spark.sql.SparkSession,
                   name: String, sub: String)
  : graft.sources.IncrementalIndex.Spec = {
    require(name.matches("[A-Za-z0-9_]+"), s"bad frontier name: $name")
    graft.sources.IncrementalIndex.Spec(
      s"/tmp/graft-warehouse/apps/" +
        s"${spark.sparkContext.applicationId}/frontier_idx",
      s"${name}_$sub", None)
  }

  /** Append one batch of discovery sightings: `urls` carries `urlCol`
    * plus boolean `from_sitemap`/`from_link` provenance columns
    * (seed/self sightings pass false/false). Partials — duplicates
    * across batches are expected and fold at [[pending]] time. */
  def appendDiscovered(spark: org.apache.spark.sql.SparkSession,
                       urls: DataFrame, urlCol: String, name: String,
                       batchTag: String): Unit =
    graft.sources.IncrementalIndex.append(spark, spec(spark, name, "disc"),
      urls.select(col(urlCol).as("url"),
        col("from_sitemap").cast("boolean"),
        col("from_link").cast("boolean")),
      batchTag)

  /** Append one batch of fetch receipts. */
  def appendFetched(spark: org.apache.spark.sql.SparkSession,
                    urls: DataFrame, urlCol: String, name: String,
                    batchTag: String): Unit =
    graft.sources.IncrementalIndex.append(spark, spec(spark, name, "fet"),
      urls.select(col(urlCol).as("url")), batchTag)

  /** The pending frontier: every url sighted but not yet fetched, with
    * OR-folded provenance — (url, from_sitemap, from_link). One keyed
    * agg over the discovery partials + one anti-join on fetch receipts
    * (ids only ship). Feed to [[Robots.frontierFilter]] /
    * [[Robots.schedule]] for the next fetch round. */
  def pending(spark: org.apache.spark.sql.SparkSession, name: String)
  : DataFrame = {
    val disc = graft.sources.IncrementalIndex
      .load(spark, spec(spark, name, "disc"), "url")
      .groupBy(col("url"))
      .agg(max(col("from_sitemap")).as("from_sitemap"),
        max(col("from_link")).as("from_link"))
    val fetched = graft.sources.IncrementalIndex
      .load(spark, spec(spark, name, "fet"), "url")
      .select(col("url")).distinct()
    disc.join(fetched, Seq("url"), "left_anti")
  }

  /** Raw discovery partials (pre-fold) — spec hook for pinning the
    * replay no-op, which [[pending]]'s OR-fold would otherwise hide. */
  private[graft] def discoveredPartials(
      spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    graft.sources.IncrementalIndex.load(spark, spec(spark, name, "disc"),
      "url")

  /** Has this batch tag already committed to the discovery ledger? */
  def hasDiscoveredTag(spark: org.apache.spark.sql.SparkSession,
                       name: String, batchTag: String): Boolean =
    graft.sources.IncrementalIndex.hasTag(spec(spark, name, "disc"),
      batchTag)

  // ----- changed-only re-processing (revisit-fetch economics) -----

  /** Latest recorded content hash per url: (url → __ph); empty before
    * the first append (every first-batch url is "never seen"). */
  private def latestHashes(spark: org.apache.spark.sql.SparkSession,
                           name: String): DataFrame = {
    val sp = spec(spark, name, "chg")
    if (!new java.io.File(sp.liveDir).isDirectory) {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("__pu", "__ph")
    } else graft.sources.IncrementalIndex.load(spark, sp, "url")
      .groupBy(col("url"))
      .agg(max(struct(col("seq"), col("h"))).as("__last"))
      .select(col("url").as("__pu"), col("__last")("h").as("__ph"))
  }

  /** CHANGED-ONLY gate for revisit fetches — the re-processing
    * economics of a continuous crawl: a revisit re-downloads the page,
    * but unchanged content must not re-enter curation (at 100 TB the
    * curation cost dwarfs the fetch). A per-frontier ledger records
    * the latest content hash per url (append-only partials, latest =
    * max (seq, hash)); this filters the batch to rows whose hash
    * differs from the recorded latest (urls never seen pass), then
    * advances the ledger with the CHANGED rows only — an unchanged
    * row's recorded latest already equals its content, so the ledger
    * stays both correct and small. Tag-idempotent with the natural
    * at-least-once semantics: a REPLAY of a committed batch returns NO
    * new work (its hashes are already the recorded latest) and
    * appends nothing — exactly what a restarted pipeline wants.
    * `batchSeq` must be monotone per frontier (one batch per seq). */
  def changedOnly(spark: org.apache.spark.sql.SparkSession,
                  batch: DataFrame, urlCol: String, contentCol: String,
                  name: String, batchSeq: Long, batchTag: String)
  : DataFrame = {
    val withH = batch.withColumn("__h",
      graft.functions.Scalars.hash60(col(contentCol)))
    val changed = Checkpoints.eager(
      withH.join(latestHashes(spark, name),
          col(urlCol) === col("__pu"), "left")
        .filter(col("__pu").isNull || col("__h") =!= col("__ph"))
        .drop("__pu", "__ph"))
    graft.sources.IncrementalIndex.append(spark, spec(spark, name, "chg"),
      changed.select(col(urlCol).as("url"), col("__h").as("h"),
        lit(batchSeq).as("seq")),
      batchTag)
    changed.drop("__h")
  }

  def dropChangeLedger(spark: org.apache.spark.sql.SparkSession,
                       name: String): Unit =
    graft.sources.IncrementalIndex.drop(spec(spark, name, "chg"))

  /** sitemaps.org changefreq → revisit interval (ms). `always` = 0,
    * `never` = no interval (revisits only on a newer lastmod). */
  private val ChangefreqMs: Seq[(String, Long)] = Seq(
    "always" -> 0L, "hourly" -> 3600000L, "daily" -> 86400000L,
    "weekly" -> 604800000L, "monthly" -> 2592000000L,
    "yearly" -> 31536000000L)

  /** REVISIT scheduling — the third phase of the crawl lifecycle
    * (discover → fetch → refresh): which fetched urls are due for
    * refetch at `nowMs`, from fetch receipts and the sitemap's change
    * metadata ([[Sitemaps.urls]] output). Due when
    *
    *   (a) the declared lastmod is NEWER than the stored fetch — the
    *       site says it changed, due regardless of interval; or
    *   (b) the changefreq interval has elapsed since the fetch
    *       (`never` has no interval; absent changefreq falls back to
    *       `defaultIntervalMs`).
    *
    * Output = the due rows with `host`, protocol-default-coalesced
    * `priority` (0.5), `staleness_ms` (= now − fetched_at), and
    * `revisit_rank` — the per-host fetch-queue position (priority
    * desc, staleness desc, url; per-host because the queue IS
    * per-host under politeness — the [[Robots.schedule]] partition).
    * One equi-join on url + one per-host window; all arithmetic is
    * integer-ms, oracle-replayable. */
  def revisitDue(fetched: DataFrame, urlCol: String, fetchedAtCol: String,
                 meta: DataFrame, locCol: String, nowMs: Long,
                 defaultIntervalMs: Long = 86400000L): DataFrame = {
    val m = meta.select(col(locCol).as("__mu"),
      col("lastmod_date").as("__lm"), col("changefreq").as("__cf"),
      col("priority").as("__pr"))
    val interval = ChangefreqMs.foldLeft(
      when(col("__cf").isNull, lit(defaultIntervalMs))) {
        case (e, (k, v)) => e.when(col("__cf") === k, lit(v))
      } // 'never' and unknown values fall through to null = no interval
    val lastmodMs = col("__lm").cast("timestamp").cast("long") * 1000
    val freshDue = coalesce(lastmodMs > col(fetchedAtCol), lit(false))
    val due = fetched
      .join(m, col(urlCol) === col("__mu"), "left")
      .withColumn("__iv", interval)
      .filter(freshDue ||
        coalesce(col(fetchedAtCol) + col("__iv") <= nowMs, lit(false)))
      .withColumn("host", lower(regexp_extract(col(urlCol),
        "(?i)^https?://([^/:?#]+)", 1)))
      .withColumn("priority",
        coalesce(col("__pr").cast("double"), lit(0.5)))
      .withColumn("staleness_ms", lit(nowMs) - col(fetchedAtCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("priority").desc, col("staleness_ms").desc,
        col(urlCol))
    due.withColumn("revisit_rank",
        (row_number().over(w)).cast("long"))
      .drop("__mu", "__lm", "__cf", "__pr", "__iv")
  }

  def drop(spark: org.apache.spark.sql.SparkSession, name: String): Unit = {
    graft.sources.IncrementalIndex.drop(spec(spark, name, "disc"))
    graft.sources.IncrementalIndex.drop(spec(spark, name, "fet"))
  }
}
