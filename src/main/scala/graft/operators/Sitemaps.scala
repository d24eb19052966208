package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol — the URL-discovery channel
  * robots.txt declares via `Sitemap:` lines; a crawl-extending pipeline
  * unions these with link-extracted URLs to build its frontier).
  *
  * The XML subset is parsed with the same explicit-regex discipline as
  * the HTML tier (regexes the DuckDB oracle replays verbatim; a
  * namespace-aware XML parser is deliberately NOT the contract — real
  * sitemaps in the wild are exactly this flat shape). `<loc>` values
  * entity-decode with the one-decode rule (`&amp;` last, the
  * [[graft.functions.Html.decodeEntities]] semantics — sitemap locs
  * are required to XML-escape `&`). Everything is a pure projection +
  * explode: one scan, zero shuffle. */
object Sitemaps {

  private def blockField(block: Column, tag: String): Column =
    regexp_extract(block,
      s"(?is)<$tag[^>]*>([^<]*)</$tag[ \t\n\r]*>", 1)

  private def decodedLoc(block: Column): Column =
    graft.functions.Html.decodeEntities(
      trim(blockField(block, "loc"), " \t\n\r"))

  /** One row per `<url>` entry of a `<urlset>` sitemap:
    * (…passthrough…, loc, lastmod_date, changefreq, priority).
    * Absent/blank/unparseable optional fields are null: `lastmod`
    * parses its W3C-datetime DATE prefix, `priority` is an exact
    * decimal(2,1) in [0,1] per the protocol. `keep` lists passthrough
    * columns (e.g. the host the sitemap was fetched from). */
  def urls(sitemapDocs: DataFrame, xmlCol: String,
           keep: Seq[String] = Nil): DataFrame = {
    val block = col("__b")
    sitemapDocs
      .select(keep.map(col) :+ explode(regexp_extract_all(col(xmlCol),
        lit("(?is)<url[ \t\n\r]*>.*?</url[ \t\n\r]*>"), lit(0)))
        .as("__b"): _*)
      .select(keep.map(col) ++ Seq(
        decodedLoc(block).as("loc"),
        blockField(block, "lastmod").as("__lm"),
        lower(trim(blockField(block, "changefreq"), " \t\n\r"))
          .as("__cf"),
        blockField(block, "priority").as("__pr")): _*)
      .filter(length(col("loc")) > 0)
      .select(keep.map(col) ++ Seq(
        col("loc"),
        expr("try_to_date(substring(__lm, 1, 10))").as("lastmod_date"),
        when(length(col("__cf")) > 0, col("__cf")).as("changefreq"),
        expr("try_cast(__pr as decimal(2,1))").as("priority")): _*)
  }

  /** Child sitemap locations of a `<sitemapindex>` document (one
    * recursion level — the index tier; callers re-fetch and re-parse
    * children with [[urls]]). */
  def indexLocs(sitemapDocs: DataFrame, xmlCol: String,
                keep: Seq[String] = Nil): DataFrame = {
    val block = col("__b")
    sitemapDocs
      .select(keep.map(col) :+ explode(regexp_extract_all(col(xmlCol),
        lit("(?is)<sitemap[ \t\n\r]*>.*?</sitemap[ \t\n\r]*>"), lit(0)))
        .as("__b"): _*)
      .select(keep.map(col) :+ decodedLoc(block).as("loc"): _*)
      .filter(length(col("loc")) > 0)
  }

  /** Frontier discovery capstone: sitemap-declared URLs ∪
    * link-extracted absolute URLs, deduplicated with per-source
    * provenance flags — the input a crawl scheduler feeds to
    * [[Robots.frontierFilter]]. One union + one keyed agg. */
  def discoverFrontier(sitemapUrls: DataFrame, locCol: String,
                       crawlPages: DataFrame, htmlCol: String)
  : DataFrame = {
    val links = crawlPages
      .select(explode(graft.operators.LinkGraph.anchorHrefs(
        col(htmlCol))).as("url"))
      .filter(col("url").rlike("(?i)^https?://"))
      .select(col("url"), lit(false).as("from_sitemap"),
        lit(true).as("from_link"))
    val sm = sitemapUrls.select(col(locCol).as("url"),
      lit(true).as("from_sitemap"), lit(false).as("from_link"))
    sm.unionByName(links)
      .groupBy(col("url"))
      .agg(max(col("from_sitemap")).as("from_sitemap"),
        max(col("from_link")).as("from_link"))
  }
}
