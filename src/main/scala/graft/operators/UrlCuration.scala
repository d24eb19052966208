package graft.operators

import graft.functions.Scalars
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation for web-scale corpora — beyond the reference (which has no
  * URL surface): the standard CommonCrawl-style curation steps of
  * normalizing URLs, extracting host/domain, and capping documents per
  * domain so one crawl-heavy site can't dominate a 100 TB training mix.
  *
  * Everything is a pure projection or a single keyed window:
  *  - [[normalizeUrl]]/[[hostOf]]/[[registeredDomainOf]] are regexp chains
  *    confined to the RE2-compatible subset with no group references, so
  *    the DuckDB oracle replays them bit-exactly and the whole pipeline
  *    stays inside whole-stage codegen.
  *  - [[capPerDomain]] ranks within each domain by a salted content hash
  *    (deterministic at any parallelism — no RNG state) and keeps the top
  *    `maxPerDomain`: one hash-partitioned window over the domain key, the
  *    same shape as any top-n-per-group, so it scales like a groupBy.
  */
object UrlCuration {

  /** Canonical form of a URL for dedup/grouping: lowercase, fragment
    * stripped, scheme stripped, leading `www.` stripped, default ports
    * (80/443) stripped, trailing slash stripped. Each pattern is anchored
    * or single-occurrence so first-match replacement (DuckDB's default)
    * equals Spark's global replacement — no engine divergence. */
  def normalizeUrl(u: Column): Column = {
    val lowered = lower(u)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    // default ports, no capture-group backrefs ($1 vs \1 differs by engine)
    val noPortSlash = regexp_replace(noWww, ":(80|443)/", "/")
    val noPort = regexp_replace(noPortSlash, ":(80|443)$", "")
    regexp_replace(noPort, "/$", "")
  }

  /** Host part of a normalized URL (everything before the first `/`). */
  def hostOf(normalized: Column): Column =
    regexp_extract(normalized, "^[^/?]+", 0)

  /** Registered-domain heuristic: the last two dot-labels of the host
    * (`a.b.example.com` → `example.com`). A public-suffix list would be
    * exact (`co.uk`); none ships in this sandbox, so this is a documented
    * approximation — the cap/grouping semantics are unchanged. */
  def registeredDomainOf(host: Column): Column = {
    val lastTwo = regexp_extract(host, "[^.]+\\.[^.]+$", 0)
    when(lastTwo === "", host).otherwise(lastTwo)
  }

  /** Deterministic per-domain cap: keep at most `maxPerDomain` rows per
    * domain, chosen by salted hash of the id (reproducible on any cluster;
    * ties broken by id so the survivor set is total-ordered). The window
    * partitions on the domain — at 100 TB that is one shuffle on a
    * modest-cardinality key; skewed mega-domains are exactly the rows the
    * cap discards, so AQE skew handling plus the cap itself bound the
    * partition cost. */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String,
                   maxPerDomain: Int, salt: String = "graft"): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain $maxPerDomain must be positive")
    val rank = Scalars.hash60(
      concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(domainCol)).orderBy(rank, col(idCol))
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxPerDomain)
      .drop("__r")
  }
}
