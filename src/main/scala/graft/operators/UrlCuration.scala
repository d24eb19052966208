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
    * (or `#.*$`, whose first match extends to end-of-string) so
    * first-match replacement (DuckDB's default) equals Spark's global
    * replacement — no engine divergence. The port rule is anchored to the
    * HOST position (`^[^/:?#]*`): a `:80/` embedded later in the path or
    * query (e.g. `example.com/r?u=http://h:443/x`) is untouched. The `$1$3`
    * backref is Java-regex syntax; the DuckDB oracle twin spells it
    * `\1\3` — both are RE2-compatible patterns, only the replacement
    * syntax differs. (Userinfo `user:pass@host` is out of scope for this
    * normalizer, as in the CommonCrawl recipes it mirrors.) */
  def normalizeUrl(u: Column): Column = {
    val lowered = lower(u)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    // default port directly after the host (start-anchored ⇒ at most one
    // replacement in both engines); group 3 re-emits the /, ? or EOS that
    // delimited the port
    val noPort =
      regexp_replace(noWww, "^([^/:?#]*):(80|443)([/?]|$)", "$1$3")
    regexp_replace(noPort, "/$", "")
  }

  /** Host part of a normalized URL (everything before the first `/`). */
  def hostOf(normalized: Column): Column =
    regexp_extract(normalized, "^[^/?]+", 0)

  /** SURT key — the Sort-friendly URI Reordering Transform the web
    * archives sort their URL indexes by (the Internet Archive's CDX
    * files and Common Crawl's url indexes are SURT-ordered so one
    * host's captures are contiguous on disk). Subset implemented, each
    * step stated so the oracle replays it:
    *
    *   - http(s) scheme dropped (non-http urls → NULL, like the other
    *     url helpers); userinfo dropped;
    *   - host lowercased, one leading `www.` dropped, dot-labels
    *     REVERSED and comma-joined (`news.example.org` →
    *     `org,example,news`);
    *   - default port dropped (80 on http, 443 on https), any other
    *     port kept as `:port`;
    *   - `)` then path+query (fragment dropped; no path → `/`; a
    *     query with no path → `/?query` — the [[graft.operators.Robots]]
    *     match-target rule). Path/query case is preserved (SURT
    *     lowercases only the authority).
    *
    * Why it matters at 100 TB: range-partitioning or sorting a url
    * ledger by SURT key co-locates every url of a host (and groups
    * subdomains under their parent), so per-host probes — politeness
    * state, robots verdicts, revisit ledgers — read one partition
    * range instead of shuffling. */
  def surtKey(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^(?i)(https?)://", 1))
    val hostport =
      regexp_extract(url, "(?i)^https?://(?:[^/?#@]*@)?([^/?#]+)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]+)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val bareHost = regexp_replace(host, "^www\\.", "")
    val rev = concat_ws(",", reverse(split(bareHost, "\\.")))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val pathq = coalesce(
      when(length(regexp_extract(url, "(?i)^https?://[^/]*(/[^#]*)", 1))
        > 0, regexp_extract(url, "(?i)^https?://[^/]*(/[^#]*)", 1)),
      when(length(regexp_extract(url, "(?i)^https?://[^/?#]*(\\?[^#]*)",
        1)) > 0, concat(lit("/"),
        regexp_extract(url, "(?i)^https?://[^/?#]*(\\?[^#]*)", 1))),
      lit("/"))
    when(length(bareHost) > 0 && scheme =!= "",
      concat(rev, portPart, lit(")"), pathq))
  }

  /** Multi-label public suffixes (compact embedded subset of the public
    * suffix list — publicsuffix.org is public knowledge; the full list is
    * ~10k entries, this carries the high-traffic ccTLD second-level
    * registries so `bbc.co.uk` and `abc.net.au` group correctly). A host
    * whose last TWO labels are one of these registers at THREE labels. */
  private[graft] val MultiLabelSuffixes: Seq[String] = Seq(
    // UK / IE
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    // Australia / NZ
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    // Japan / Korea / China / Taiwan / HK / SE Asia
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "net.tw", "com.hk", "org.hk", "net.hk",
    "com.sg", "com.my", "co.id", "or.id", "web.id", "ac.id",
    "com.ph", "com.vn", "co.th", "ac.th", "go.th", "or.th", "in.th",
    // South Asia / Middle East / Africa
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "res.in", "gov.in",
    "gen.in", "firm.in", "ind.in",
    "com.pk", "com.bd", "com.np", "com.sa", "com.eg", "co.il", "org.il",
    "net.il", "ac.il", "gov.il",
    "co.za", "org.za", "net.za", "ac.za", "gov.za", "web.za",
    "com.ng", "co.ke", "or.ke", "ac.ke", "go.ke", "com.gh", "co.tz",
    "co.ug", "com.et",
    // Americas / Europe
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "com.co", "com.ve", "com.pe", "com.ec", "com.uy", "com.bo",
    "com.tr", "com.ua", "com.pl", "com.ru", "com.gr", "com.pt", "com.ro")

  /** Registered domain of a host: last two dot-labels, or last THREE when
    * the two-label tail is a known multi-label public suffix
    * (`news.bbc.co.uk` → `bbc.co.uk`, `a.b.example.com` → `example.com`).
    * The embedded PSL subset covers the common ccTLD registries; an exotic
    * suffix outside it degrades to the two-label heuristic — grouping
    * semantics, not correctness, are at stake. A bare suffix host
    * (`co.uk` itself) has no registrable part and returns as-is. */
  def registeredDomainOf(host: Column): Column = {
    val lastTwo = regexp_extract(host, "[^.]+\\.[^.]+$", 0)
    val lastThree = regexp_extract(host, "[^.]+\\.[^.]+\\.[^.]+$", 0)
    when(lastTwo === "", host)
      .when(lastTwo.isInCollection(MultiLabelSuffixes) && lastThree =!= "",
        lastThree)
      .otherwise(lastTwo)
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

  /** Every dot-suffix of a host, shortest first: `a.b.com` →
    * `[com, b.com, a.b.com]`. Pure projection (split + HOF transform —
    * hosts have a handful of labels, so the per-row cost is constant). */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    transform(sequence(lit(1), n),
      i => array_join(slice(labels, n - i + 1, i), "."))
  }

  /** Distinct ids of rows whose host falls under any blocklist entry —
    * UT1-style host-suffix semantics (the convention of every public URL
    * blocklist): entry `example.com` blocks `example.com` AND every
    * subdomain `*.example.com`; entry `ads.example.com` blocks only that
    * subtree. `blocklist` carries one `domain` column of lowercase entries.
    *
    * Scale shape (the [[Decontaminate]] playbook): the blocklist is the
    * small side — UT1's largest category is a few million entries, tens of
    * MB — so it BROADCASTS; the corpus computes its ≤label-count suffixes
    * in one projection, explodes, and broadcast-semi-joins. The corpus
    * never shuffles; only the matched ids are aggregated. */
  def blockedByList(df: DataFrame, hostCol: String, idCol: String,
                    blocklist: DataFrame): DataFrame =
    df.select(col(idCol),
        explode(hostSuffixes(col(hostCol))).as("domain"))
      .join(broadcast(blocklist.select(col("domain")).distinct()), "domain")
      .select(col(idCol)).distinct()

  /** The corpus minus blocklisted rows (anti-join on ids — ships keys
    * only, the corpus's payload columns never shuffle). */
  def filterBlocklist(df: DataFrame, hostCol: String, idCol: String,
                      blocklist: DataFrame): DataFrame =
    df.join(blockedByList(df, hostCol, idCol, blocklist),
      Seq(idCol), "left_anti")

  /** Canonical-URL dedup — the head-metadata tier of web dedup (a CMS
    * serves one article under many URLs and SAYS SO via
    * `<link rel="canonical">`; honoring it removes the whole alias
    * class before any content hashing runs). Semantics:
    *
    *   1. `noindex` pages drop (the page itself opted out of reuse);
    *   2. each survivor keys on its absolute canonical target (pages
    *      with no/relative canonical key on their own URL);
    *   3. one representative per key: the SELF-canonical page when the
    *      group has one, else the lexicographically smallest URL.
    *
    * One projection + one per-alias-group window (alias groups are CMS
    * duplicate classes — bounded small). Output = surviving rows with
    * their `canon_key`. */
  def canonicalDedup(pages: DataFrame, urlCol: String, htmlCol: String)
  : DataFrame = {
    val canon = graft.functions.Html.canonicalUrl(col(htmlCol))
    val robots = graft.functions.Html.metaRobots(col(htmlCol))
    val keyed = pages
      .filter(!coalesce(robots, lit("")).contains("noindex"))
      .withColumn("canon_key",
        when(canon.rlike("(?i)^https?://"), canon)
          .otherwise(col(urlCol)))
    val w = Window.partitionBy(col("canon_key"))
      .orderBy((col(urlCol) =!= col("canon_key")).cast("int"),
        col(urlCol))
    keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
