package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-policy gates: robots.txt (RFC 9309) parsing, the frontier
  * allow/deny verdict, and the politeness schedule — the tier that
  * fronts every fetch a crawl-extending pipeline makes. Oracles replay
  * the ENTIRE chain in DuckDB: body synthesis, line/comment parse,
  * UA-run group islands, group selection for the agent, rule→regex
  * compilation (`*`/`$` wildcards), longest-match/allow-wins
  * precedence, and per-host slot scheduling. */
object CrawlQueries {

  /** Synthesized per-host robots.txt over the linkPages host scheme
    * (h0..h28.example.org). Exercises: comments, UPPER/lower key case,
    * a pre-group stray rule (must drop), `*` wildcards, `$` anchors,
    * regex-metachar paths, fractional crawl-delays, multi-UA groups, a
    * group-interleaved sitemap line (must not split the UA run), a
    * host with an empty robots file, and hosts with/without a
    * specific-agent group. */
  private def robotsFrame(s: org.apache.spark.sql.SparkSession,
                          d: String): DataFrame = {
    val h = col("h")
    val hstr = concat(lit("h"), h.cast("string"), lit(".example.org"))
    val body = when(h === 5, lit(""))
      .otherwise(concat(
        when(h % 6 === 0, lit("Disallow: /stray\n")).otherwise(lit("")),
        lit("# corpus crawl policy\n"),
        when(h % 2 === 0, lit("User-Agent: *\n"))
          .otherwise(lit("user-agent: *\n")),
        lit("Disallow: /private\nAllow: /private/ok\n" +
          "Disallow: /tmp*\nDisallow: /exact$\n"),
        when(h % 2 === 0, lit("Disallow: /file.html\n"))
          .otherwise(lit("")),
        lit("Crawl-delay: "), (h % 5 + 1).cast("string"), lit(".5\n"),
        when(h % 4 === 0,
          lit("\nUser-agent: GraftBot\nUser-agent: otherbot\n" +
            "Disallow: /graft\nAllow: /graft/ok*\nCrawl-delay: 2\n"))
          .otherwise(lit("")),
        when(h % 3 === 0, concat(lit("Sitemap: https://"), hstr,
          lit("/sitemap.xml\n"))).otherwise(lit(""))))
    Tables.documents(s, d).select((col("doc_id") % 29).as("h"))
      .distinct()
      .select(hstr.as("host"), body.as("body"))
  }

  /** DuckDB twin of [[robotsFrame]], ending in `robots(host, body)`. */
  private val robotsSql: String = {
    val nl = "chr(10)"
    s"""rh AS (SELECT DISTINCT doc_id % 29 AS h FROM documents),
      robots AS (SELECT
        'h' || CAST(h AS VARCHAR) || '.example.org' AS host,
        CASE WHEN h = 5 THEN '' ELSE
          CASE WHEN h % 6 = 0 THEN 'Disallow: /stray' || $nl
               ELSE '' END ||
          '# corpus crawl policy' || $nl ||
          CASE WHEN h % 2 = 0 THEN 'User-Agent: *'
               ELSE 'user-agent: *' END || $nl ||
          'Disallow: /private' || $nl || 'Allow: /private/ok' || $nl ||
          'Disallow: /tmp*' || $nl || 'Disallow: /exact' || '$$' || $nl ||
          CASE WHEN h % 2 = 0 THEN 'Disallow: /file.html' || $nl
               ELSE '' END ||
          'Crawl-delay: ' || CAST(h % 5 + 1 AS VARCHAR) || '.5' || $nl ||
          CASE WHEN h % 4 = 0 THEN $nl || 'User-agent: GraftBot' || $nl
              || 'User-agent: otherbot' || $nl || 'Disallow: /graft'
              || $nl || 'Allow: /graft/ok*' || $nl || 'Crawl-delay: 2'
              || $nl ELSE '' END ||
          CASE WHEN h % 3 = 0 THEN 'Sitemap: https://h' ||
              CAST(h AS VARCHAR) || '.example.org/sitemap.xml' || $nl
               ELSE '' END
        END AS body FROM rh)"""
  }

  /** DuckDB replay of the Robots parse tier over `robots`, ending in
    * `ragt(host, grp, agent, ln)` + `rrul(host, grp, ln, allow, path)`
    * + `rmem` (all group-member directives with their group id). */
  private val robotsParseSql: String =
    """rlin AS (SELECT host, i AS ln,
        trim(regexp_replace(parts[i], '#.*', ''),
          ' ' || chr(9) || chr(13)) AS line
      FROM (SELECT host, string_split(body, chr(10)) AS parts,
              unnest(generate_series(1,
                len(string_split(body, chr(10))))) AS i
            FROM robots)),
    rkv AS (SELECT host, ln,
        lower(regexp_extract(line, '^([A-Za-z-]+)[ \t]*:', 1)) AS key,
        trim(regexp_extract(line, '^[A-Za-z-]+[ \t]*:(.*)$', 1),
          ' ' || chr(9)) AS val
      FROM rlin
      WHERE lower(regexp_extract(line, '^([A-Za-z-]+)[ \t]*:', 1)) IN
        ('user-agent', 'allow', 'disallow', 'crawl-delay', 'sitemap')),
    rgs AS (SELECT *, CASE WHEN key = 'user-agent' AND NOT
          coalesce(lag(key = 'user-agent')
            OVER (PARTITION BY host ORDER BY ln), FALSE)
        THEN 1 ELSE 0 END AS gs
      FROM rkv WHERE key != 'sitemap'),
    rmem AS (SELECT *, SUM(gs)
        OVER (PARTITION BY host ORDER BY ln) AS grp
      FROM rgs),
    ragt AS (SELECT host, grp, lower(val) AS agent, ln FROM rmem
      WHERE key = 'user-agent'),
    rrul AS (SELECT host, grp, ln, key = 'allow' AS allow, val AS path
      FROM rmem
      WHERE key IN ('allow', 'disallow') AND grp > 0 AND
        length(val) > 0)"""

  /** Crawl frontier over the same hosts: nine path shapes probing
    * every rule family (prefix, Allow-over-Disallow, wildcard, anchor
    * vs superstring, specific-group shadowing, metachar path,
    * query-with-fragment). */
  private def crawlFrontier(s: org.apache.spark.sql.SparkSession,
                            d: String): DataFrame = {
    val did = col("doc_id")
    val paths = array(FrontierPaths.map(lit): _*)
    Tables.documents(s, d).select(concat(
        lit("https://h"), (did % 29).cast("string"), lit(".example.org"),
        element_at(paths, (did % 9 + 1).cast("int"))).as("url"))
      .distinct()
  }

  private val FrontierPaths = Seq("/private/x", "/private/ok/y",
    "/tmp123", "/exact", "/exactly", "/graft/z", "/graft/ok9",
    "/file.html", "/pub?x=2#sec")

  /** DuckDB twin of [[crawlFrontier]] + host/path split, ending in
    * `fh(url, host, pth)`. */
  private val frontierSql: String = {
    val list = FrontierPaths.map(p => s"'$p'").mkString(", ")
    s"""fr AS (SELECT DISTINCT
        'https://h' || CAST(doc_id % 29 AS VARCHAR) || '.example.org' ||
          ([$list])[CAST(doc_id % 9 + 1 AS INT)] AS url
      FROM documents),
    fh AS (SELECT url,
        lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1)) AS host,
        CASE WHEN length(regexp_extract(url,
            '(?i)^https?://[^/]*(/[^#]*)', 1)) > 0
          THEN regexp_extract(url, '(?i)^https?://[^/]*(/[^#]*)', 1)
          ELSE '/' END AS pth
      FROM fr)"""
  }

  /** DuckDB replay of group selection + rule→regex compilation +
    * longest-match/allow-wins for agent `graftbot`, ending in
    * `dec(url, allow)` (urls with no matching rule are absent). */
  private val decisionSql: String =
    """hsx AS (SELECT host,
        max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS hs
      FROM ragt WHERE agent IN ('graftbot', '*') GROUP BY host),
    cgr AS (SELECT DISTINCT a.host, a.grp
      FROM ragt a JOIN hsx USING (host)
      WHERE (a.agent = 'graftbot' AND hs = 1) OR
        (a.agent = '*' AND hs = 0)),
    cpat AS (SELECT r.host, r.allow, length(r.path) AS plen,
        '^' || regexp_replace(
          regexp_replace(
            CASE WHEN r.path LIKE '%$' THEN
              substr(r.path, 1, length(r.path) - 1) ELSE r.path END,
            '([\\.^$+?(){}\[\]|])', '\\\1', 'g'),
          '\*', '.*', 'g') ||
        CASE WHEN r.path LIKE '%$' THEN '$' ELSE '' END AS pat
      FROM rrul r JOIN cgr USING (host, grp)),
    cand AS (SELECT f.url, c.allow, c.plen
      FROM fh f JOIN cpat c ON f.host = c.host
      WHERE regexp_matches(f.pth, c.pat)),
    dec AS (SELECT url, allow FROM (SELECT url, allow, row_number()
        OVER (PARTITION BY url ORDER BY plen DESC, allow DESC) AS rn
      FROM cand) WHERE rn = 1)"""

  /** Synthesized per-document sitemaps (host = the linkPages scheme):
    * each document publishes a 2-entry `<urlset>` — a /doc url with an
    * XML-escaped query (`&amp;` must decode once) + optional
    * lastmod/priority (omitted when doc_id%6==0) + mixed-case
    * changefreq, and a /private url the robots gates can block. */
  private def sitemapDocs(s: org.apache.spark.sql.SparkSession,
                          d: String): DataFrame = {
    val did = col("doc_id")
    val hstr = concat(lit("h"), (did % 29).cast("string"),
      lit(".example.org"))
    val base = concat(lit("https://"), hstr)
    val opt = when(did % 6 === 0, lit(""))
      .otherwise(concat(lit("<lastmod>2026-01-"),
        lpad((did % 28 + 1).cast("string"), 2, "0"),
        lit("T10:00:00Z</lastmod><priority>0."),
        (did % 10).cast("string"), lit("</priority>")))
    val cf = element_at(array(lit("DAILY"), lit("weekly"),
      lit("Monthly"), lit("hourly")), (did % 4 + 1).cast("int"))
    val xml = concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      lit("<url><loc> "), base, lit("/doc/"), did.cast("string"),
      lit("?a=1&amp;b=2 </loc>"), opt,
      lit("<changefreq>"), cf, lit("</changefreq></url>"),
      lit("<url><loc>"), base, lit("/private/"), did.cast("string"),
      lit("</loc></url></urlset>"))
    Tables.documents(s, d).select(hstr.as("host"), xml.as("xml"))
  }

  /** DuckDB twin of [[sitemapDocs]], ending in `sm(host, xml)`. */
  private val sitemapDocsSql: String =
    """sm AS (SELECT
        'h' || CAST(doc_id % 29 AS VARCHAR) || '.example.org' AS host,
        '<?xml version="1.0"?><urlset>' ||
        '<url><loc> https://h' || CAST(doc_id % 29 AS VARCHAR) ||
          '.example.org/doc/' || CAST(doc_id AS VARCHAR) ||
          '?a=1&amp;b=2 </loc>' ||
        CASE WHEN doc_id % 6 = 0 THEN '' ELSE
          '<lastmod>2026-01-' ||
          lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
          'T10:00:00Z</lastmod><priority>0.' ||
          CAST(doc_id % 10 AS VARCHAR) || '</priority>' END ||
        '<changefreq>' ||
          (['DAILY','weekly','Monthly','hourly'])
            [CAST(doc_id % 4 + 1 AS INT)] ||
          '</changefreq></url>' ||
        '<url><loc>https://h' || CAST(doc_id % 29 AS VARCHAR) ||
          '.example.org/private/' || CAST(doc_id AS VARCHAR) ||
          '</loc></url></urlset>' AS xml
      FROM documents)"""

  /** One-decode XML entity chain (the Html.decodeEntities order). */
  private def decodeSql(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&apos;" -> "''", "&nbsp;" -> " ",
      "&amp;" -> "&")
      .foldLeft(e) { case (acc, (f, t)) =>
        s"replace($acc, '$f', '$t')"
      }

  /** DuckDB replay of the Sitemaps.urls parse over `sm`, ending in
    * `smu(host, loc, lastmod_date, changefreq, priority)`. */
  private val sitemapParseSql: String = {
    val ws = "' ' || chr(9) || chr(10) || chr(13)"
    def f(tag: String) =
      s"regexp_extract(b, '(?is)<$tag[^>]*>([^<]*)</$tag[ \\t\\n\\r]*>', 1)"
    s"""smb AS (SELECT host, unnest(regexp_extract_all(xml,
        '(?is)<url[ \\t\\n\\r]*>.*?</url[ \\t\\n\\r]*>', 0)) AS b
      FROM sm),
    smf AS (SELECT host,
        ${decodeSql(s"trim(${f("loc")}, $ws)")} AS loc,
        ${f("lastmod")} AS lm,
        lower(trim(${f("changefreq")}, $ws)) AS cf,
        ${f("priority")} AS pr
      FROM smb),
    smu AS (SELECT host, loc,
        TRY_CAST(substr(lm, 1, 10) AS DATE) AS lastmod_date,
        CASE WHEN length(cf) > 0 THEN cf END AS changefreq,
        TRY_CAST(pr AS DECIMAL(2,1)) AS priority
      FROM smf WHERE length(loc) > 0)"""
  }

  /** Synthesized pages with head metadata: canonical links in BOTH
    * attribute orders (every 3rd page self-canonical, the next an
    * alias pointing at it, the third bare), robots metas in both
    * orders (every 7th noindex, the next nofollow-only), an
    * entity-escaped description, and a 4-cycle of lang attributes
    * (one absent). */
  private def metaPages(s: org.apache.spark.sql.SparkSession,
                        d: String): DataFrame = {
    val did = col("doc_id")
    def urlOf(e: Column) = concat(lit("https://h"),
      (e % 29).cast("string"), lit(".example.org/doc/"),
      e.cast("string"))
    val langAttr = element_at(array(lit(" lang=\"en\""),
      lit(" lang=\"EN-us\""), lit(" lang=\"fr\""), lit("")),
      (did % 4 + 1).cast("int"))
    val canonTag = when(did % 3 === 0,
        concat(lit("<link rel=\"canonical\" href=\""), urlOf(did),
          lit("\">")))
      .when(did % 3 === 1,
        concat(lit("<link href=\""), urlOf(did - 1),
          lit("\" rel=\"canonical\">")))
      .otherwise(lit(""))
    val robotsTag = when(did % 7 === 0,
        lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
      .when(did % 7 === 1,
        lit("<meta content=\"NOFOLLOW\" name=\"robots\">"))
      .otherwise(lit(""))
    Tables.documents(s, d).select(urlOf(did).as("url"),
      concat(lit("<html"), langAttr, lit("><head>"), canonTag,
        robotsTag,
        lit("<meta name=\"description\" content=\"Q&amp;A on "),
        col("source"), lit(" "), did.cast("string"), lit("\">"),
        lit("</head><body>b</body></html>")).as("html"))
  }

  /** DuckDB twin of [[metaPages]] + the head-metadata extraction,
    * ending in `mx(url, canonical, robots, lang, description)`. */
  private val metaExtractSql: String = {
    val u = "'https://h' || CAST(doc_id % 29 AS VARCHAR) || " +
      "'.example.org/doc/' || CAST(doc_id AS VARCHAR)"
    val uPrev = "'https://h' || CAST((doc_id - 1) % 29 AS VARCHAR) || " +
      "'.example.org/doc/' || CAST(doc_id - 1 AS VARCHAR)"
    def pair(first: String, second: String) =
      s"""CASE WHEN length($first) > 0 THEN ${decodeSql(first)}
          WHEN length($second) > 0 THEN ${decodeSql(second)} END"""
    s"""mp AS (SELECT $u AS url,
        '<html' || ([' lang="en"', ' lang="EN-us"', ' lang="fr"', ''])
          [CAST(doc_id % 4 + 1 AS INT)] || '><head>' ||
        CASE WHEN doc_id % 3 = 0 THEN
            '<link rel="canonical" href="' || $u || '">'
          WHEN doc_id % 3 = 1 THEN
            '<link href="' || $uPrev || '" rel="canonical">'
          ELSE '' END ||
        CASE WHEN doc_id % 7 = 0 THEN
            '<meta name="robots" content="noindex, nofollow">'
          WHEN doc_id % 7 = 1 THEN
            '<meta content="NOFOLLOW" name="robots">'
          ELSE '' END ||
        '<meta name="description" content="Q&amp;A on ' || source ||
          ' ' || CAST(doc_id AS VARCHAR) || '">' ||
        '</head><body>b</body></html>' AS html
      FROM documents),
    mr AS (SELECT url,
        regexp_extract(html,
          '(?is)<link[ \t\n\r][^>]*rel[ \t\n\r]*=[ \t\n\r]*"canonical"[^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
          1) AS c1,
        regexp_extract(html,
          '(?is)<link[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"[^>]*rel[ \t\n\r]*=[ \t\n\r]*"canonical"',
          1) AS c2,
        regexp_extract(html,
          '(?is)<meta[ \t\n\r][^>]*name[ \t\n\r]*=[ \t\n\r]*"robots"[^>]*content[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
          1) AS r1,
        regexp_extract(html,
          '(?is)<meta[ \t\n\r][^>]*content[ \t\n\r]*=[ \t\n\r]*"([^"]*)"[^>]*name[ \t\n\r]*=[ \t\n\r]*"robots"',
          1) AS r2,
        regexp_extract(html,
          '(?is)<meta[ \t\n\r][^>]*name[ \t\n\r]*=[ \t\n\r]*"description"[^>]*content[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
          1) AS d1,
        regexp_extract(html,
          '(?is)<meta[ \t\n\r][^>]*content[ \t\n\r]*=[ \t\n\r]*"([^"]*)"[^>]*name[ \t\n\r]*=[ \t\n\r]*"description"',
          1) AS d2,
        regexp_extract(html,
          '(?is)<html[ \t\n\r][^>]*lang[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
          1) AS lg
      FROM mp),
    mx AS (SELECT url,
        ${pair("c1", "c2")} AS canonical,
        lower(${pair("r1", "r2")}) AS robots,
        CASE WHEN length(lg) > 0 THEN lower(lg) END AS lang,
        ${pair("d1", "d2")} AS description
      FROM mr)"""
  }

  /** Corpus-keyed frontier-ledger name (one JVM can verify several
    * corpus dirs — a tag from another corpus must never be reused). */
  private def cfName(d: String): String =
    s"crawl_front_${CorpusKey.of(d)}"

  def all: Seq[Q] = Seq(

    // robots.txt parse: full rule table (host, agent, ln, allow, path)
    // — groups split on UA runs, multi-UA groups repeat their rules per
    // agent, pre-group rules drop, sitemap lines don't split a run,
    // comments and key case are normalized.
    Q("q_robots_rules",
      (s, d) => graft.operators.Robots.rules(
          robotsFrame(s, d), "host", "body")
        .orderBy(col("host"), col("agent"), col("ln")),
      Some(s"""WITH $robotsSql, $robotsParseSql
        SELECT r.host, a.agent, r.ln, r.allow, r.path
        FROM rrul r JOIN ragt a USING (host, grp)
        ORDER BY r.host, a.agent, r.ln""")),

    // The REP verdict per frontier url for agent GraftBot: hosts with a
    // GraftBot group use ONLY it (so /private is allowed there!), the
    // rest fall back to *; longest rule wins, Allow wins ties, `$`
    // anchors reject superstrings, `*` spans path+query, the empty-path
    // url defaults to "/", robots-less hosts allow everything.
    Q("q_robots_frontier",
      (s, d) => graft.operators.Robots.frontierFilter(
          crawlFrontier(s, d), "url", robotsFrame(s, d), "host", "body",
          "GraftBot")
        .select(col("url"), col("host"), col("allowed"))
        .orderBy(col("url")),
      Some(s"""WITH $robotsSql, $robotsParseSql, $frontierSql,
        $decisionSql
        SELECT f.url, f.host, coalesce(d.allow, TRUE) AS allowed
        FROM fh f LEFT JOIN dec d USING (url) ORDER BY url""")),

    // Politeness schedule over the allowed frontier: per-host url-order
    // slots at the governing group's LAST crawl-delay (fractional
    // seconds exact through decimal ms), default 1000 ms where the
    // group declares none (incl. the empty-robots host).
    Q("q_robots_schedule",
      (s, d) => graft.operators.Robots.schedule(
          crawlFrontier(s, d), "url", robotsFrame(s, d), "host", "body",
          "GraftBot", defaultDelayMs = 1000L)
        .select(col("url"), col("host"), col("slot"),
          col("fetch_at_ms"))
        .orderBy(col("url")),
      Some(s"""WITH $robotsSql, $robotsParseSql, $frontierSql,
        $decisionSql,
        cdel AS (SELECT m.host, m.val, m.ln
          FROM rmem m JOIN cgr USING (host, grp)
          WHERE key = 'crawl-delay' AND
            TRY_CAST(val AS DECIMAL(18,3)) IS NOT NULL),
        cdly AS (SELECT host,
            CAST(TRY_CAST(val AS DECIMAL(18,3)) * 1000 AS BIGINT)
              AS delay_ms
          FROM (SELECT *, row_number()
              OVER (PARTITION BY host ORDER BY ln DESC) AS rn
            FROM cdel) WHERE rn = 1),
        alw AS (SELECT f.url, f.host FROM fh f
          LEFT JOIN dec d USING (url) WHERE coalesce(d.allow, TRUE)),
        sch AS (SELECT url, host, row_number()
            OVER (PARTITION BY host ORDER BY url) - 1 AS slot
          FROM alw)
        SELECT s.url, s.host, s.slot,
          s.slot * coalesce(c.delay_ms, 1000) AS fetch_at_ms
        FROM sch s LEFT JOIN cdly c USING (host) ORDER BY url""")),

    // Sitemap <urlset> parse: loc entity-decodes once (&amp; last),
    // lastmod parses its W3C-datetime date prefix, changefreq
    // case-normalizes, priority is exact decimal; absent optional
    // fields are null (every 6th entry omits them).
    Q("q_sitemap_urls",
      (s, d) => graft.operators.Sitemaps.urls(
          sitemapDocs(s, d), "xml", keep = Seq("host"))
        // gate-portable types: DATE→string, DECIMAL(2,1)→double (both
        // single correctly-rounded conversions on each engine)
        .withColumn("lastmod_date", col("lastmod_date").cast("string"))
        .withColumn("priority", col("priority").cast("double"))
        .orderBy(col("loc")),
      Some(s"""WITH $sitemapDocsSql, $sitemapParseSql
        SELECT host, loc, CAST(lastmod_date AS VARCHAR) AS lastmod_date,
          changefreq, CAST(priority AS DOUBLE) AS priority
        FROM smu ORDER BY loc""")),

    // Sitemap index tier: child sitemap locations of <sitemapindex>
    // documents (whitespace-trimmed, entity-decoded); urls() over an
    // index doc yields nothing — spec-pinned, and here the twin parse
    // proves the two record shapes don't cross-match.
    Q("q_sitemap_index",
      (s, d) => {
        val did = col("doc_id")
        val base = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/sm/"), did.cast("string"))
        val idx = Tables.documents(s, d).select(concat(
          lit("<sitemapindex><sitemap><loc> "), base,
          lit("-1.xml </loc><lastmod>2026-02-02</lastmod></sitemap>" +
            "<sitemap><loc>"), base,
          lit("-2.xml</loc></sitemap></sitemapindex>")).as("xml"))
        graft.operators.Sitemaps.indexLocs(idx, "xml")
          .orderBy(col("loc"))
      },
      Some("""WITH ix AS (SELECT
          '<sitemapindex><sitemap><loc> https://h' ||
            CAST(doc_id % 29 AS VARCHAR) || '.example.org/sm/' ||
            CAST(doc_id AS VARCHAR) ||
            '-1.xml </loc><lastmod>2026-02-02</lastmod></sitemap>' ||
            '<sitemap><loc>https://h' ||
            CAST(doc_id % 29 AS VARCHAR) || '.example.org/sm/' ||
            CAST(doc_id AS VARCHAR) ||
            '-2.xml</loc></sitemap></sitemapindex>' AS xml
          FROM documents),
        ib AS (SELECT unnest(regexp_extract_all(xml,
            '(?is)<sitemap[ \t\n\r]*>.*?</sitemap[ \t\n\r]*>', 0)) AS b
          FROM ix),
        il AS (SELECT trim(regexp_extract(b,
            '(?is)<loc[^>]*>([^<]*)</loc[ \t\n\r]*>', 1),
            ' ' || chr(9) || chr(10) || chr(13)) AS loc FROM ib)
        SELECT loc FROM il WHERE length(loc) > 0 ORDER BY loc""")),

    // CRAWL-DISCOVERY capstone: sitemap-declared URLs ∪ link-extracted
    // absolute URLs, deduped with provenance flags, then the RFC 9309
    // verdict for GraftBot — discovery → dedup → policy gate, the full
    // front half of a polite crawl. The /private sitemap entries are
    // blocked on *-group hosts but ALLOWED where a GraftBot group
    // shadows * (and on the empty-robots host); /doc and /p links pass
    // everywhere.
    Q("q_frontier_build",
      (s, d) => {
        val sm = graft.operators.Sitemaps.urls(sitemapDocs(s, d), "xml")
        val fr = graft.operators.Sitemaps.discoverFrontier(
          sm, "loc", TrainingQueries.linkPages(s, d), "html")
        graft.operators.Robots.frontierFilter(fr, "url",
            robotsFrame(s, d), "host", "body", "GraftBot")
          .select(col("url"), col("host"), col("from_sitemap"),
            col("from_link"), col("allowed"))
          .orderBy(col("url"))
      },
      Some(s"""WITH $robotsSql, $robotsParseSql, $sitemapDocsSql,
        $sitemapParseSql, ${TrainingQueries.linkPgSql},
        fl AS (SELECT DISTINCT unnest(regexp_extract_all(html,
            '(?i)<a[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
            1)) AS url
          FROM pg),
        fb0 AS (SELECT loc AS url, TRUE AS from_sitemap,
            FALSE AS from_link FROM smu
          UNION ALL
          SELECT url, FALSE, TRUE FROM fl
          WHERE regexp_matches(url, '(?i)^https?://')),
        fb AS (SELECT url, bool_or(from_sitemap) AS from_sitemap,
            bool_or(from_link) AS from_link
          FROM fb0 GROUP BY url),
        fh AS (SELECT url,
            lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1))
              AS host,
            CASE WHEN length(regexp_extract(url,
                '(?i)^https?://[^/]*(/[^#]*)', 1)) > 0
              THEN regexp_extract(url, '(?i)^https?://[^/]*(/[^#]*)', 1)
              ELSE '/' END AS pth
          FROM fb),
        $decisionSql
        SELECT f.url, f.host, b.from_sitemap, b.from_link,
          coalesce(d.allow, TRUE) AS allowed
        FROM fh f JOIN fb b USING (url) LEFT JOIN dec d USING (url)
        ORDER BY url""")),

    // Streaming frontier maintenance — the continuous-crawl LOOP's
    // state: 4 micro-batches of fetched pages append fetch receipts +
    // self/link discovery sightings; the sitemap channel appends on its
    // own tag (replayed once — committed-tag no-op, partial-count
    // pinned in spec); pending = discovered ∖ fetched with OR-folded
    // provenance. Every fetched uri retires from pending; /p-path link
    // targets and sitemap locs (incl. the ?query variants of fetched
    // uris — distinct urls!) remain.
    Q("q_stream_frontier",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        import graft.operators.{Frontier, Sitemaps}
        val pages = TrainingQueries.linkPages(s, d).orderBy(col("uri"))
          .as[(String, String)].collect()
        val chunk = math.max(1, math.ceil(pages.length / 4.0).toInt)
        val chunks = pages.grouped(chunk).toSeq
        Frontier.drop(s, cfName(d))
        val mem = MemoryStream[(String, String)]
        val q = graft.streaming.Streams.frontierSink(
          mem.toDF().toDF("uri", "html"), "uri", "html", cfName(d),
          streamTag = Some("cfs")) { _ => () }.start()
        chunks.foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        def sitemapChannel() = Frontier.appendDiscovered(s,
          Sitemaps.urls(sitemapDocs(s, d), "xml")
            .select(col("loc").as("url"), lit(true).as("from_sitemap"),
              lit(false).as("from_link")),
          "url", cfName(d), "sm_1")
        sitemapChannel()
        sitemapChannel() // at-least-once replay: committed tag no-ops
        Frontier.pending(s, cfName(d)).orderBy(col("url"))
      },
      Some(s"""WITH ${TrainingQueries.linkPgSql}, $sitemapDocsSql,
        $sitemapParseSql,
        fl AS (SELECT unnest(regexp_extract_all(html,
            '(?i)<a[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
            1)) AS url
          FROM pg),
        d0 AS (SELECT uri AS url, FALSE AS from_sitemap,
            FALSE AS from_link FROM pg
          UNION ALL
          SELECT url, FALSE, TRUE FROM fl
          WHERE regexp_matches(url, '(?i)^https?://')
          UNION ALL
          SELECT loc, TRUE, FALSE FROM smu),
        dd AS (SELECT url, bool_or(from_sitemap) AS from_sitemap,
            bool_or(from_link) AS from_link
          FROM d0 GROUP BY url)
        SELECT url, from_sitemap, from_link FROM dd
        WHERE url NOT IN (SELECT DISTINCT uri FROM pg)
        ORDER BY url""")),

    // CRAWL-LOOP capstone — the full next-round fetch plan from
    // accumulated streaming state: the persisted frontier's pending set
    // (q_stream_frontier's ledger, reused if its batches already ran;
    // rebuilt deterministically otherwise) → RFC 9309 verdict →
    // politeness schedule. Every stage boundary (ledger fold, anti-join,
    // group choice, wildcard match, slot window, delay pick) sits under
    // one oracle hash.
    Q("q_crawl_loop",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        import graft.operators.{Frontier, Sitemaps}
        if (!Frontier.hasDiscoveredTag(s, cfName(d), "sm_1")) {
          val pages = TrainingQueries.linkPages(s, d).orderBy(col("uri"))
            .as[(String, String)].collect()
          val chunk = math.max(1, math.ceil(pages.length / 4.0).toInt)
          Frontier.drop(s, cfName(d))
          val mem = MemoryStream[(String, String)]
          val q = graft.streaming.Streams.frontierSink(
            mem.toDF().toDF("uri", "html"), "uri", "html", cfName(d),
            streamTag = Some("cfs")) { _ => () }.start()
          pages.grouped(chunk).foreach { c =>
            mem.addData(c.toSeq: _*)
            q.processAllAvailable()
          }
          q.stop()
          Frontier.appendDiscovered(s,
            Sitemaps.urls(sitemapDocs(s, d), "xml")
              .select(col("loc").as("url"), lit(true).as("from_sitemap"),
                lit(false).as("from_link")),
            "url", cfName(d), "sm_1")
        }
        graft.operators.Robots.schedule(
            Frontier.pending(s, cfName(d)), "url",
            robotsFrame(s, d), "host", "body", "GraftBot",
            defaultDelayMs = 1000L)
          .select(col("url"), col("host"), col("from_sitemap"),
            col("from_link"), col("slot"), col("fetch_at_ms"))
          .orderBy(col("url"))
      },
      Some(s"""WITH ${TrainingQueries.linkPgSql}, $sitemapDocsSql,
        $sitemapParseSql, $robotsSql, $robotsParseSql,
        fl AS (SELECT unnest(regexp_extract_all(html,
            '(?i)<a[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"',
            1)) AS url
          FROM pg),
        d0 AS (SELECT uri AS url, FALSE AS from_sitemap,
            FALSE AS from_link FROM pg
          UNION ALL
          SELECT url, FALSE, TRUE FROM fl
          WHERE regexp_matches(url, '(?i)^https?://')
          UNION ALL
          SELECT loc, TRUE, FALSE FROM smu),
        dd AS (SELECT url, bool_or(from_sitemap) AS from_sitemap,
            bool_or(from_link) AS from_link
          FROM d0 GROUP BY url),
        pend AS (SELECT * FROM dd
          WHERE url NOT IN (SELECT DISTINCT uri FROM pg)),
        fh AS (SELECT url,
            lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1))
              AS host,
            CASE WHEN length(regexp_extract(url,
                '(?i)^https?://[^/]*(/[^#]*)', 1)) > 0
              THEN regexp_extract(url, '(?i)^https?://[^/]*(/[^#]*)', 1)
              ELSE '/' END AS pth
          FROM pend),
        $decisionSql,
        cdel AS (SELECT m.host, m.val, m.ln
          FROM rmem m JOIN cgr USING (host, grp)
          WHERE key = 'crawl-delay' AND
            TRY_CAST(val AS DECIMAL(18,3)) IS NOT NULL),
        cdly AS (SELECT host,
            CAST(TRY_CAST(val AS DECIMAL(18,3)) * 1000 AS BIGINT)
              AS delay_ms
          FROM (SELECT *, row_number()
              OVER (PARTITION BY host ORDER BY ln DESC) AS rn
            FROM cdel) WHERE rn = 1),
        alw AS (SELECT f.url, f.host FROM fh f
          LEFT JOIN dec dc USING (url) WHERE coalesce(dc.allow, TRUE)),
        sch AS (SELECT url, host, row_number()
            OVER (PARTITION BY host ORDER BY url) - 1 AS slot
          FROM alw)
        SELECT s.url, s.host, p.from_sitemap, p.from_link, s.slot,
          s.slot * coalesce(c.delay_ms, 1000) AS fetch_at_ms
        FROM sch s JOIN pend p USING (url)
        LEFT JOIN cdly c USING (host) ORDER BY url""")),

    // REVISIT scheduling — the refresh phase of the crawl lifecycle:
    // fetched urls come due when the sitemap's lastmod postdates the
    // stored fetch (site-declared change, any interval) or when the
    // changefreq interval elapses ('never' only on fresh lastmod,
    // absent metadata at the default interval); due rows rank per host
    // by (priority, staleness). Synthesis cycles fetch ages, lastmod
    // days, all changefreq values incl. never/absent, null priorities,
    // and urls with no sitemap entry at all.
    Q("q_revisit_due",
      (s, d) => {
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        val fetched = Tables.documents(s, d).select(url.as("url"),
          (lit(1767225600000L) + (did % 20) * 86400000L)
            .as("fetched_at_ms"))
        val meta = Tables.documents(s, d).filter(did % 3 =!= 2).select(
          url.as("loc"),
          expr("try_to_date('2026-01-' || " +
            "lpad(cast(doc_id % 28 + 1 as string), 2, '0'))")
            .as("lastmod_date"),
          when(did % 6 === 0, "hourly").when(did % 6 === 1, "daily")
            .when(did % 6 === 2, "weekly").when(did % 6 === 3, "never")
            .when(did % 6 === 5, "monthly").as("changefreq"),
          when(did % 4 === 0, lit(null)).otherwise(
            expr("try_cast('0.' || cast(doc_id % 10 as string) " +
              "as decimal(2,1))")).as("priority"))
        graft.operators.Frontier.revisitDue(fetched, "url",
            "fetched_at_ms", meta, "loc", nowMs = 1768435200000L)
          .select(col("url"), col("host"), col("priority"),
            col("staleness_ms"), col("revisit_rank"))
          .orderBy(col("url"))
      },
      Some {
        val u = "'https://h' || CAST(doc_id % 29 AS VARCHAR) || " +
          "'.example.org/doc/' || CAST(doc_id AS VARCHAR)"
        s"""WITH f AS (SELECT $u AS url,
            1767225600000 + (doc_id % 20) * 86400000 AS fa
          FROM documents),
        mt AS (SELECT $u AS loc,
            TRY_CAST('2026-01-' ||
              lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
              AS lm,
            CASE doc_id % 6 WHEN 0 THEN 'hourly' WHEN 1 THEN 'daily'
              WHEN 2 THEN 'weekly' WHEN 3 THEN 'never'
              WHEN 5 THEN 'monthly' END AS cf,
            CASE WHEN doc_id % 4 = 0 THEN NULL ELSE
              TRY_CAST('0.' || CAST(doc_id % 10 AS VARCHAR)
                AS DECIMAL(2,1)) END AS pr
          FROM documents WHERE doc_id % 3 != 2),
        j AS (SELECT f.url, f.fa, mt.lm, mt.cf, mt.pr
          FROM f LEFT JOIN mt ON f.url = mt.loc),
        iv AS (SELECT *, CASE WHEN cf IS NULL THEN 86400000
            WHEN cf = 'always' THEN 0 WHEN cf = 'hourly' THEN 3600000
            WHEN cf = 'daily' THEN 86400000
            WHEN cf = 'weekly' THEN 604800000
            WHEN cf = 'monthly' THEN 2592000000
            WHEN cf = 'yearly' THEN 31536000000 END AS ivms
          FROM j),
        du AS (SELECT url, fa, pr FROM iv
          WHERE coalesce(epoch_ms(CAST(lm AS TIMESTAMP)) > fa, FALSE)
             OR coalesce(fa + ivms <= 1768435200000, FALSE)),
        r AS (SELECT url,
            lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1))
              AS host,
            coalesce(CAST(pr AS DOUBLE), 0.5) AS priority,
            1768435200000 - fa AS staleness_ms
          FROM du)
        SELECT url, host, priority, staleness_ms,
          ROW_NUMBER() OVER (PARTITION BY host
            ORDER BY priority DESC, staleness_ms DESC, url)
            AS revisit_rank
        FROM r ORDER BY url"""
      }),

    // CHANGED-ONLY re-processing — revisit-fetch economics: three crawl
    // rounds of the same urls, where round 2 rewrites every 3rd page
    // and round 3 rewrites the evens EXCEPT that every 6th page reverts
    // to ITS ROUND-2 TEXT (unchanged vs the ledger even though round 2
    // had changed it — only a ledger that actually carried round-2
    // state excludes it). A replay of the committed round-3 batch is
    // asserted in-gate to yield zero new work. Output = round 3's
    // changed set, bit-checked.
    Q("q_changed_only",
      (s, d) => {
        import graft.operators.Frontier
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        def round(v: Column) = Tables.documents(s, d).select(
          url.as("url"),
          concat(col("text"), lit("|"), v.cast("string")).as("content"))
        val v2 = when(did % 3 === 0, 2).otherwise(1)
        val v3 = when(did % 6 === 0, 2).when(did % 2 === 0, 3)
          .otherwise(v2)
        val name = s"chg_${CorpusKey.of(d)}"
        Frontier.dropChangeLedger(s, name)
        Frontier.changedOnly(s, round(lit(1)), "url", "content",
          name, 1, "b1")
        Frontier.changedOnly(s, round(v2), "url", "content",
          name, 2, "b2")
        val c3 = Frontier.changedOnly(s, round(v3), "url", "content",
          name, 3, "b3")
        val replay = Frontier.changedOnly(s, round(v3), "url", "content",
          name, 3, "b3")
        require(replay.isEmpty,
          "replayed committed batch must yield no new work")
        c3.orderBy(col("url"))
      },
      Some("""SELECT
          'https://h' || CAST(doc_id % 29 AS VARCHAR) ||
            '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
          text || '|3' AS content
        FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 6 != 0
        ORDER BY url""")),

    // CONDITIONAL-FETCH receipts (RFC 9110 validators) — the byte a
    // recrawl never downloads: round 1 fetches every url (ETags on the
    // evens, Last-Modified on the %3s), round 2 revisits conditionally —
    // rewritten pages (%5s) return 200 bodies with ROTATED validators,
    // validator-bearing unchanged pages return body-less 304s (stored
    // hash carried forward, stored validators kept), validator-less
    // unchanged pages return full 200 bodies the hash gate drops. The
    // output is the NEXT conditional revisit queue: latest receipts
    // joined onto the due set, validator-bearing urls ranked first per
    // host (a conditional probe costs ~zero bytes when unchanged).
    // In-gate: a replay of the committed round-2 batch yields no new
    // work, and the changed set is exactly the rewritten pages.
    Q("q_revisit_conditional",
      (s, d) => {
        import graft.operators.Frontier
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        val name = s"cfr_${CorpusKey.of(d)}"
        Frontier.dropChangeLedger(s, name)
        val docs = Tables.documents(s, d)
        val r1 = docs.select(url.as("url"),
          concat(col("text"), lit("|1")).as("content"),
          lit(200).as("status"),
          when(did % 2 === 0, concat(lit("v1-"), did.cast("string")))
            .as("etag"),
          when(did % 3 === 0, concat(lit("lm1-"), did.cast("string")))
            .as("last_modified"))
        def cond(batch: DataFrame, seq: Long, tag: String) =
          Frontier.changedOnlyConditional(s, batch, "url", "content",
            "status", "etag", "last_modified", name, seq, tag)
        cond(r1, 1, "b1")
        val rewritten = did % 5 === 0
        val hasVal = did % 2 === 0 || did % 3 === 0
        val r2 = docs.select(url.as("url"),
          when(rewritten, concat(col("text"), lit("|2")))
            .when(hasVal, lit(null).cast("string"))
            .otherwise(concat(col("text"), lit("|1"))).as("content"),
          when(!rewritten && hasVal, 304).otherwise(200).as("status"),
          when(rewritten && did % 2 === 0,
            concat(lit("v2-"), did.cast("string"))).as("etag"),
          when(rewritten && did % 3 === 0,
            concat(lit("lm2-"), did.cast("string"))).as("last_modified"))
        val c2 = cond(r2, 2, "b2")
        require(cond(r2, 2, "b2").isEmpty,
          "replayed committed conditional batch must yield no new work")
        require(c2.count() == docs.filter(rewritten).count(),
          "changed set must be exactly the rewritten pages")
        val fetched = docs.select(url.as("url"),
          (lit(1767225600000L) + (did % 20) * 86400000L)
            .as("fetched_at_ms"))
        val meta = docs.filter(lit(false)).select(url.as("loc"),
          lit(null).cast("date").as("lastmod_date"),
          lit(null).cast("string").as("changefreq"),
          lit(null).cast("decimal(2,1)").as("priority"))
        val due = Frontier.revisitDue(fetched, "url", "fetched_at_ms",
          meta, "loc", nowMs = 1769817600000L)
        Frontier.withConditional(due, "url", Frontier.latestReceipts(s, name))
          .select(col("url"), col("host"), col("has_validator"),
            col("cond_etag"), col("cond_last_modified"),
            col("staleness_ms"), col("cond_rank"))
          .orderBy(col("url"))
      },
      Some("""WITH f AS (SELECT
          'https://h' || CAST(doc_id % 29 AS VARCHAR) ||
            '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
          1767225600000 + (doc_id % 20) * 86400000 AS fa,
          doc_id AS did FROM documents),
        rc AS (SELECT url,
          lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1))
            AS host,
          CASE WHEN did % 2 = 0 THEN
            (CASE WHEN did % 5 = 0 THEN 'v2-' ELSE 'v1-' END) ||
              CAST(did AS VARCHAR) END AS cond_etag,
          CASE WHEN did % 3 = 0 THEN
            (CASE WHEN did % 5 = 0 THEN 'lm2-' ELSE 'lm1-' END) ||
              CAST(did AS VARCHAR) END AS cond_last_modified,
          1769817600000 - fa AS staleness_ms
        FROM f)
        SELECT url, host,
          (cond_etag IS NOT NULL OR cond_last_modified IS NOT NULL)
            AS has_validator,
          cond_etag, cond_last_modified, staleness_ms,
          ROW_NUMBER() OVER (PARTITION BY host ORDER BY
            (cond_etag IS NOT NULL OR cond_last_modified IS NOT NULL)
              DESC,
            staleness_ms DESC, url) AS cond_rank
        FROM rc ORDER BY url""")),

    // CHANGE-RATE-ADAPTIVE revisit intervals (r16) — the ledger-driven
    // twin of q_revisit_due's declared changefreq: four conditional
    // crawl rounds leave a full receipt history (round 1 fetches all
    // with ETags; rounds 2/3/4 rewrite the %2s/%3s/%5s and 304 the
    // rest), so every url's observed change count is %2+%3+%5 ∈ [0,3].
    // Where no changefreq is declared the interval inverts that rate —
    // default·revisits DIV changes, clamped [1.5d, 30d]; never-changed
    // urls poll at the 30d cap, %7s carry a DECLARED 'weekly' that
    // wins over their history. The oracle re-derives rates closed-form
    // from the synthesis pattern — the ledger fold, the estimator, the
    // clamps, and the due set are all bit-checked.
    Q("q_revisit_adaptive",
      (s, d) => {
        import graft.operators.Frontier
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        val name = s"adp_${CorpusKey.of(d)}"
        Frontier.dropChangeLedger(s, name)
        val docs = Tables.documents(s, d)
        def cond(batch: DataFrame, seq: Long, tag: String) =
          Frontier.changedOnlyConditional(s, batch, "url", "content",
            "status", "etag", "last_modified", name, seq, tag)
        val r1 = docs.select(url.as("url"),
          concat(col("text"), lit("|1")).as("content"),
          lit(200).as("status"),
          concat(lit("e1-"), did.cast("string")).as("etag"),
          lit(null).cast("string").as("last_modified"))
        cond(r1, 1, "b1")
        def round(k: Int, mod: Int) = docs.select(url.as("url"),
          when(did % mod === 0, concat(col("text"), lit(s"|$k")))
            .as("content"),
          when(did % mod === 0, 200).otherwise(304).as("status"),
          when(did % mod === 0, concat(lit(s"e$k-"), did.cast("string")))
            .as("etag"),
          lit(null).cast("string").as("last_modified"))
        cond(round(2, 2), 2, "b2")
        cond(round(3, 3), 3, "b3")
        cond(round(4, 5), 4, "b4")
        val fetched = docs.select(url.as("url"),
          (lit(1767225600000L) + (did % 20) * 86400000L)
            .as("fetched_at_ms"))
        val meta = docs.filter(did % 7 === 0).select(url.as("loc"),
          lit(null).cast("date").as("lastmod_date"),
          lit("weekly").as("changefreq"),
          lit(null).cast("decimal(2,1)").as("priority"))
        Frontier.revisitDueAdaptive(fetched, "url", "fetched_at_ms",
            meta, "loc", Frontier.changeRates(s, name),
            nowMs = 1768953600000L, defaultIntervalMs = 86400000L,
            minIntervalMs = 129600000L, maxIntervalMs = 2592000000L)
          .select(col("url"), col("host"), col("n_revisits"),
            col("n_changed"), col("interval_ms"), col("staleness_ms"),
            col("revisit_rank"))
          .orderBy(col("url"))
      },
      Some("""WITH f AS (SELECT
          'https://h' || CAST(doc_id % 29 AS VARCHAR) ||
            '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
          1767225600000 + (doc_id % 20) * 86400000 AS fa,
          doc_id AS did FROM documents),
        rt AS (SELECT url, fa, did,
          CAST(3 AS BIGINT) AS n_revisits,
          CAST((CASE WHEN did % 2 = 0 THEN 1 ELSE 0 END) +
               (CASE WHEN did % 3 = 0 THEN 1 ELSE 0 END) +
               (CASE WHEN did % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_changed
          FROM f),
        aiv AS (SELECT *, CASE WHEN did % 7 = 0 THEN 604800000
            WHEN n_changed = 0 THEN 2592000000
            ELSE LEAST(GREATEST((86400000 * n_revisits) // n_changed,
              129600000), 2592000000) END AS interval_ms
          FROM rt),
        du AS (SELECT url, did, n_revisits, n_changed, interval_ms,
            lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1))
              AS host,
            1768953600000 - fa AS staleness_ms
          FROM aiv WHERE fa + interval_ms <= 1768953600000)
        SELECT url, host, n_revisits, n_changed,
          CAST(interval_ms AS BIGINT) AS interval_ms, staleness_ms,
          ROW_NUMBER() OVER (PARTITION BY host
            ORDER BY staleness_ms DESC, url) AS revisit_rank
        FROM du ORDER BY url""")),

    // robots.txt FETCH-STATUS semantics (RFC 9309 §2.3.1) — a crawl
    // knows a fetch RESULT per host, not always a body: 5xx hosts are
    // complete-disallow (the file is undefined), 4xx hosts (incl. 404)
    // are full-allow, 2xx hosts parse normally. h%7==1 → 503 (one such
    // host also carries a Disallow body — ignored, status wins),
    // h%7==2 → 404 (h=9 carries a Disallow body — ignored, 4xx allows),
    // h%3==0 → 200 with Disallow: /doc/, else 200 empty.
    Q("q_robots_unavailable",
      (s, d) => {
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        val hosts = Tables.documents(s, d)
          .select((did % 29).cast("int").as("h")).distinct()
        val robots = hosts.select(
          concat(lit("h"), col("h").cast("string"), lit(".example.org"))
            .as("rhost"),
          when(col("h") % 7 === 1, 503).when(col("h") % 7 === 2, 404)
            .otherwise(200).as("rstatus"),
          when(col("h") % 3 === 0,
            lit("User-agent: *\nDisallow: /doc/"))
            .otherwise(lit("")).as("rbody"))
        graft.operators.Robots.frontierFilterWithStatus(
            Tables.documents(s, d).select(url.as("url")), "url",
            robots, "rhost", "rstatus", "rbody", "GraftBot")
          .select(col("url"), col("host"), col("allowed"))
          .orderBy(col("url"))
      },
      Some("""SELECT
          'https://h' || CAST(doc_id % 29 AS VARCHAR) ||
            '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
          'h' || CAST(doc_id % 29 AS VARCHAR) || '.example.org' AS host,
          CASE WHEN (doc_id % 29) % 7 = 1 THEN FALSE
               WHEN (doc_id % 29) % 7 = 2 THEN TRUE
               WHEN (doc_id % 29) % 3 = 0 THEN FALSE
               ELSE TRUE END AS allowed
        FROM documents ORDER BY url""")),

    // Score-proportional crawl budgets — a bounded fetch round split
    // across hosts by their (PageRank-style) micro-unit scores:
    // budget(h) = clamp(floor(total·score/Σscore), min, max), urls past
    // the budget drop in url order. Scores here are (k+1)·10⁹ for host
    // hk, total 1000, clamp [1, 60] — h28's raw floor(1000·29/435)=66
    // exercises the max clamp, h0's 2 stays above the min.
    Q("q_crawl_budget",
      (s, d) => {
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        val host = concat(lit("h"), (did % 29).cast("string"),
          lit(".example.org"))
        val pending = Tables.documents(s, d)
          .select(url.as("url"), host.as("host"))
        val scores = Tables.documents(s, d)
          .select((did % 29).cast("int").as("h")).distinct()
          .select(
            concat(lit("h"), col("h").cast("string"), lit(".example.org"))
              .as("host"),
            ((col("h") + 1).cast("long") * 1000000000L).as("score"))
        graft.operators.Frontier.crawlBudget(pending, "url", "host",
            scores, "score", total = 1000L, minPerHost = 1L,
            maxPerHost = 60L)
          .select(col("url"), col("host"), col("host_budget"))
          .orderBy(col("url"))
      },
      Some("""WITH f AS (SELECT
          'https://h' || CAST(doc_id % 29 AS VARCHAR) ||
            '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
          'h' || CAST(doc_id % 29 AS VARCHAR) || '.example.org' AS host,
          doc_id % 29 AS k FROM documents),
        b AS (SELECT DISTINCT host,
          GREATEST(LEAST((1000 * (k + 1)) // 435, 60), 1) AS host_budget
          FROM f),
        r AS (SELECT f.url, f.host, b.host_budget,
          ROW_NUMBER() OVER (PARTITION BY f.host ORDER BY f.url) AS rk
          FROM f JOIN b USING (host))
        SELECT url, host, host_budget FROM r
        WHERE rk <= host_budget ORDER BY url""")),

    // STREAMING conditional revisits — the refresh fetcher's mixed
    // 304/200 output driven as 4 micro-batches through
    // conditionalRevisitSink: 304 receipts advance the validator ledger
    // without bodies, unchanged 200s drop at the hash gate, only the
    // rewritten pages (%5s) reach the handler. Output = the final
    // receipt ledger + the accumulated changed set, both replayed in
    // SQL. Stream seqs ride above the round-1 batch seq (seqBase) so
    // the latest-wins fold stays seq-ordered across the two channels.
    Q("q_stream_conditional",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        import graft.operators.Frontier
        val did = col("doc_id")
        val url = concat(lit("https://h"), (did % 29).cast("string"),
          lit(".example.org/doc/"), did.cast("string"))
        val name = s"cfsr_${CorpusKey.of(d)}"
        Frontier.dropChangeLedger(s, name)
        val docs = Tables.documents(s, d)
        val r1 = docs.select(url.as("url"),
          concat(col("text"), lit("|1")).as("content"),
          lit(200).as("status"),
          when(did % 2 === 0, concat(lit("v1-"), did.cast("string")))
            .as("etag"),
          when(did % 3 === 0, concat(lit("lm1-"), did.cast("string")))
            .as("last_modified"))
        Frontier.changedOnlyConditional(s, r1, "url", "content",
          "status", "etag", "last_modified", name, 1, "b1")
        val rewritten = did % 5 === 0
        val hasVal = did % 2 === 0 || did % 3 === 0
        val r2rows = docs.select(url.as("url"),
            when(rewritten, concat(col("text"), lit("|2")))
              .when(hasVal, lit(null).cast("string"))
              .otherwise(concat(col("text"), lit("|1"))).as("content"),
            when(!rewritten && hasVal, 304).otherwise(200).as("status"),
            when(rewritten && did % 2 === 0,
              concat(lit("v2-"), did.cast("string"))).as("etag"),
            when(rewritten && did % 3 === 0,
              concat(lit("lm2-"), did.cast("string"))).as("last_modified"))
          .orderBy(col("url"))
          .as[(String, String, Int, String, String)].collect()
        val chunk = math.max(1, math.ceil(r2rows.length / 4.0).toInt)
        val survivors = scala.collection.mutable.ArrayBuffer.empty[String]
        val mem = MemoryStream[(String, String, Int, String, String)]
        val q = graft.streaming.Streams.conditionalRevisitSink(
          mem.toDF().toDF("url", "content", "status", "etag",
            "last_modified"),
          "url", "content", "status", "etag", "last_modified", name,
          seqBase = 10L, streamTag = Some("ccs")) { changed =>
          survivors ++= changed.select(col("url")).collect()
            .map(_.getString(0))
        }.start()
        r2rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        val ch = survivors.toSeq.toDF("__cu")
        Frontier.latestReceipts(s, name)
          .join(ch, col("url") === col("__cu"), "left")
          .select(col("url"), col("cond_etag"), col("cond_last_modified"),
            col("__cu").isNotNull.as("changed"))
          .orderBy(col("url"))
      },
      Some("""SELECT
          'https://h' || CAST(doc_id % 29 AS VARCHAR) ||
            '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
          CASE WHEN doc_id % 2 = 0 THEN
            (CASE WHEN doc_id % 5 = 0 THEN 'v2-' ELSE 'v1-' END) ||
              CAST(doc_id AS VARCHAR) END AS cond_etag,
          CASE WHEN doc_id % 3 = 0 THEN
            (CASE WHEN doc_id % 5 = 0 THEN 'lm2-' ELSE 'lm1-' END) ||
              CAST(doc_id AS VARCHAR) END AS cond_last_modified,
          (doc_id % 5 = 0) AS changed
        FROM documents ORDER BY url""")),

    // Head-metadata harvest: canonical target (both attribute orders,
    // entity-decoded), robots directives (lowercased), lang attribute,
    // description — the indexability/alias signals a web-curation
    // pipeline reads before touching page content.
    Q("q_html_meta",
      (s, d) => {
        import graft.functions.Html
        metaPages(s, d).select(col("url"),
          Html.canonicalUrl(col("html")).as("canonical"),
          Html.metaRobots(col("html")).as("robots"),
          Html.htmlLang(col("html")).as("lang"),
          Html.metaContent(col("html"), "description").as("description"))
          .orderBy(col("url"))
      },
      Some(s"""WITH $metaExtractSql
        SELECT url, canonical, robots, lang, description
        FROM mx ORDER BY url""")),

    // Canonical-URL dedup: noindex pages drop, alias classes key on
    // their absolute canonical target, one representative survives per
    // class (self-canonical preferred, else smallest url). The alias
    // whose self-canonical rep was itself noindex-dropped survives as
    // its class's only member — replayed in full.
    Q("q_canonical_dedup",
      (s, d) => graft.operators.UrlCuration.canonicalDedup(
          metaPages(s, d), "url", "html")
        .select(col("url"), col("canon_key"))
        .orderBy(col("url")),
      Some(s"""WITH $metaExtractSql,
        mk AS (SELECT url,
            CASE WHEN canonical IS NOT NULL AND
                regexp_matches(canonical, '(?i)^https?://')
              THEN canonical ELSE url END AS canon_key
          FROM mx
          WHERE NOT contains(coalesce(robots, ''), 'noindex')),
        mrep AS (SELECT url, canon_key, row_number() OVER (
            PARTITION BY canon_key
            ORDER BY CAST(url != canon_key AS INT), url) AS rn
          FROM mk)
        SELECT url, canon_key FROM mrep WHERE rn = 1 ORDER BY url"""))
  )
}
