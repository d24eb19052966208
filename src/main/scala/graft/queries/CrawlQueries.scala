package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
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
        FROM sch s LEFT JOIN cdly c USING (host) ORDER BY url"""))
  )
}
