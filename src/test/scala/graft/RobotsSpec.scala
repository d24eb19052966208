package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {

  private val body =
    """# policy
      |Disallow: /stray
      |User-Agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp*
      |Disallow: /exact$
      |Crawl-delay: 1.5
      |
      |User-agent: GraftBot
      |User-agent: otherbot
      |Disallow: /graft
      |Allow: /graft/ok*
      |Sitemap: https://a.io/sitemap.xml
      |Crawl-delay: 2
      |Crawl-delay: 3
      |""".stripMargin

  private def robotsDf: org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    Seq(("a.io", body)).toDF("host", "body")
  }

  private def urlDf(urls: Seq[String]): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    urls.toDF("url")
  }

  test("rules: groups split on UA runs, multi-UA groups repeat rules, " +
      "pre-group rules drop, comments and case handled") {
    val got = Robots.rules(robotsDf, "host", "body")
      .orderBy(col("agent"), col("ln"))
      .collect()
      .map(r => (r.getString(1), r.getBoolean(3), r.getString(4)))
      .toSeq
    val star = Seq(
      ("*", false, "/private"), ("*", true, "/private/ok"),
      ("*", false, "/tmp*"), ("*", false, "/exact$"))
    val graft = Seq(
      ("graftbot", false, "/graft"), ("graftbot", true, "/graft/ok*"))
    val other = Seq(
      ("otherbot", false, "/graft"), ("otherbot", true, "/graft/ok*"))
    assert(got == star ++ graft ++ other)
  }

  test("crawlDelays are group-scoped and fractional-exact; sitemaps " +
      "are file-scoped and don't split the UA run") {
    val d = Robots.crawlDelays(robotsDf, "host", "body")
      .orderBy(col("agent"), col("ln")).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    // sitemap line sits between the graftbot group's rules and its
    // delays — both delays must still land in that group
    assert(d == Seq(("*", 1500L), ("graftbot", 2000L),
      ("graftbot", 3000L), ("otherbot", 2000L), ("otherbot", 3000L)))
    val sm = Robots.sitemaps(robotsDf, "host", "body").collect()
      .map(_.getString(1)).toSeq
    assert(sm == Seq("https://a.io/sitemap.xml"))
  }

  test("frontierFilter: longest-match wins, Allow wins ties, * and $ " +
      "wildcards, specific group shadows *, unknown host allowed") {
    val f = urlDf(Seq(
      "https://a.io/private/x", // * group would block; graftbot has no rule
      "https://a.io/graft/z", // graftbot: blocked (/graft)
      "https://a.io/graft/ok9", // graftbot: /graft/ok* (10) beats /graft (6)
      "https://nobody.example/x")) // no robots → allowed
    val got = Robots.frontierFilter(f, "url", robotsDf, "host", "body",
        "GraftBot")
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getBoolean(r.fieldIndex("allowed"))))
      .toSeq
    assert(got == Seq(
      ("https://a.io/graft/ok9", true),
      ("https://a.io/graft/z", false),
      ("https://a.io/private/x", true),
      ("https://nobody.example/x", true)))
    // the * group for an agent no group names
    val got2 = Robots.frontierFilter(
      urlDf(Seq("https://a.io/private/x", "https://a.io/private/ok/y",
        "https://a.io/tmp123?q=1#frag", "https://a.io/exact",
        "https://a.io/exactly", "https://a.io")),
      "url", robotsDf, "host", "body", "Crawlzilla")
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getBoolean(r.fieldIndex("allowed"))))
      .toSeq
    assert(got2 == Seq(
      ("https://a.io", true), // no path → "/" matches nothing
      ("https://a.io/exact", false), // $-anchored
      ("https://a.io/exactly", true), // anchor rejects the superstring
      ("https://a.io/private/ok/y", true), // Allow(11) beats Disallow(8)
      ("https://a.io/private/x", false),
      ("https://a.io/tmp123?q=1#frag", false))) // * spans path+query
  }

  test("crawl composition: pending → crawlBudget → schedule — the " +
      "budget prefix enters the politeness queue, slots pace at the " +
      "group delay") {
    val s = spark
    import s.implicits._
    val robots = Seq(("a.io", "User-agent: *\nCrawl-delay: 2"))
      .toDF("host", "body")
    val pending = ((1 to 10).map(i => (f"https://a.io/$i%02d", "a.io")) ++
      (1 to 4).map(i => (f"https://b.io/$i%02d", "b.io")))
      .toDF("url", "host")
    val scores = Seq(("a.io", 3000000000L), ("b.io", 1000000000L))
      .toDF("host", "score")
    // budgets: Σ=4e9, total 4 → a.io floor(3)=3, b.io floor(1)=1
    val budgeted = graft.operators.Frontier.crawlBudget(
      pending, "url", "host", scores, "score", total = 4L)
    val sched = graft.operators.Robots.schedule(
        budgeted.drop("host", "host_budget"), "url",
        robots, "host", "body", "GraftBot")
      .orderBy(col("host"), col("slot")).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Long]("slot"),
        r.getAs[Long]("fetch_at_ms")))
    assert(sched.toSeq == Seq(
      ("https://a.io/01", 0L, 0L), // a.io paces at its 2s crawl-delay
      ("https://a.io/02", 1L, 2000L),
      ("https://a.io/03", 2L, 4000L),
      ("https://b.io/01", 0L, 0L))) // b.io: budget 1, default delay
  }

  test("query-no-path urls match against '/?query' (RFC 9309 matches " +
      "path+query; ADVICE r14)") {
    val s = spark
    import s.implicits._
    val robots = Seq(("q.io",
      "User-agent: *\nDisallow: *q=1\nDisallow: /only-slash$"))
      .toDF("host", "body")
    val got = Robots.frontierFilter(urlDf(Seq(
        "https://q.io?q=1", // no path, query → target "/?q=1" → blocked
        "https://q.io?q=2#f", // fragment excluded, query kept → allowed
        "https://q.io")), // no path, no query → "/" → allowed
      "url", robots, "host", "body", "x")
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getBoolean(r.fieldIndex("allowed"))))
      .toSeq
    assert(got == Seq(
      ("https://q.io", true),
      ("https://q.io?q=1", false),
      ("https://q.io?q=2#f", true)))
  }

  test("frontierFilterWithStatus: 5xx = complete disallow, 4xx = full " +
      "allow (body ignored), 2xx parses, absent host allowed " +
      "(RFC 9309 §2.3.1)") {
    val s = spark
    import s.implicits._
    val deny = "User-agent: *\nDisallow: /"
    val robots = Seq(
      ("ok.io", 200, deny), // parsed: everything blocked
      ("gone.io", 404, deny), // 4xx: body ignored, full allow
      ("err.io", 503, ""), // 5xx: complete disallow
      ("moved.io", 301, deny)) // non-2xx/4xx/5xx terminal: no rules
      .toDF("host", "status", "body")
    val got = Robots.frontierFilterWithStatus(urlDf(Seq(
        "https://ok.io/x", "https://gone.io/x", "https://err.io/x",
        "https://moved.io/x", "https://nobody.io/x")),
      "url", robots, "host", "status", "body", "x")
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getBoolean(r.fieldIndex("allowed"))))
      .toSeq
    assert(got == Seq(
      ("https://err.io/x", false),
      ("https://gone.io/x", true),
      ("https://moved.io/x", true),
      ("https://nobody.io/x", true),
      ("https://ok.io/x", false)))
  }

  test("schedule: per-host url-ordered slots at the governing group's " +
      "last declared delay, default where none") {
    val f = urlDf(Seq("https://a.io/p2", "https://a.io/p1",
      "https://b.io/q1", "https://b.io/q2"))
    val got = Robots.schedule(f, "url", robotsDf, "host", "body",
        "GraftBot", defaultDelayMs = 700L)
      .orderBy(col("url")).collect()
      .map(r => (r.getString(r.fieldIndex("url")),
        r.getLong(r.fieldIndex("slot")),
        r.getLong(r.fieldIndex("fetch_at_ms")))).toSeq
    // a.io: graftbot group's LAST delay (3s); b.io: no robots → default
    assert(got == Seq(
      ("https://a.io/p1", 0L, 0L), ("https://a.io/p2", 1L, 3000L),
      ("https://b.io/q1", 0L, 0L), ("https://b.io/q2", 1L, 700L)))
  }

  test("RepMatch kernel ≡ the ruleRegex regexp chain on 600 fuzzed " +
      "(path, rule) pairs incl. wildcards, anchors, and metachars") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val pathAlpha = "abc/.?&=%+()[]|^"
    val ruleAlpha = "abc/.*$?+()"
    def rand(alpha: String, n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (0 until 600).map { _ =>
      ("/" + rand(pathAlpha, rnd.nextInt(18)),
        "/" + rand(ruleAlpha, rnd.nextInt(10)))
    } ++ Seq( // directed edges
      ("/exact", "/exact$"), ("/exactly", "/exact$"),
      ("/a/b/c", "/a*c$"), ("/a/b/c", "/a*c"), ("/ac", "/a*c$"),
      ("/a**b", "/a**b"), ("/aXYb", "/a**b$"), ("/x", "/"),
      ("/.dot", "/.dot"), ("/qdot", "/.dot"), ("/a$b", "/a$b"))
    val df = pairs.toDF("p", "r")
    val bad = df.select(col("p"), col("r"),
        org.apache.spark.sql.graft.RepMatchKernel
          .column(col("p"), col("r")).as("k"),
        org.apache.spark.sql.functions.regexp_like(col("p"),
          graft.operators.Robots.ruleRegex(col("r"))).as("re"))
      .filter(col("k") =!= col("re")).collect()
    assert(bad.isEmpty, bad.take(5).mkString(";"))
  }

  test("CRLF bodies and tab-padded keys parse identically to LF " +
      "(real-world robots.txt is frequently CRLF)") {
    val s = spark
    import s.implicits._
    val crlf = "User-agent:\t*\r\nDisallow : /sp\r\n" +
      "Disallow:\t/private\r\nAllow: /private/ok\t\r\nCrawl-delay: 2\r\n"
    // "Disallow : /sp" has whitespace around the colon — RFC 9309's
    // grammar allows it and the parser (like the oracle) accepts it
    val df = Seq(("a.io", crlf)).toDF("host", "body")
    val rules = Robots.rules(df, "host", "body").orderBy(col("ln"))
      .collect().map(r => (r.getBoolean(3), r.getString(4))).toSeq
    assert(rules == Seq((false, "/sp"), (false, "/private"),
      (true, "/private/ok")))
    val d = Robots.crawlDelays(df, "host", "body").collect()
      .map(_.getLong(3)).toSeq
    assert(d == Seq(2000L))
  }

  test("frontierFilter result is partition-layout invariant") {
    val urls = (0 until 64).map(i => s"https://a.io/tmp$i")
    val one = Robots.frontierFilter(
      urlDf(urls).repartition(1), "url",
      robotsDf, "host", "body", "x").orderBy(col("url"))
      .collect().map(_.toSeq).toSeq
    val many = Robots.frontierFilter(
      urlDf(urls).repartition(7), "url",
      robotsDf, "host", "body", "x").orderBy(col("url"))
      .collect().map(_.toSeq).toSeq
    assert(one == many && one.size == 64)
  }
}
