package graft

import graft.functions.Html
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  private def extract(htmls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    htmls.toDF("h").select(Html.htmlText(col("h")).as("t"))
      .collect().map(_.getString(0)).toSeq
  }

  test("htmlText strips tags, keeps content, drops script/style WITH " +
    "content and comments") {
    val Seq(a) = extract(
      "<html><head><style>p { x: 1 }</style>" +
        "<script type=\"t\">var s = \"<p>fake</p>\";</script></head>" +
        "<body><!-- note <b>bold</b> --><p>Hello <b>world</b></p>" +
        "</body></html>")
    assert(a == "Hello world")
  }

  test("block-closing tags and <br> become line breaks; blank lines cap " +
    "at one; inline tags do not break lines") {
    val Seq(a) = extract(
      "<h1>Title</h1><p>one</p>\n\n\n\n<p>two<br>three<br/>four</p>" +
        "<ul><li>x</li><li>y</li></ul><span>tail</span>")
    // "</li></ul>" yields newline+newline — one blank line, which the
    // cap permits (it only folds 3+)
    assert(a == "Title\none\n\ntwo\nthree\nfour\nx\ny\n\ntail")
  }

  test("named entities decode once, &amp; last (one-decode rule)") {
    val Seq(a) = extract(
      "<p>a &lt;b&gt; &quot;c&quot; d&#39;e f&apos;g h&nbsp;i " +
        "&amp; &amp;lt; &#x41;</p>")
    // &amp;lt; → literal "&lt;" (NOT "<"); hex numeric passes through
    assert(a == "a <b> \"c\" d'e f'g h i & &lt; &#x41;")
  }

  test("malformed input: unterminated trailing tag drops, lone '<' and " +
    "empty/null survive") {
    val s = spark
    import s.implicits._
    val Seq(a, b, c) = extract("text <unclosed", "a < b", "")
    assert(a == "text")
    assert(b == "a")  // "< b" parses as an unterminated tag — regex tier
    assert(c == "")
    val n = Seq[Option[String]](None).toDF("h")
      .select(Html.htmlText(col("h"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("htmlTitle extracts, entity-decodes and flattens; empty when " +
    "absent") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "<head><title> A &amp;\n B </title></head><title>second</title>",
      "<p>no title</p>").toDF("h")
      .select(Html.htmlTitle(col("h"))).collect().map(_.getString(0))
    assert(out(0) == "A & B") // first title wins, ws flattened
    assert(out(1) == "")
  }

  test("linkDensity counts visible anchor chars over visible text chars; " +
    "null on empty pages") {
    val s = spark
    import s.implicits._
    val out = Seq(
      // total text "Visit here now" (14 incl spaces), anchor "here" (4)
      "<p>Visit <a href=\"x\">here</a> now</p>",
      // nested markup in the anchor counts visible chars only
      "<p><a><b>ab</b> cd</a></p>",
      "<p>no links at all</p>",
      "<script>x()</script>").toDF("h")
      .select(Html.linkDensity(col("h")).as("d")).collect()
    assert(math.abs(out(0).getDouble(0) - 4.0 / 14) < 1e-12)
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    assert(out(2).getDouble(0) == 0.0)
    assert(out(3).isNullAt(0)) // 0/0 — no visible text, no signal
  }

  test("hostSuffixes enumerates dot-suffixes shortest-first") {
    val s = spark
    import s.implicits._
    val out = Seq("a.b.co.uk", "localhost").toDF("h")
      .select(graft.operators.UrlCuration.hostSuffixes(col("h")))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("uk", "co.uk", "b.co.uk", "a.b.co.uk"))
    assert(out(1) == Seq("localhost"))
  }

  test("filterBlocklist: entry blocks itself and subdomains, not " +
    "lookalike hosts; empty blocklist keeps all; parallelism-invariant") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "example.com"), (2L, "a.b.example.com"), (3L, "ads.example.com"),
      (4L, "notexample.com"), (5L, "example.com.evil.io"),
      (6L, "sub.ads.other.org"), (7L, "clean.org"))
    val df = rows.toDF("id", "host")
    val bl = Seq("example.com", "ads.other.org").toDF("domain")
    val kept = operators.UrlCuration.filterBlocklist(df, "host", "id", bl)
      .collect().map(_.getLong(0)).toSet
    // 1,2,3 under example.com; 6 under ads.other.org; 5 only CONTAINS the
    // string — its suffixes are evil.io etc., so it survives
    assert(kept == Set(4L, 5L, 7L))
    val re = operators.UrlCuration.filterBlocklist(df.repartition(7),
      "host", "id", bl).collect().map(_.getLong(0)).toSet
    assert(re == kept)
    val all = operators.UrlCuration.filterBlocklist(df, "host", "id",
      Seq.empty[String].toDF("domain")).count()
    assert(all == rows.size)
  }

  test("native htmlText kernel is bit-identical to the regexp chain on " +
    "adversarial fuzzed HTML (the oracle's replay target)") {
    val s = spark
    import s.implicits._
    val frags = Array(
      "<p>", "</p>", "<div class=\"x\">", "</div>", "<br>", "<br/>",
      "<br />", "<BR>", "</LI>", "</ul >", "<script>", "</script>",
      "</script >", "<script src=\"x\">", "<style>", "</style>",
      "<SCRIPT>", "</SCRIPT>", "<!--", "-->", "<!-- c -->", "<a href=x>",
      "</a>", "<b>", "</b>", "<title>", "</title>", "&amp;", "&lt;",
      "&amp;lt;", "&nbsp;", "&#39;", "&bogus;", "&", ";", "<", ">",
      "< ", " >", "<unclosed", "text", "word", "  ", "\n", "\n\n\n",
      "\t", "\r\n", " \n ", "x y", "<scripts>", "</scriptx>", "<p/>",
      "<h3>", "</h3>", "</pre>", "</park>", "<em>q</em>")
    val rnd = new scala.util.Random(20260815)
    val docs = (0 until 400).map { _ =>
      val n = 1 + rnd.nextInt(24)
      (0 until n).map(_ => frags(rnd.nextInt(frags.length))).mkString
    } :+ "" :+ "<script>never closed" :+ "<!-- <script>x</script> -->" :+
      "<script><!-- </script> -->tail</script>" :+
      "<p>a<p>b<br>c<!--" :+ "< <>" :+ "a > b <c"
    val out = docs.toDF("h").select(
        functions.Html.htmlText(col("h")).as("k"),
        functions.Html.htmlTextChain(col("h")).as("c"))
      .collect()
    out.zip(docs).foreach { case (r, d) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel/chain diverge on: ${d.take(120)}")
    }
  }

  test("a bare-TLD blocklist entry blocks everything under it (suffix " +
    "semantics are the list author's contract)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a.zz"), (2L, "b.c.zz"), (3L, "a.org"))
      .toDF("id", "host")
    val kept = operators.UrlCuration.filterBlocklist(df, "host", "id",
      Seq("zz").toDF("domain")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("head metadata: canonical both attribute orders + entity decode, " +
      "metaContent, metaRobots lowercases, htmlLang; nulls when absent") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      ("<html lang=\"EN-us\"><head>" +
        "<link rel=\"canonical\" href=\"https://a.io/x?a=1&amp;b=2\">" +
        "<meta name=\"robots\" content=\"NOINDEX, nofollow\">" +
        "<meta content=\"Q&amp;A site\" name=\"description\">" +
        "</head></html>"),
      ("<html><head>" +
        "<link href=\"https://b.io/y\" rel=\"canonical\"></head></html>"),
      ("<html><body>plain</body></html>")).toDF("h")
    val got = pages.select(
      functions.Html.canonicalUrl(col("h")).as("c"),
      functions.Html.metaRobots(col("h")).as("r"),
      functions.Html.metaContent(col("h"), "description").as("d"),
      functions.Html.htmlLang(col("h")).as("l")).collect()
    assert(got(0).getString(0) == "https://a.io/x?a=1&b=2")
    assert(got(0).getString(1) == "noindex, nofollow")
    assert(got(0).getString(2) == "Q&A site")
    assert(got(0).getString(3) == "en-us")
    assert(got(1).getString(0) == "https://b.io/y")
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert((0 to 3).forall(got(2).isNullAt))
  }

  test("canonicalDedup: noindex drops, alias groups collapse to the " +
      "self-canonical page (else smallest url), no-canonical pages key " +
      "on themselves") {
    val s = spark
    import s.implicits._
    def canon(href: String) =
      s"""<link rel="canonical" href="$href">"""
    val pages = Seq(
      ("https://a.io/1", canon("https://a.io/1")), // self-canonical rep
      ("https://a.io/1?utm=x", canon("https://a.io/1")), // alias drops
      ("https://a.io/0", canon("https://a.io/1")), // alias (smaller url!)
      ("https://b.io/2", canon("https://b.io/gone")), // target absent:
      ("https://b.io/3", canon("https://b.io/gone")), //  smallest wins
      ("https://c.io/4",
        canon("https://c.io/4") +
          "<meta name=\"robots\" content=\"noindex\">"), // drops
      ("https://d.io/5", ""), // no canonical → own key
      ("https://d.io/5?p=1", "<link rel=\"canonical\" href=\"/rel\">")
    ).toDF("url", "html")
    val got = operators.UrlCuration.canonicalDedup(pages, "url", "html")
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got == Seq(
      ("https://a.io/1", "https://a.io/1"),
      ("https://b.io/2", "https://b.io/gone"),
      ("https://d.io/5", "https://d.io/5"),
      // relative canonical ignored → own-url key → distinct group
      ("https://d.io/5?p=1", "https://d.io/5?p=1")))
  }
}
