package graft

import graft.operators.Sitemaps
import org.apache.spark.sql.functions._

class SitemapsSpec extends SparkSpec {

  private def df(rows: Seq[(String, String)])
  : org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("host", "xml")
  }

  test("urls: loc entity-decodes once, optional fields null when " +
      "absent/blank/unparseable, whitespace-tolerant tags") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc> https://a.io/x?a=1&amp;b=2 </loc>
        |  <lastmod>2026-03-07T10:30:00+02:00</lastmod>
        |  <changefreq>WEEKLY</changefreq><priority>0.8</priority></url>
        |<url
        |><loc>https://a.io/amp/&amp;lt;</loc><lastmod>nope</lastmod>
        |  <priority>high</priority></url>
        |<url><loc></loc></url>
        |</urlset>""".stripMargin
    val got = Sitemaps.urls(df(Seq(("a.io", xml))), "xml",
        keep = Seq("host")).orderBy(col("loc")).collect()
    assert(got.length == 2)
    val r1 = got.find(_.getString(1).contains("a=1")).get
    assert(r1.getString(1) == "https://a.io/x?a=1&b=2")
    assert(r1.getDate(2).toString == "2026-03-07")
    assert(r1.getString(3) == "weekly")
    assert(r1.getDecimal(4).doubleValue() == 0.8)
    // one-decode rule: &amp;lt; → literal "&lt;"; bad lastmod/priority → null
    val r2 = got.find(_.getString(1).contains("amp")).get
    assert(r2.getString(1) == "https://a.io/amp/&lt;")
    assert(r2.isNullAt(2) && r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("indexLocs: child sitemaps of a sitemapindex; urls() over an " +
      "index doc yields nothing") {
    val xml =
      """<sitemapindex><sitemap><loc>https://a.io/s1.xml</loc>
        |<lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><loc> https://a.io/s2.xml </loc></sitemap>
        |</sitemapindex>""".stripMargin
    val d = df(Seq(("a.io", xml)))
    assert(Sitemaps.indexLocs(d, "xml").orderBy(col("loc")).collect()
      .map(_.getString(0)).toSeq ==
      Seq("https://a.io/s1.xml", "https://a.io/s2.xml"))
    assert(Sitemaps.urls(d, "xml").count() == 0)
  }

  test("discoverFrontier: union dedups with provenance flags, " +
      "relative links drop") {
    val s = spark
    import s.implicits._
    val sm = Seq("https://a.io/both", "https://a.io/only-sm")
      .toDF("loc")
    val pages = Seq(
      """<a href="https://a.io/both">x</a><a href="/rel">r</a>""",
      """<a href="https://b.io/only-link">y</a>""").toDF("html")
    val got = Sitemaps.discoverFrontier(sm, "loc", pages, "html")
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
      .toSeq
    assert(got == Seq(
      ("https://a.io/both", true, true),
      ("https://a.io/only-sm", true, false),
      ("https://b.io/only-link", false, true)))
  }
}
