package graft

import graft.operators.LinkGraph
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {

  test("anchorHrefs + hostOfAbs: case-insensitive tags, whitespace " +
      "around =, relative/mailto ignored, no-anchor doc empty") {
    val s = spark
    import s.implicits._
    val html =
      """<html><a href="https://A.io/x">1</a>
        |<A  HREF = "http://b.io:8080/y?q#f">2</A>
        |<a class="z" href="/rel">3</a>
        |<a href="mailto:x@y.z">4</a></html>""".stripMargin
    val row = Seq(html).toDF("h").select(
      LinkGraph.anchorHrefs(col("h")).as("hr")).head()
    assert(row.getSeq[String](0) == Seq("https://A.io/x",
      "http://b.io:8080/y?q#f", "/rel", "mailto:x@y.z"))
    val hosts = Seq("https://A.io/x", "http://b.io:8080/y?q#f", "/rel",
      "mailto:x@y.z", "ftp://c.io/z").toDF("u")
      .select(LinkGraph.hostOfAbs(col("u")).as("h")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    // port stays in the authority split only up to : — host only
    assert(hosts == Seq("a.io", "b.io", null, null, null))
  }

  test("edges: pair counts aggregate, self-loops drop") {
    val s = spark
    import s.implicits._
    def page(host: String, links: String*): (String, String) =
      (s"https://$host/p",
        links.map(l => s"""<a href="https://$l/x">t</a>""").mkString)
    val pages = Seq(
      page("a.io", "b.io", "b.io", "a.io"), // self-loop must drop
      page("a.io", "c.io"),
      page("b.io", "a.io")).toDF("uri", "html")
    val got = LinkGraph.edges(pages, "uri", "html")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a.io", "b.io", 2L), ("a.io", "c.io", 1L),
      ("b.io", "a.io", 1L)))
  }

  test("pageRank: one iteration of the integer arithmetic matches the " +
      "hand computation; layout-invariant") {
    val s = spark
    import s.implicits._
    // a→b, a→c, b→a; c dangling. base = 1e12/3, teleport = 49999999999
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "n")
    val r1 = LinkGraph.pageRank(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map(
      "a" -> 333333333332L, // teleport + 850‰ of b's whole mass
      "b" -> 191666666665L, // teleport + 850‰ of half of a's mass
      "c" -> 191666666665L))
    // total mass decays (dangling c + floor dust) — the documented form
    assert(r1.values.sum < 1000000000000L)
    val r1b = LinkGraph.pageRank(edges.repartition(7), iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1b == r1, "rank must be independent of partitioning")
    // zero iterations = the uniform base
    val r0 = LinkGraph.pageRank(edges, iters = 0)
      .collect().map(_.getLong(1)).toSet
    assert(r0 == Set(333333333333L))
  }

  test("anchorTexts: href+inner pairing, markup strip, whitespace " +
      "canon, relative targets dropped, counts aggregate") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      """<a href="https://x.io/a">read <b>this</b>
        |  now</a><a href="https://x.io/b">read this now</a>""".stripMargin,
      """<a class="k" href="https://y.io/c">other</a>
        |<a href="/rel">skipped</a><a href="https://z.io/d">  </a>"""
        .stripMargin).toDF("html")
    val got = graft.operators.LinkGraph.anchorTexts(pages, "html")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // the two x.io anchors canonicalize to the SAME text and aggregate;
    // the whitespace-only z.io anchor drops; /rel drops
    assert(got == Set(("x.io", "read this now", 2L),
      ("y.io", "other", 1L)))
  }

  test("pageRankWarm: carried hosts start from prior ranks, new hosts " +
      "from the merged base; one warm round equals the hand-traceable " +
      "update") {
    val s = spark
    import s.implicits._
    val e1 = Seq(("a", "b", 1L)).toDF("src", "dst", "n")
    val prior = LinkGraph.pageRank(e1, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=2, base=5e11, teleport=75e9: a gets teleport only, b gets
    // teleport + 850‰ of a's 5e11
    assert(prior == Map("a" -> 75000000000L, "b" -> 500000000000L))
    val merged = Seq(("a", "b", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "n")
    val warm = LinkGraph.pageRankWarm(merged,
        Seq(("a", 75000000000L), ("b", 500000000000L))
          .toDF("host", "rank_u"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=3: base=333333333333, teleport=49999999999; c is NEW → starts
    // from the merged base. a ← 850‰·c: 49999999999+283333333333
    // b ← 850‰·a(prior 75e9): 49999999999+63750000000
    assert(warm == Map(
      "a" -> 333333333332L,
      "b" -> 113749999999L,
      "c" -> 49999999999L))
  }

  test("edge index: per-batch partial counts accumulate, a replayed " +
      "tag is a no-op, loadEdges equals one-shot extraction") {
    val s = spark
    import s.implicits._
    import graft.operators.LinkGraph
    def page(host: String, links: String*): (String, String) =
      (s"https://$host/p",
        links.map(l => s"""<a href="https://$l/x">t</a>""").mkString)
    val b1 = Seq(page("a.io", "b.io"), page("b.io", "a.io"))
    val b2 = Seq(page("a.io", "b.io", "c.io"))
    LinkGraph.dropEdgeIndex(s, "lg_spec")
    LinkGraph.appendEdges(s, b1.toDF("uri", "html"), "uri", "html",
      "lg_spec", "t0")
    LinkGraph.appendEdges(s, b2.toDF("uri", "html"), "uri", "html",
      "lg_spec", "t1")
    // at-least-once replay of t1 must not double the counts
    LinkGraph.appendEdges(s, b2.toDF("uri", "html"), "uri", "html",
      "lg_spec", "t1")
    val got = LinkGraph.loadEdges(s, "lg_spec").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val oneShot = LinkGraph.edges((b1 ++ b2).toDF("uri", "html"),
        "uri", "html").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == oneShot &&
      got == Set(("a.io", "b.io", 2L), ("b.io", "a.io", 1L),
        ("a.io", "c.io", 1L)))
    LinkGraph.dropEdgeIndex(s, "lg_spec")
  }

  test("hostRank composes extraction and ranking; a hub host outranks " +
      "leaves after 3 iterations") {
    val s = spark
    import s.implicits._
    // star: 10 leaves all link to hub.io; hub links to one leaf
    val pages = (1 to 10).map(i =>
      (s"https://l$i.io/p", """<a href="https://hub.io/x">t</a>""")) :+
      ("https://hub.io/p", """<a href="https://l1.io/x">t</a>""")
    val ranks = LinkGraph.hostRank(pages.toDF("uri", "html"),
        "uri", "html", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hub = ranks("hub.io")
    assert((2 to 10).forall(i => ranks(s"l$i.io") < hub),
      s"hub must outrank plain leaves: $ranks")
    assert(ranks("l1.io") > ranks("l2.io"),
      "the leaf the hub links back to inherits hub mass")
  }
}
