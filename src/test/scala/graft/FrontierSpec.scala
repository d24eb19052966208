package graft

import graft.operators.Frontier
import org.apache.spark.sql.functions._

class FrontierSpec extends SparkSpec {

  private def disc(rows: Seq[(String, Boolean, Boolean)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("url", "from_sitemap", "from_link")
  }

  private def urls(us: Seq[String]) = {
    val s = spark
    import s.implicits._
    us.toDF("url")
  }

  test("pending = discovered minus fetched, provenance OR-folds across " +
      "sightings, appends accumulate across batches") {
    val s = spark
    Frontier.drop(s, "fspec")
    Frontier.appendDiscovered(s, disc(Seq(
      ("https://a.io/1", false, true),
      ("https://a.io/2", true, false))), "url", "fspec", "b0")
    Frontier.appendDiscovered(s, disc(Seq(
      ("https://a.io/1", true, false), // second sighting, other channel
      ("https://a.io/3", false, false))), "url", "fspec", "b1")
    Frontier.appendFetched(s, urls(Seq("https://a.io/2")), "url",
      "fspec", "f0")
    val got = Frontier.pending(s, "fspec").orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      ("https://a.io/1", true, true), // OR of both sightings
      ("https://a.io/3", false, false)))
    // a later fetch retires the url from pending
    Frontier.appendFetched(s, urls(Seq("https://a.io/1")), "url",
      "fspec", "f1")
    assert(Frontier.pending(s, "fspec").collect().map(_.getString(0))
      .toSeq == Seq("https://a.io/3"))
    Frontier.drop(s, "fspec")
  }

  test("at-least-once replay of a committed tag is a no-op on the " +
      "partial ledger (not just hidden by the OR-fold)") {
    val s = spark
    Frontier.drop(s, "fspec2")
    def append() = Frontier.appendDiscovered(s,
      disc(Seq(("https://a.io/x", false, true))), "url", "fspec2", "t1")
    append()
    assert(Frontier.hasDiscoveredTag(s, "fspec2", "t1"))
    val n1 = Frontier.discoveredPartials(s, "fspec2").count()
    append() // replay: committed tag must not re-append
    assert(Frontier.discoveredPartials(s, "fspec2").count() == n1)
    Frontier.drop(s, "fspec2")
  }
}
