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

  test("changedOnly: new urls pass, unchanged content is filtered " +
      "against the LATEST recorded version, reverts to an old version " +
      "count as changes, replay yields no new work") {
    val s = spark
    import s.implicits._
    import graft.operators.Frontier
    Frontier.dropChangeLedger(s, "chgspec")
    def batch(rows: (String, String)*) = rows.toSeq.toDF("url", "content")
    def run(seq: Long, tag: String, rows: (String, String)*) =
      Frontier.changedOnly(s, batch(rows: _*), "url", "content",
        "chgspec", seq, tag).collect().map(_.getString(0)).toSet
    assert(run(1, "b1", ("u1", "a"), ("u2", "x")) == Set("u1", "u2"))
    // u1 changes, u2 doesn't
    assert(run(2, "b2", ("u1", "b"), ("u2", "x")) == Set("u1"))
    // u1 REVERTS to its round-1 content — vs the latest ("b") that IS
    // a change; u3 is new
    assert(run(3, "b3", ("u1", "a"), ("u2", "x"), ("u3", "z")) ==
      Set("u1", "u3"))
    // replay of the committed batch: no new work, ledger unchanged
    assert(run(3, "b3", ("u1", "a"), ("u2", "x"), ("u3", "z")) ==
      Set.empty)
    assert(run(4, "b4", ("u1", "a")) == Set.empty) // still latest
    Frontier.dropChangeLedger(s, "chgspec")
  }

  test("revisitDue: fresh lastmod overrides any interval, 'never' only " +
      "revisits on fresh lastmod, absent meta uses the default, " +
      "per-host rank orders by priority then staleness") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    val t0 = 1767225600000L // 2026-01-01T00:00Z
    val now = t0 + 14 * day // 2026-01-15
    val fetched = Seq(
      ("https://a.io/hourly-due", t0), // hourly: long elapsed
      ("https://a.io/weekly-not", now - day), // weekly: fetched 1d ago
      ("https://a.io/never-stale", t0), // never + old lastmod: NOT due
      ("https://a.io/never-fresh", t0), // never + lastmod after fetch: due
      ("https://a.io/nometa-due", t0), // no meta row: default 1d → due
      ("https://a.io/nometa-not", now) // no meta row, just fetched
    ).toDF("url", "fetched_at_ms")
    val meta = Seq(
      ("https://a.io/hourly-due", "2025-12-01", "hourly", Some(0.9)),
      ("https://a.io/weekly-not", "2025-12-01", "weekly", Some(0.9)),
      ("https://a.io/never-stale", "2025-12-01", "never", None),
      ("https://a.io/never-fresh", "2026-01-03", "never", None))
      .toDF("loc", "lm", "changefreq", "priority")
      .withColumn("lastmod_date", col("lm").cast("date")).drop("lm")
    val got = graft.operators.Frontier.revisitDue(fetched, "url",
        "fetched_at_ms", meta, "loc", nowMs = now)
      .orderBy(col("url")).collect()
      .map(r => (r.getString(0), r.getDouble(r.fieldIndex("priority")),
        r.getLong(r.fieldIndex("revisit_rank")))).toSeq
    // due set: hourly-due (0.9), never-fresh (0.5 default priority),
    // nometa-due (0.5); ranks: priority desc then staleness desc then url
    assert(got == Seq(
      ("https://a.io/hourly-due", 0.9, 1L),
      ("https://a.io/never-fresh", 0.5, 2L),
      ("https://a.io/nometa-due", 0.5, 3L)))
  }

  test("pending/discoveredPartials on a never-appended frontier return " +
      "empty frames, not a parquet path error (ADVICE r14)") {
    val s = spark
    Frontier.drop(s, "fspec_nv")
    assert(Frontier.pending(s, "fspec_nv").count() == 0)
    assert(Frontier.discoveredPartials(s, "fspec_nv").count() == 0)
    assert(Frontier.latestReceipts(s, "fspec_nv").count() == 0)
  }

  test("conditional fetch: 304 carries the stored hash forward and keeps " +
      "or rotates validators; never-seen 304 drops; receipts surface " +
      "validator-bearing urls first in the revisit queue") {
    val s = spark
    import s.implicits._
    Frontier.dropChangeLedger(s, "cfspec")
    def batch(rows: (String, String, Int, String, String)*) =
      rows.toSeq.toDF("url", "content", "status", "etag", "last_modified")
    def run(seq: Long, tag: String,
            rows: (String, String, Int, String, String)*) =
      Frontier.changedOnlyConditional(s, batch(rows: _*), "url",
        "content", "status", "etag", "last_modified", "cfspec", seq, tag)
        .collect().map(_.getString(0)).toSet
    // round 1: u1 with etag, u2 with last-modified, u3 bare
    assert(run(1, "b1",
      ("u1", "a", 200, "e1", null),
      ("u2", "b", 200, null, "lm1"),
      ("u3", "c", 200, null, null)) == Set("u1", "u2", "u3"))
    // round 2: u1 304 with a ROTATED etag (response wins), u2 304 with
    // no validators (stored carry forward), u3 changed body, u9 is a
    // protocol-impossible never-seen 304 (dropped entirely)
    assert(run(2, "b2",
      ("u1", null, 304, "e2", null),
      ("u2", null, 304, null, null),
      ("u3", "c2", 200, null, null),
      ("u9", null, 304, "ghost", null)) == Set("u3"))
    val rec = Frontier.latestReceipts(s, "cfspec").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rec("u1") == ("e2", null)) // rotated
    assert(rec("u2") == (null, "lm1")) // carried
    assert(rec("u3") == (null, null)) // changed body shipped none
    assert(!rec.contains("u9"))
    // round 3: u1 comes back UNCHANGED as a 200 body (server ignored
    // the validator) — the hash gate still drops it, validators keep
    assert(run(3, "b3", ("u1", "a", 200, null, null)) == Set.empty)
    assert(Frontier.latestReceipts(s, "cfspec").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .apply("u1") == "e2")
    // the conditional revisit queue: validator-bearing urls first per
    // host, then staleness — u3 (no validators) sorts last
    val due = Seq(
      ("u1", "h.io", 0.5, 100L), ("u2", "h.io", 0.5, 300L),
      ("u3", "h.io", 0.5, 999L))
      .toDF("url", "host", "priority", "staleness_ms")
    val q = Frontier.withConditional(due, "url",
        Frontier.latestReceipts(s, "cfspec"))
      .orderBy(col("cond_rank"))
      .collect().map(r => (r.getAs[String]("url"),
        r.getAs[Boolean]("has_validator"), r.getAs[Long]("cond_rank")))
    assert(q.toSeq == Seq(("u2", true, 1L), ("u1", true, 2L),
      ("u3", false, 3L)))
    Frontier.dropChangeLedger(s, "cfspec")
  }

  test("NULL-content 200s drop without poisoning the ledger: the url " +
      "still registers later genuine changes (ADVICE r15)") {
    val s = spark
    import s.implicits._
    Frontier.dropChangeLedger(s, "nullspec")
    def batch(rows: (String, String)*) = rows.toSeq.toDF("url", "content")
    def run(seq: Long, tag: String, rows: (String, String)*) =
      Frontier.changedOnly(s, batch(rows: _*), "url", "content",
        "nullspec", seq, tag).collect().map(_.getString(0)).toSet
    // never-seen url arrives with a NULL body (failed fetch): drops,
    // ledger stays empty for it
    assert(run(1, "b1", ("u1", null), ("u2", "x")) == Set("u2"))
    // the url's first REAL body is new work — a committed null hash
    // would have muted it forever (the old =!= NULL bug)
    assert(run(2, "b2", ("u1", "a"), ("u2", "x")) == Set("u1"))
    // a later null body on a SEEN url also drops and leaves the
    // recorded hash alone
    assert(run(3, "b3", ("u1", null)) == Set.empty)
    assert(run(4, "b4", ("u1", "a")) == Set.empty) // still latest
    assert(run(5, "b5", ("u1", "b")) == Set("u1"))
    // conditional twin: a null-content 200 drops the same way
    Frontier.dropChangeLedger(s, "nullspec2")
    def cbatch(rows: (String, String, Int, String, String)*) =
      rows.toSeq.toDF("url", "content", "status", "etag", "last_modified")
    def crun(seq: Long, tag: String,
             rows: (String, String, Int, String, String)*) =
      Frontier.changedOnlyConditional(s, cbatch(rows: _*), "url",
        "content", "status", "etag", "last_modified", "nullspec2",
        seq, tag).collect().map(_.getString(0)).toSet
    assert(crun(1, "c1", ("u1", null, 200, "e1", null)) == Set.empty)
    assert(crun(2, "c2", ("u1", "a", 200, "e2", null)) == Set("u1"))
    assert(Frontier.latestReceipts(s, "nullspec2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .apply("u1") == "e2")
    Frontier.dropChangeLedger(s, "nullspec")
    Frontier.dropChangeLedger(s, "nullspec2")
  }

  test("changeRates + revisitDueAdaptive: observed rates invert to " +
      "intervals with clamps; declared changefreq and fresh lastmod " +
      "still win; no-history urls fall back to the default") {
    val s = spark
    import s.implicits._
    Frontier.dropChangeLedger(s, "adspec")
    def cbatch(rows: (String, String, Int, String, String)*) =
      rows.toSeq.toDF("url", "content", "status", "etag", "last_modified")
    def crun(seq: Long, tag: String,
             rows: (String, String, Int, String, String)*) =
      Frontier.changedOnlyConditional(s, cbatch(rows: _*), "url",
        "content", "status", "etag", "last_modified", "adspec", seq, tag)
        .collect()
    crun(1, "a1", ("u1", "a", 200, "e1", null),
      ("u2", "b", 200, "e1", null), ("u3", "c", 200, "e1", null))
    crun(2, "a2", ("u1", "a2", 200, "e2", null),
      ("u2", null, 304, null, null), ("u3", "c2", 200, "e2", null))
    crun(3, "a3", ("u1", "a3", 200, "e3", null),
      ("u2", null, 304, null, null), ("u3", null, 304, null, null))
    val rates = Frontier.changeRates(s, "adspec").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // u1 changed on both revisits, u2 on neither, u3 on one
    assert(rates == Map("u1" -> ((2L, 2L)), "u2" -> ((2L, 0L)),
      "u3" -> ((2L, 1L))))
    val fetched = Seq(("u1", 0L), ("u2", 0L), ("u3", 0L), ("u4", 0L))
      .toDF("url", "fetched_at_ms")
    // u2 declares a FRESH lastmod (due regardless of its 0-rate cap);
    // u3 declares hourly (declared wins over its adaptive 200ms)
    val meta = Seq(
      ("u2", Some("2026-01-01"), None: Option[String]),
      ("u3", None: Option[String], Some("hourly")))
      .toDF("loc", "lm", "changefreq")
      .withColumn("lastmod_date", col("lm").cast("date")).drop("lm")
      .withColumn("priority", lit(null).cast("double"))
    val got = Frontier.revisitDueAdaptive(fetched, "url",
        "fetched_at_ms", meta, "loc",
        Frontier.changeRates(s, "adspec"), nowMs = 300L,
        defaultIntervalMs = 100L, minIntervalMs = 150L,
        maxIntervalMs = 1000L)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("interval_ms")).toMap
    // u1: 100·2/2 = 100 → min-clamps to 150, due at 300
    // u2: 0 changes → 1000 cap, NOT elapsed — due only via lastmod
    // u3: declared hourly → 3_600_000, not due
    // u4: no history → default 100, due
    assert(got == Map("u1" -> 150L, "u2" -> 1000L, "u4" -> 100L))
    Frontier.dropChangeLedger(s, "adspec")
  }

  test("crawlBudget: proportional floor allocation, min/max clamps, " +
      "unranked hosts get the floor, BIGINT-overflow scores stay exact") {
    val s = spark
    import s.implicits._
    // big.io dominates, small.io rounds to 0 (min clamp), huge scores
    // (10^12 micro-units × 10^9-url totals) overflow BIGINT products —
    // the decimal path must stay exact
    val scores = Seq(
      ("big.io", 900000000000L), ("mid.io", 99000000000L),
      ("small.io", 1000000000L)).toDF("host", "score")
    val pending = (1 to 30).map(i => (f"https://big.io/$i%02d", "big.io")) ++
      (1 to 30).map(i => (f"https://mid.io/$i%02d", "mid.io")) ++
      (1 to 30).map(i => (f"https://small.io/$i%02d", "small.io")) ++
      Seq(("https://new.io/1", "new.io"), ("https://new.io/2", "new.io"))
    val got = graft.operators.Frontier.crawlBudget(
        pending.toDF("url", "host"), "url", "host",
        scores, "score", total = 20L, minPerHost = 1L, maxPerHost = 15L)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n"), max(col("host_budget")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // Σ = 10^12; raw floors: big 18 → max-clamps to 15, mid 1,
    // small 0 → min-clamps to 1; new.io unranked → min 1
    assert(got == Map(
      "big.io" -> ((15L, 15L)), "mid.io" -> ((1L, 1L)),
      "small.io" -> ((1L, 1L)), "new.io" -> ((1L, 1L))))
    // budgeted rows are the per-host url-order prefix
    val taken = graft.operators.Frontier.crawlBudget(
        pending.toDF("url", "host"), "url", "host",
        scores, "score", total = 20L, minPerHost = 1L, maxPerHost = 15L)
      .filter(col("host") === "big.io")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(taken == (1 to 15).map(i => f"https://big.io/$i%02d"))
    // a zero/empty score table degrades to the floor everywhere
    val zero = graft.operators.Frontier.crawlBudget(
        pending.toDF("url", "host"), "url", "host",
        scores.filter(lit(false)), "score", total = 20L,
        minPerHost = 2L, maxPerHost = 15L)
      .groupBy(col("host")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(zero.values.toSet == Set(2L))
  }

  test("mixed-schema change ledger: receipts stay visible after a " +
      "conditional append to a legacy 3-column ledger (ADVICE r16 — " +
      "mergeSchema read, not footer-sampling luck)") {
    val s = spark
    import s.implicits._
    Frontier.dropChangeLedger(s, "mixspec")
    // legacy pre-validator ledger: several 3-column (url, h, seq)
    // files, written before etag/last_modified existed — enough files
    // that a single-sampled-footer read would likely pick a legacy one
    val legacy = graft.sources.IncrementalIndex.Spec(
      s"/tmp/graft-warehouse/apps/" +
        s"${s.sparkContext.applicationId}/frontier_idx",
      "mixspec_chg", None)
    (1 to 4).foreach { i =>
      graft.sources.IncrementalIndex.append(s, legacy,
        Seq((s"legacy$i", i.toLong, 0L)).toDF("url", "h", "seq")
          .repartition(2),
        s"legacy$i")
    }
    // first conditional append lands 5-column files next to them
    Frontier.changedOnlyConditional(s,
      Seq(("u1", "body", 200, "e1", "lm1"))
        .toDF("url", "content", "status", "etag", "last_modified"),
      "url", "content", "status", "etag", "last_modified",
      "mixspec", 1L, "c1")
    // the stored receipt must be deterministically visible
    val rec = Frontier.latestReceipts(s, "mixspec").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rec("u1") == (("e1", "lm1")))
    assert(rec("legacy1") == ((null, null))) // backfilled, not an error
    // and conditional revalidation actually uses it: an unchanged 304
    // for u1 drops while the ledger carries the validators forward
    val out = Frontier.changedOnlyConditional(s,
      Seq(("u1", null.asInstanceOf[String], 304,
        null.asInstanceOf[String], null.asInstanceOf[String]))
        .toDF("url", "content", "status", "etag", "last_modified"),
      "url", "content", "status", "etag", "last_modified",
      "mixspec", 2L, "c2").collect()
    assert(out.isEmpty)
    assert(Frontier.latestReceipts(s, "mixspec").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .apply("u1") == "e1")
    Frontier.dropChangeLedger(s, "mixspec")
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
