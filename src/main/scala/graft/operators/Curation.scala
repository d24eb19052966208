package graft.operators

import graft.functions.{Repetition, TextAnalysis => TA}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed corpus-curation pipeline — the "run the whole filter stack in
  * one pass" operator a training-data pipeline actually calls, built from
  * the individually-gated signals: language ID, token-count bounds,
  * duplicate-segment repetition, and the composite quality score.
  *
  * Everything is a single codegen projection per row (the signals share
  * one tokenization via common-subexpression reuse) followed by a filter —
  * no shuffle, no UDFs, linear at any scale. [[annotate]] returns every
  * row with per-filter verdict flags (the audit view: WHY a document was
  * dropped); [[curate]] keeps the survivors.
  */
object Curation {

  /** Thresholds for the filter stack. `allowedLangs` values must come from
    * [[TA.stopwords]]' language set (plus "und" for unknown). */
  final case class Config(
      allowedLangs: Set[String],
      minTokens: Int,
      maxTokens: Int,
      maxDupLineFrac: Double,
      minQuality: Double,
      segmentDelim: String = "\n")

  private[graft] val VerdictCols =
    Seq("lang_ok", "len_ok", "rep_ok", "qual_ok", "keep")

  /** Per-row verdicts: the input columns plus `lang_ok`, `len_ok`,
    * `rep_ok`, `qual_ok`, and `keep` (their conjunction). The verdict
    * names must be absent from the input — withColumn would silently
    * OVERWRITE a user column of the same name and [[curate]] would then
    * drop it, losing data on the "original schema preserved" path. */
  def annotate(df: DataFrame, textCol: String, cfg: Config): DataFrame = {
    require(cfg.minTokens <= cfg.maxTokens, "minTokens > maxTokens")
    val clash = df.columns.toSet.intersect(VerdictCols.toSet)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Curation's " +
        s"verdict columns (${VerdictCols.mkString(", ")}) — rename them")
    val t = col(textCol)
    val nTok = TA.tokenCount(t)
    val langOk = TA.langId(t).isin(cfg.allowedLangs.toSeq: _*)
    val lenOk = nTok >= cfg.minTokens && nTok <= cfg.maxTokens
    val repOk = Repetition.duplicateLineFraction(t, cfg.segmentDelim) <=
      cfg.maxDupLineFrac
    val qualOk = TA.qualityScore(t) >= cfg.minQuality
    df.withColumn("lang_ok", langOk)
      .withColumn("len_ok", lenOk)
      .withColumn("rep_ok", repOk)
      .withColumn("qual_ok", qualOk)
      .withColumn("keep",
        col("lang_ok") && col("len_ok") && col("rep_ok") && col("qual_ok"))
  }

  /** Survivors of the full stack, original schema preserved. */
  def curate(df: DataFrame, textCol: String, cfg: Config): DataFrame =
    annotate(df, textCol, cfg).filter(col("keep"))
      .drop("lang_ok", "len_ok", "rep_ok", "qual_ok", "keep")

  /** C4-style bad-word / bad-phrase hit flag (Raffel 2020 §2.2: drop any
    * page containing a word from the public blocklist; real lists carry
    * multi-word phrases too). Matching is on the lowercased whitespace
    * token stream — a p-token phrase hits iff it appears as p
    * consecutive tokens, so "ass" in "class" can never hit (the classic
    * substring-blocklist false positive). Literal tier: phrases group
    * by token count and each group rides into codegen as ONE
    * `arrays_overlap` against that length's shingles — zero shuffle,
    * zero explode (C4's production list is ~400 entries; this tier).
    * For lists past literal size use [[badPhraseIds]]. Note
    * [[TA.shingles]]' short-doc edge: a doc shorter than p tokens
    * contributes its whole text as one p-shingle — a phrase can
    * therefore match a doc that IS the phrase, which is the intended
    * outcome. */
  def phraseHit(text: org.apache.spark.sql.Column, phrases: Seq[String])
  : org.apache.spark.sql.Column = {
    require(phrases.nonEmpty, "empty blocklist")
    // drop entries that tokenize to nothing (a whitespace-only string
    // trims to "" and String.split returns Array("") for it — the old
    // `.filter(_.nonEmpty)` kept that degenerate Seq("") phrase)
    val norm = phrases.map(_.toLowerCase.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").toSeq)
    // without this the groupBy below is empty and .reduce throws an
    // opaque empty.reduceLeft instead of the intended contract error
    require(norm.nonEmpty, "blocklist has no non-empty phrases")
    val toks = TA.tokens(text)
    norm.groupBy(_.length).toSeq.sortBy(_._1).map { case (k, ps) =>
      val lits = typedlit(ps.map(_.mkString(" ")).distinct)
      // k=1 phrases are plain tokens — skip the shingle construction
      // (an interpreted HOF; single-word entries dominate real lists)
      if (k == 1) arrays_overlap(toks, lits)
      else arrays_overlap(TA.shingles(toks, k), lits)
    }.reduce(_ || _)
  }

  /** Ids of documents hit by a LARGE phrase blocklist (the tier for
    * lists past codegen-literal size — host blocklists repurposed as
    * text, multi-locale lists): the corpus explodes shingles once per
    * distinct phrase length and broadcast-semi-joins the list — the
    * corpus never shuffles, hit ids only. Distinct lengths come off the
    * (by-definition broadcastable) list itself. */
  def badPhraseIds(df: DataFrame, textCol: String, idCol: String,
                   phrases: DataFrame): DataFrame = {
    val p = phrases.select(
      array_join(TA.tokens(col(phrases.columns.head)), " ").as("p"))
      .filter(length(col("p")) > 0).distinct()
    val lens = p.select(size(split(col("p"), " ")).as("k"))
      .distinct().collect().map(_.getInt(0)).sorted
    // a list that normalizes to nothing hits nothing — empty-id frame,
    // not an empty.reduceLeft from the fold below
    if (lens.isEmpty) return df.select(col(idCol)).limit(0)
    val toks = TA.tokens(col(textCol))
    lens.map { k =>
      df.select(col(idCol),
          explode(TA.shingles(toks, k)).as("sh"))
        .join(broadcast(p.filter(
          size(split(col("p"), " ")) === k)),
          col("sh") === col("p"), "left_semi")
        .select(col(idCol))
    }.reduce(_ unionAll _).distinct()
  }

  /** Survivors of the blocklist — literal tier. */
  def filterBadPhrases(df: DataFrame, textCol: String,
                       phrases: Seq[String]): DataFrame =
    df.filter(!phraseHit(col(textCol), phrases))

  /** HOT-N-GRAM audit — the boilerplate/memorization-risk report: the
    * top-N most frequent word k-shingles across the corpus with their
    * OCCURRENCE counts (repeats inside one document count — boilerplate
    * that repeats within pages is exactly what the audit hunts), as
    * readable STRINGS (the audit's consumers are humans deciding what
    * to strip).
    *
    * Two passes, because the strings are the REPORT, not the count
    * key: pass 1 counts on the codegen'd 60-bit shingle-hash kernel —
    * longs cross the exchange, map-side combined, `minCount` prunes
    * the Zipf singleton tail (most of the table) and the top-N cut is
    * TakeOrderedAndProject (ties at the cut break on the HASH,
    * deterministic at any parallelism). Pass 2 re-scans and resolves
    * ONLY the winners: shingle strings build AFTER the broadcast
    * probe against the topN hash set, on matched positions alone —
    * the corpus never materializes (or shuffles) its full n-gram
    * string table, the 100 TB failure mode of the naive explode.
    * Hash collisions merge counts and keep the MIN string — both
    * replayed by the oracle. Output (ngram, cnt), ordered
    * (cnt desc, ngram). */
  def hotNgrams(df: DataFrame, textCol: String, k: Int, topN: Int,
                minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.graft.TextHashExprs
    val hashed = df.select(TA.tokens(col(textCol)).as("__tk"))
      .withColumn("__hs", TextHashExprs.shingleHash60(col("__tk"), k))
    val top = hashed.select(explode(col("__hs")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("h")).limit(topN)
    hashed.select(col("__tk"), posexplode(col("__hs")).as(Seq("p", "h")))
      .join(broadcast(top), "h")
      .select(col("h"), col("cnt"),
        when(size(col("__tk")) < k, concat_ws(" ", col("__tk")))
          .otherwise(concat_ws(" ",
            slice(col("__tk"), col("p") + 1, lit(k))))
          .as("ngram"))
      .groupBy(col("h"), col("cnt")).agg(min(col("ngram")).as("ngram"))
      .select(col("ngram"), col("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
  }

  /** Capstone end-to-end curation — the C4/Gopher/CCNet stack composed
    * in pipeline order: exact dedup (first copy survives) → Gopher rule
    * gate ([[TA.gopherSignals]]) → self-trained bigram-LM perplexity
    * filter ([[LmQuality.lmScore]]), with the LM trained on the docs
    * that SURVIVE the rule gates (CCNet trains its filter on in-domain
    * survivors, so the model never learns from the junk it is meant to
    * remove). Keeps docs with `xent <= maxXent` (or too short to score).
    * Returns survivors with (n_bigrams, sum_u, xent) attached.
    *
    * Stage costs: dedup is one keyed window, the rule gate one codegen
    * projection, the LM two keyed counting aggs + two equi-joins —
    * nothing quadratic at any stage, and each stage shrinks the corpus
    * the next one pays for. */
  def pipelineE2E(df: DataFrame, textCol: String, idCol: String,
                  maxXent: Double,
                  stopwords: Seq[String] = TA.GopherStopwords)
  : DataFrame = {
    val deduped = Dedup.exactRows(df, textCol, idCol)
    // checkpoint the gate SURVIVORS once (optimization round 19, guide
    // §5): lmScore makes three passes over its input (bigram counts,
    // scoring join, singleton-vocab scan), and each would otherwise
    // replay the dedup window's corpus shuffle + the gopher projection.
    // One materialization of the pruned (id, text) projection replaces
    // three upstream recomputes; blocks are swept between queries.
    val gated = Checkpoints.eager(deduped.filter(
        TA.gopherSignals(col(textCol), stopwords).getField("gopher_pass"))
      .select(col(idCol), col(textCol)))
    val scored = LmQuality.lmScore(gated, textCol, idCol)
    scored.filter(col("n_bigrams") === 0 || col("xent") <= maxXent)
  }

  /** CURATION ATTRITION funnel — the data-card table every released
    * corpus publishes ("started with N; language kept X; length kept
    * Y; …"): the SEQUENTIAL survivor counts through [[annotate]]'s
    * stack in its declared order, plus each filter's SOLO rejection
    * count (how much work each filter does regardless of order — the
    * gap between solo drops and funnel steps is the overlap). One
    * aggregate over the verdict projection; `keep_rate` 6 dp. */
  def attrition(df: DataFrame, textCol: String, cfg: Config)
  : DataFrame = {
    val a = annotate(df, textCol, cfg)
    val langC = col("lang_ok")
    val lenC = langC && col("len_ok")
    val repC = lenC && col("rep_ok")
    val qualC = repC && col("qual_ok")
    a.agg(count(lit(1)).as("n_total"),
        sum(langC.cast("long")).as("after_lang"),
        sum(lenC.cast("long")).as("after_len"),
        sum(repC.cast("long")).as("after_rep"),
        sum(qualC.cast("long")).as("n_kept"),
        sum((!col("lang_ok")).cast("long")).as("drop_lang"),
        sum((!col("len_ok")).cast("long")).as("drop_len"),
        sum((!col("rep_ok")).cast("long")).as("drop_rep"),
        sum((!col("qual_ok")).cast("long")).as("drop_qual"))
      .withColumn("keep_rate",
        round(col("n_kept").cast("double") / col("n_total"), 6))
  }

  // ---- corpus drift monitoring (r17) -------------------------------

  /** 1e6-scaled ln of a probability, rounded from its 6-dp round —
    * the [[Classifier]]/[[LmQuality]] exact-integer idiom: every
    * per-token ln rides as a long so SUMS are order-free and
    * engine-exact. */
  private def u6(x: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    round(round(log(x), 6) * 1e6).cast("long")

  /** Per-token DRIFT TERMS between two corpus snapshots — the
    * continuous-ingest monitoring step ("did this week's crawl change
    * the token distribution?"): add-one-smoothed unigram distributions
    * over the UNION vocabulary, and per token the exact-integer
    * KL(A‖B) numerator `term_u = (c_a + 1) · (ln p_a − ln p_b)` with
    * both lns as 1e6-scaled longs — so [[unigramDrift]]'s sum is
    * order-free and the biggest |term_u| rows ARE the drift report's
    * "what changed" list (take with TakeOrderedAndProject, never a
    * global sort). Two token-count aggs + one full-outer token join;
    * the three scalars (N_a, N_b, |V|) are one bounded driver agg. */
  def unigramDriftTerms(a: DataFrame, b: DataFrame, textCol: String)
  : DataFrame =
    unigramDriftTermsFromCounts(unigramCounts(a, textCol),
      unigramCounts(b, textCol))

  /** The (token, cnt) unigram-count frame of a corpus snapshot — the
    * VOCABULARY-sized summary the counts-path drift entry points
    * consume. A monitoring deployment computes this ONCE for the
    * static reference snapshot (and broadcasts/caches it), so each
    * comparison pays O(its own tokens + reference vocabulary), never
    * a reference re-scan (ADVICE r17 — [[graft.streaming.Streams
    * .driftSink]] used to re-tokenize the whole reference corpus
    * every micro-batch). One explode + one keyed count agg. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TA.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))

  /** [[unigramDriftTerms]] over PRECOMPUTED (token, cnt) snapshots
    * ([[unigramCounts]] shape — extra columns ignored). The raw-text
    * path delegates here; both paths are spec-pinned equal. */
  def unigramDriftTermsFromCounts(aCounts: DataFrame, bCounts: DataFrame)
  : DataFrame = {
    // materialize the count join ONCE: the scalar agg below and every
    // downstream consumer (terms, report, top-k) read the same blocks
    val joined = Checkpoints.eager(
      aCounts.select(col("token"), col("cnt").cast("long").as("c_a"))
        .join(bCounts.select(col("token"),
          col("cnt").cast("long").as("c_b")), Seq("token"),
          "full_outer")
        .select(col("token"), coalesce(col("c_a"), lit(0L)).as("c_a"),
          coalesce(col("c_b"), lit(0L)).as("c_b")))
    val Array(sc) = joined.agg(sum(col("c_a")), sum(col("c_b")),
      count(lit(1))).collect()
    val (na, nb, v) = (sc.getLong(0), sc.getLong(1), sc.getLong(2))
    val pa = (col("c_a") + 1).cast("double") / lit((na + v).toDouble)
    val pb = (col("c_b") + 1).cast("double") / lit((nb + v).toDouble)
    joined.withColumn("term_u", (col("c_a") + 1) * (u6(pa) - u6(pb)))
  }

  private def driftReport(terms: DataFrame): DataFrame =
    terms
      .agg(sum(col("c_a")).cast("long").as("n_a"),
        sum(col("c_b")).cast("long").as("n_b"),
        count(lit(1)).as("v_union"),
        sum(col("term_u")).cast("long").as("kl_u"))
      .withColumn("kl", round(col("kl_u").cast("double") /
        ((col("n_a") + col("v_union")).cast("double") * 1e6), 6))

  /** The drift REPORT row: token totals, union vocabulary size, the
    * exact-integer KL numerator sum, and KL(A‖B) in nats (6 dp) —
    * ≈0 when the snapshots share a distribution, growing as sources
    * shift. One agg over [[unigramDriftTerms]]; the normalizer
    * (N_a + |V|) comes from the same aggregate row, no extra pass. */
  def unigramDrift(a: DataFrame, b: DataFrame, textCol: String)
  : DataFrame =
    driftReport(unigramDriftTerms(a, b, textCol))

  /** [[unigramDrift]] over PRECOMPUTED (token, cnt) snapshots — the
    * monitoring-loop entry point: the reference counts compute once,
    * each report pays only its own side. */
  def unigramDriftFromCounts(aCounts: DataFrame, bCounts: DataFrame)
  : DataFrame =
    driftReport(unigramDriftTermsFromCounts(aCounts, bCounts))
}
