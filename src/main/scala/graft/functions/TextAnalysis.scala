package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextHashExprs

/** Text-analysis surface for large-scale training-data pipelines: tokenizing,
  * language ID, quality scoring, fingerprinting, shingling, MinHash, SimHash.
  *
  * Everything is Column-level (split/filter/transform/aggregate higher-order
  * functions) so it distributes and stays in codegen. The only hash primitive
  * is [[Scalars.hash60]] (md5-derived 60-bit), chosen because the DuckDB
  * oracle can compute the identical value — determinism across engines is a
  * correctness-gate requirement, and at 100 TB a seeded deterministic hash is
  * also what you want for reproducible dedup runs.
  */
object TextAnalysis {
  /** Lowercased whitespace tokens, empties dropped. `array_remove` (not
    * the `filter` HOF) keeps the whole expression codegen-capable — one
    * interpreted higher-order function anywhere in a projection knocks the
    * entire stage out of whole-stage codegen. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "\\s+"), "")

  /** HOF formulation of [[tokens]] (spec reference). */
  def tokensHof(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens (with duplicates) found in `dict` — native kernel
    * (O(1) HashSet probe per token, stays in whole-stage codegen). */
  def dictHits(toks: Column, dict: Seq[String]): Column =
    TextHashExprs.countInSet(toks, dict)

  /** HOF formulation of [[dictHits]] (spec reference). */
  def dictHitsHof(toks: Column, dict: Seq[String]): Column =
    size(filter(toks, t => t.isin(dict: _*)))

  /** BPE-ish subword count estimate: whitespace tokens weighted by
    * ceil(len/4) — the "~4 chars per token" heuristic, one kernel pass. */
  def subwordCount(text: Column): Column =
    TextHashExprs.subwordCount(tokens(text))

  /** HOF formulation of [[subwordCount]] (spec reference). */
  def subwordCountHof(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))

  // ---- language ID (n-gram/stopword heuristic) ----
  /** Tiny per-language function-word lists; a real deployment swaps in
    * fastText-style models via the same Column contract. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"))

  def langScore(toks: Column, lang: String): Column =
    dictHits(toks, stopwords(lang)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** argmax language by stopword-hit ratio; "und" when no list scores > 0.
    * Ties break by language-code order (deterministic, oracle-matched). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scored = stopwords.keys.toSeq.sorted.map(l => (l, langScore(t, l)))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), el) =>
      when(s === best && best > 0.0, lit(l)).otherwise(el)
    }
  }

  /** Unicode NFC normalization (native expression over the JDK Unicode
    * tables; UAX #15, engine-independent): canonicalizes decomposed
    * sequences so byte-level hashing/dedup sees one form — run BEFORE
    * [[graft.operators.Dedup.canonicalize]]/hashing on multilingual
    * corpora. Map-only codegen projection, ASCII fast path. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.TextHashExprs.nfcNormalize(text)

  // ---- quality scoring ----
  /** Composite document-quality score in [0,1]:
    * mean word length in a sane band, alpha ratio, and length band.
    * Deterministic arithmetic only (oracle-replicable). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val meanWord = nChar / greatest(nTok, lit(1.0))
    val alphaRatio =
      length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
        greatest(nChar, lit(1.0))
    val lenScore =
      when(nTok < 5, 0.2).when(nTok > 1000, 0.5).otherwise(lit(1.0))
    val wordScore =
      when(meanWord >= 3.0 && meanWord <= 10.0, 1.0).otherwise(lit(0.4))
    // 4-dp output: at 6 dp a value landed exactly on a .5 rounding
    // boundary and the engines' double-rounding algorithms split (DuckDB
    // scales-then-rounds, Spark rounds the exact BigDecimal).
    round((lenScore * 0.4 + wordScore * 0.3 + alphaRatio * 0.3), 4)
  }

  /** Flesch reading-ease (Flesch 1948 — the classic readability
    * heuristic curation stacks carry as a quality covariate next to
    * the length/alpha composite): 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words), with deterministic STRUCTURAL counts
    * both engines replay exactly — words = whitespace tokens,
    * sentences = `[.!?]+` runs (min 1), syllables = `[aeiouy]+` vowel
    * groups over the lowercased text (min 1; the standard regex
    * estimate, not a dictionary). Pure codegen regexp projection, no
    * shuffle; 4-dp output for the same cross-engine double-rounding
    * reason as [[qualityScore]]. */
  def fleschEase(text: Column): Column = {
    val w = greatest(tokenCount(text), lit(1)).cast("double")
    val sct = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast("double")
    val y = greatest(regexp_count(lower(text), lit("[aeiouy]+")), lit(1))
      .cast("double")
    round(lit(206.835) - lit(1.015) * (w / sct) - lit(84.6) * (y / w), 4)
  }

  /** Gopher's English stopword list for the ≥2-distinct-hits rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The remaining Gopher document-quality rules (Rae et al. 2021,
    * Table A1 — the public rule set; duplicate-line and n-gram
    * repetition live in [[graft.functions.Repetition]]): symbol-to-word
    * ratio, bullet-line and ellipsis-line fractions, alphabetic-word
    * fraction, distinct-stopword hits, and the conjunct `gopher_pass`
    * at the paper's thresholds. One codegen projection, no shuffle; all
    * ratios are integer-count divisions rounded to 6dp so the DuckDB
    * oracle replays them exactly. The stopword set defaults to the
    * paper's English list ([[GopherStopwords]]); pass a corpus-language
    * set for non-English corpora — the rule is "≥ 2 distinct hits of a
    * stopword set", not the specific words. */
  def gopherSignals(text: Column,
                    stopwords: Seq[String] = GopherStopwords): Column = {
    val toks = tokens(text)
    val nTok = greatest(size(toks), lit(1)).cast("double")
    def occurrences(needle: String): Column =
      (length(text) - length(regexp_replace(text,
        java.util.regex.Pattern.quote(needle), ""))).cast("double") /
        needle.length
    val symbolRatio =
      round((occurrences("#") + occurrences("...") + occurrences("…")) /
        nTok, 6)
    val segs = filter(transform(split(text, "\n"), s => trim(s)),
      s => s =!= "")
    val nSeg = greatest(size(segs), lit(1)).cast("double")
    val bulletFrac = round(size(filter(segs,
      s => s.substr(lit(1), lit(1)).isin("-", "*", "•"))).cast("double") /
      nSeg, 6)
    val ellipsisFrac = round(size(filter(segs,
      s => s.endsWith("...") || s.endsWith("…"))).cast("double") /
      nSeg, 6)
    val alphaFrac = round(size(filter(toks,
      t => t.rlike("[a-zA-Z]"))).cast("double") / nTok, 6)
    val stopHits = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*)))
    struct(
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"),
      (symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && stopHits >= 2).as("gopher_pass"))
  }

  /** StarCoder-family code-quality signals (Li 2023 "StarCoder" §3 /
    * BigCode's preprocessing; also The Stack's filters): per-FILE line
    * metrics that catch minified, autogenerated, and data-blob files —
    * max and mean line length, fraction of alphanumeric chars, comment
    * and blank line fractions (`#`, `//`, `--` prefixes after indent) —
    * plus the conjunct `code_pass` with the published thresholds
    * (max ≤ 1000, mean ≤ 100, alnum ≥ 0.25). Ratios are integer-count
    * divisions rounded 6dp so the oracle replays exactly. One codegen
    * projection, no shuffle — the same shape as [[gopherSignals]]. */
  def codeSignals(text: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.codeSignals(text)

  /** Column-chain formulation of [[codeSignals]] — the oracle-replay
    * reference and the spec's parity baseline. Kept OFF the hot path:
    * per row it costs a split allocation, an interpreted max-line HOF,
    * three multiline-regex passes and a whole-text regexp_replace copy
    * (the 100× web one-off measured 50 s warm at bytes_factor 170 —
    * the one-scan kernel replaces it). */
  private[graft] def codeSignalsChain(text: Column): Column = {
    // all-arithmetic/regexp formulations: higher-order functions run
    // INTERPRETED and getField-on-struct simplification duplicates each
    // field's expression, so a HOF here multiplies into seconds per
    // suite query — the one remaining HOF is max-line (no regexp form)
    val lines = split(text, "\n", -1)
    val n = size(lines)
    val nLines = greatest(n, lit(1)).cast("double")
    val maxLine =
      coalesce(array_max(transform(lines, l => length(l))), lit(0))
    // single-char separators: sum(line lengths) = length - (n-1)
    val meanLine = round(
      (length(text) - (n - 1)).cast("double") / nLines, 6)
    val alnumFrac = round(
      length(regexp_replace(text, "[^a-zA-Z0-9]", "")).cast("double") /
        greatest(length(text), lit(1)).cast("double"), 6)
    val commentFrac = round(
      regexp_count(text, lit("(?m)^[ \t]*(#|//|--)")).cast("double") /
        nLines, 6)
    // blank = lines with no char outside [ \t]; counted as the
    // complement of lines whose first non-indent char exists (zero-width
    //-match-free, unlike a direct ^[ \t]*$ count)
    val blankFrac = round(
      (n - regexp_count(text, lit("(?m)^[ \t]*[^ \t\n]"))).cast("double") /
        nLines, 6)
    struct(
      maxLine.as("max_line_len"),
      meanLine.as("mean_line_len"),
      alnumFrac.as("alnum_frac"),
      commentFrac.as("comment_frac"),
      blankFrac.as("blank_frac"),
      (maxLine <= 1000 && meanLine <= 100.0 && alnumFrac >= 0.25)
        .as("code_pass"))
  }

  /** Unicode-script profile (the CCNet-family companion to [[langId]] —
    * stopword language ID is blind to non-spaced scripts, so pipelines
    * bucket by SCRIPT first): fractions of non-whitespace chars in
    * explicit codepoint ranges — Latin (ASCII letters + Latin-1/Extended
    * supplements), Cyrillic, CJK (kana + unified ideographs), digits,
    * other — plus the dominant label with a fixed priority tie-break
    * (latin > cyrillic > cjk > digit > other on equal counts). Ranges
    * and the whitespace class are spelled as explicit literals because
    * Java and RE2 disagree on `\s` and on named script classes; these
    * literals behave identically in both engines, so the oracle replays
    * bit-exactly. One codegen projection. */
  def scriptProfile(text: Column): Column = {
    def cnt(cls: String): Column =
      (length(text) - length(regexp_replace(text, cls, ""))).cast("long")
    val latin = cnt("[A-Za-zÀ-ɏ]")
    val cyr = cnt("[Ѐ-ӿ]")
    val cjk = cnt("[぀-ヿ一-鿿]")
    val digit = cnt("[0-9]")
    val nonWs = cnt("[^ \\t\\n\\r\\f]")
    val other = nonWs - latin - cyr - cjk - digit
    val base = greatest(nonWs, lit(1L)).cast("double")
    def frac(c: Column): Column = round(c.cast("double") / base, 6)
    val script =
      when(latin >= cyr && latin >= cjk && latin >= digit &&
        latin >= other, lit("latin"))
      .when(cyr >= cjk && cyr >= digit && cyr >= other, lit("cyrillic"))
      .when(cjk >= digit && cjk >= other, lit("cjk"))
      .when(digit >= other, lit("digit"))
      .otherwise(lit("other"))
    struct(
      frac(latin).as("latin_frac"),
      frac(cyr).as("cyrillic_frac"),
      frac(cjk).as("cjk_frac"),
      frac(digit).as("digit_frac"),
      frac(other).as("other_frac"),
      script.as("script"))
  }

  // ---- shingles / fingerprints / sketches ----
  /** Word k-shingles: sliding windows of k tokens joined by a space. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** 60-bit min-hash document fingerprint over k-shingles (rolling-hash
    * winnowing, reduced to its min-sketch): equal fingerprints ⇒ very likely
    * duplicate content. Shingling + hashing run in the native kernel
    * (org.apache.spark.sql.graft.TextKernels) — one codegen'd pass, no
    * interpreted HOF chain; array_min stays codegen'd too. */
  def fingerprint(text: Column, k: Int = 5): Column =
    array_min(TextHashExprs.shingleHash60(tokens(text), k))

  /** Mojibake repair (ftfy's `fix_encoding` core — the step CC-style
    * pipelines run right after HTML extraction): UTF-8 text that was
    * mis-decoded as Latin-1/Windows-1252 upstream ("cafÃ©" → "café")
    * repairs via the sloppy-cp1252 inverse + strict UTF-8 re-decode,
    * fixpoint-iterated so double mojibake heals too; clean text — ASCII,
    * valid non-Latin scripts, genuine Latin-1 prose whose re-encode is
    * not valid UTF-8 — passes through byte-identical. Native kernel
    * ([[org.apache.spark.sql.graft.EncodingKernels]]): per-row char
    * scan, zero allocation on the ASCII fast path, whole-stage codegen. */
  def fixEncoding(text: Column): Column =
    org.apache.spark.sql.graft.EncodingExprs.fixMojibake(text)

  /** HOF formulation of [[fingerprint]] — interpreted; kept as the
    * reference implementation the native kernel is spec-checked against. */
  def fingerprintHof(text: Column, k: Int = 5): Column =
    array_min(transform(shingles(tokens(text), k),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))

  /** MinHash modulus (Mersenne prime 2^31-1): base hashes and coefficients
    * stay < 2^31 so a·x+b < 2^62 — no 64-bit overflow in either engine
    * (DuckDB errors on BIGINT overflow rather than wrapping). */
  val MinHashP: Long = 2147483647L

  /** Deterministic affine-permutation coefficients (aᵢ, bᵢ), shared with
    * the oracle SQL generator. */
  def minHashCoeffs(seeds: Int): Seq[(Long, Long)] =
    (0 until seeds).map { i =>
      val a = (i * 2654435761L + 1013904223L) % MinHashP
      val b = (i * 97531L + 12345L) % MinHashP
      (if (a == 0) 1L else a, b)
    }

  /** Base hash array for MinHash: one md5-derived value per k-shingle,
    * reduced mod [[MinHashP]]. Materialize this ONCE per document (cache or
    * checkpoint) before fanning out to seeds — expressions referencing it
    * are inlined by Catalyst, and interpreted HOFs have no common-subexpr
    * elimination, so an un-staged pipeline re-hashes every shingle per seed. */
  def shingleBase(text: Column, k: Int): Column =
    TextHashExprs.shingleHash60(tokens(text), k, modP = true)

  /** HOF formulation of [[shingleBase]] (spec reference). */
  def shingleBaseHof(text: Column, k: Int): Column =
    transform(shingles(tokens(text), k),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinHashP)

  /** MinHash signature from a precomputed [[shingleBase]] column: min over
    * the i-th affine permutation hᵢ(x) = (aᵢ·x + bᵢ) mod p. The native
    * kernel computes every seed's min in ONE pass over the base array.
    * Returns array<long> of length `seeds`. */
  def minHashFromBase(base: Column, seeds: Int): Column =
    TextHashExprs.minHashSig(base, seeds)

  /** HOF formulation of [[minHashFromBase]] (spec reference; re-walks the
    * base array once per seed). */
  def minHashFromBaseHof(base: Column, seeds: Int): Column =
    array(minHashCoeffs(seeds).map { case (a, b) =>
      array_min(transform(base, x => (x * a + b) % MinHashP))
    }: _*)

  /** Single-expression MinHash (small inputs / tests); for corpus-scale use
    * stage [[shingleBase]] first. */
  def minHash(text: Column, k: Int, seeds: Int): Column =
    minHashFromBase(shingleBase(text, k), seeds)

  /** Token hash array for SimHash — stage once per doc (see shingleBase).
    * k=1 shingles are the tokens themselves; emptyAsEmpty preserves the
    * per-token transform semantics (zero tokens → empty array, not [""]). */
  def tokenHashes(text: Column): Column =
    TextHashExprs.shingleHash60(tokens(text), 1, emptyAsEmpty = true)

  /** HOF formulation of [[tokenHashes]] (spec reference). */
  def tokenHashesHof(text: Column): Column =
    transform(tokens(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))

  /** nBits-bit SimHash from a precomputed [[tokenHashes]] column: bit b is
    * set iff Σ_tokens ±1 (by bit b of the token hash) is ≥ 0. Near-dup docs
    * land within small Hamming distance. nBits ≤ 32 keeps the oracle SQL
    * tractable. All bit votes accumulate in one native pass. */
  def simHashFromHashes(hs: Column, nBits: Int): Column =
    TextHashExprs.simHash(hs, nBits)

  /** HOF formulation of [[simHashFromHashes]] (spec reference; one
    * interpreted aggregate per bit). */
  def simHashFromHashesHof(hs: Column, nBits: Int): Column =
    (0 until nBits).map { b =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Single-expression SimHash (small inputs / tests); stage
    * [[tokenHashes]] first at corpus scale. */
  def simHash(text: Column, nBits: Int = 16): Column =
    simHashFromHashes(tokenHashes(text), nBits)

  /** Hamming distance between two SimHash values (bit_count of xor). */
  def simHashDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two precomputed distinct-element arrays. */
  def jaccardOfSets(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }

  /** n-gram Jaccard similarity between two texts' k-shingle sets.
    * For pairwise joins precompute the shingle sets once per document and
    * use [[jaccardOfSets]] — shingling per PAIR is O(pairs·textlen) in
    * interpreted HOF eval and dominates everything at scale. */
  def ngramJaccard(a: Column, b: Column, k: Int): Column =
    jaccardOfSets(array_distinct(shingles(tokens(a), k)),
      array_distinct(shingles(tokens(b), k)))
}
