package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-crawl corpora — beyond the reference
  * (which ingests already-extracted text): the WARC/WET-style boilerplate
  * step every web-scale pipeline (CCNet, RefinedWeb, Dolma, FineWeb) runs
  * before any quality filter or dedup sees a document.
  *
  * Everything here is a pure per-row projection — a chain of
  * `regexp_replace`/`replace` steps confined to the RE2-compatible regex
  * subset (inline `(?is)` flags, lazy `.*?`, no backrefs in patterns), so
  * the whole chain stays inside whole-stage codegen, shuffles nothing, and
  * the DuckDB oracle replays it bit-for-bit with the same patterns plus the
  * `'g'` option. Whitespace classes are spelled explicitly (`[ \t\f\r]`)
  * because Java's `\s` includes U+000B where RE2's does not — the one
  * engine divergence in this corner of the regex language.
  *
  * Tier contract (documented, spec-pinned):
  *  - `<script>`/`<style>` elements drop with their CONTENT; comments drop;
  *    every other tag drops but its content survives. An attribute value
  *    containing a literal `>` ends the tag early (regex tier — a full
  *    HTML5 tokenizer is out of scope and no corpus filter needs one).
  *  - Block-closing tags and `<br>` become newlines so line-oriented
  *    downstream signals (duplicate-line fraction, bullet-line rules) see
  *    the document's visual line structure.
  *  - Entity decode covers the named set every extractor handles
  *    (`&lt; &gt; &quot; &#39; &apos; &nbsp; &amp;`), single-pass with
  *    `&amp;` LAST — `&amp;lt;` decodes to the literal text `&lt;`, the
  *    standard one-decode semantics. Exotic numeric entities pass through
  *    (they are rare enough that CCNet leaves them too).
  *
  * At 100 TB this is the cheapest possible shape: one scan, zero shuffle,
  * O(bytes) per row with a small constant. [[htmlText]] runs as a native
  * char-scan kernel (the `CanonTailExpr` playbook —
  * [[org.apache.spark.sql.graft.HtmlKernels]]) with the regexp chain kept
  * as [[htmlTextChain]], the oracle's replay target, and a fuzz spec
  * pinning the two bit-identical; title and link-density stay on the
  * chain (one extract / short per-anchor strings). */
object Html {

  private val BlockClose =
    "(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|pre)[ \\t\\n\\r\\f]*>"

  /** Tag/script/comment strip only (no entity decode, no whitespace
    * normalization) — the shared kernel of [[htmlText]] and the per-anchor
    * lambda in [[linkDensity]]. */
  private[graft] def stripTags(h: Column): Column = {
    val noScript =
      regexp_replace(h, "(?is)<script[^>]*>.*?</script[ \\t\\n\\r\\f]*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style[ \\t\\n\\r\\f]*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val broke = regexp_replace(noComment, "(?i)<br[ \\t\\n\\r\\f]*/?>", "\n")
    val blocked = regexp_replace(broke, BlockClose, "\n")
    val noTag = regexp_replace(blocked, "(?s)<[^>]*>", " ")
    // a lone unterminated '<tag' at end-of-string is malformed HTML the
    // global pass above cannot see (no closing '>'); drop it too
    regexp_replace(noTag, "<[^>]*$", " ")
  }

  /** Decode the common named entities, `&amp;` last (one-decode rule). */
  private[graft] def decodeEntities(h: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(h) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
  }

  /** Collapse runs of spaces, trim space around newlines, cap blank lines
    * at one, and trim the ends — the canonical post-extraction whitespace
    * form (line structure preserved for the line-oriented Gopher rules). */
  private[graft] def normalizeWs(h: Column): Column = {
    val sp = regexp_replace(h, "[ \t\f\r]+", " ")
    val nl = regexp_replace(sp, " *\n *", "\n")
    val capped = regexp_replace(nl, "\n{3,}", "\n\n")
    regexp_replace(capped, "^[ \n]+|[ \n]+$", "")
  }

  /** The extracted visible text of an HTML document — the native fused
    * kernel ([[org.apache.spark.sql.graft.HtmlKernels]]: char scans, no
    * regex engine), bit-identical to [[htmlTextChain]] (fuzz-pinned). */
  def htmlText(h: Column): Column =
    org.apache.spark.sql.graft.HtmlExprs.htmlText(h)

  /** The regexp-chain formulation of [[htmlText]] — the DuckDB oracle's
    * replay target and the kernel's parity reference. */
  private[graft] def htmlTextChain(h: Column): Column =
    normalizeWs(decodeEntities(stripTags(h)))

  /** The document title (first `<title>` element), entity-decoded and
    * whitespace-collapsed; empty string when absent — the same no-match
    * convention as `regexp_extract` in both engines. */
  def htmlTitle(h: Column): Column = {
    val raw = regexp_extract(h, "(?is)<title[^>]*>(.*?)</title[ \\t\\n\\r\\f]*>", 1)
    val flat = regexp_replace(decodeEntities(raw), "[ \t\f\r\n]+", " ")
    regexp_replace(flat, "^ +| +$", "")
  }

  /** Link density — anchor-text characters ÷ total extracted characters,
    * the classic boilerplate signal (nav/footer-heavy pages score high).
    * Anchor text is each `<a>` element's inner HTML, tag-stripped and
    * space-collapsed, so nested markup (`<a><b>x</b></a>`) counts its
    * visible characters only. NULL when the page has no visible text at
    * all (0/0 — no signal, matching the n-gram signals' convention). */
  def linkDensity(h: Column): Column = {
    val anchors = regexp_extract_all(h, lit("(?is)<a\\b[^>]*>(.*?)</a[ \\t\\n\\r\\f]*>"),
      lit(1))
    val anchorChars = aggregate(
      transform(anchors, a => length(normalizeWs(decodeEntities(
        regexp_replace(a, "(?s)<[^>]*>", " "))))),
      lit(0), (acc, x) => acc + x)
    anchorChars.cast("double") / nullif(length(htmlText(h)), lit(0))
  }

  // ----- head-metadata harvest (canonical dedup / indexability) -----

  /** First-nonempty of two attribute-order variants, entity-decoded;
    * null when neither matches (attributes have no fixed order in
    * HTML, so every pair probes both). */
  private def attrPair(h: Column, relFirst: String, hrefFirst: String)
  : Column = {
    val a = regexp_extract(h, relFirst, 1)
    val b = regexp_extract(h, hrefFirst, 1)
    val v = when(length(a) > 0, a).otherwise(b)
    when(length(v) > 0, decodeEntities(v))
  }

  /** `<link rel="canonical" href=…>` target (entity-decoded, null when
    * absent) — the page's self-declared duplicate-group key. */
  def canonicalUrl(h: Column): Column = attrPair(h,
    "(?is)<link[ \t\n\r][^>]*rel[ \t\n\r]*=[ \t\n\r]*\"canonical\"" +
      "[^>]*href[ \t\n\r]*=[ \t\n\r]*\"([^\"]*)\"",
    "(?is)<link[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*\"([^\"]*)\"" +
      "[^>]*rel[ \t\n\r]*=[ \t\n\r]*\"canonical\"")

  /** `<meta name="…" content="…">` value (entity-decoded, null when
    * absent). `name` must be a literal token ([A-Za-z0-9:_-]) — it is
    * spliced into the pattern. */
  def metaContent(h: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9:_-]+"), s"bad meta name: $name")
    attrPair(h,
      s"(?is)<meta[ \t\n\r][^>]*name[ \t\n\r]*=[ \t\n\r]*\"$name\"" +
        "[^>]*content[ \t\n\r]*=[ \t\n\r]*\"([^\"]*)\"",
      s"(?is)<meta[ \t\n\r][^>]*content[ \t\n\r]*=[ \t\n\r]*" +
        s"\"([^\"]*)\"[^>]*name[ \t\n\r]*=[ \t\n\r]*\"$name\"")
  }

  /** Lowercased robots meta directives (null when absent); probe with
    * e.g. `contains("noindex")`. */
  def metaRobots(h: Column): Column = lower(metaContent(h, "robots"))

  /** Lowercased `<html lang="…">` attribute (null when absent). */
  def htmlLang(h: Column): Column = {
    val v = regexp_extract(h,
      "(?is)<html[ \t\n\r][^>]*lang[ \t\n\r]*=[ \t\n\r]*\"([^\"]*)\"", 1)
    when(length(v) > 0, lower(v))
  }
}
