package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for `Html.htmlText` — the full extraction pipeline
  * (script/style/comment strip, line-break substitution, tag strip,
  * entity decode, whitespace canonicalization) as seven plain char-scan
  * passes plus two fused ones, replacing fifteen java.util.regex passes.
  *
  * Pass-for-pass FIDELITY, not pass fusion, is the design rule for the
  * tag tiers: the regexp chain's observable semantics on malformed input
  * depend on each global pass completing before the next starts (e.g. a
  * `<script>` element whose closing tag sits inside a comment consumes
  * the comment opener, changing what the comment pass later sees), so
  * each regex is re-implemented as its own literal scan in the same
  * order. The two provably order-insensitive tiers ARE fused: the seven
  * entity `replace`es (their outputs — `< > " '` and space — can never
  * create an earlier pattern) run via indexOf, and the four whitespace
  * regexes collapse into one run-classifying sweep (a run of blanks with
  * n newlines emits min(n,2) `\n`s, else one space; boundary runs drop —
  * equivalent by case analysis, pinned by the fuzz parity spec).
  *
  * Bit-parity with the Column chain (`Html.htmlTextChain`) is asserted by
  * a generator spec over adversarial fragments — unclosed elements,
  * comments nesting tags, double-encoded entities, whitespace soup. */
object HtmlKernels {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private def regionMatchesIgnoreCase(s: String, at: Int,
                                      needle: String): Boolean =
    at + needle.length <= s.length &&
      s.regionMatches(true, at, needle, 0, needle.length)

  /** `(?is)<name[^>]*>.*?</name[ \t\n\r\f]*>` → " " (global). On an
    * opening tag with no matching close, the regex fails at that start
    * position and the engine retries one char later — mirrored here. */
  private def stripElement(t: String, name: String): String = {
    if (t.indexOf('<') < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    val open = "<" + name
    val close = "</" + name
    var i = 0
    while (i < t.length) {
      var matched = false
      if (t.charAt(i) == '<' && regionMatchesIgnoreCase(t, i, open)) {
        // [^>]*> completes the opening tag
        var j = i + open.length
        while (j < t.length && t.charAt(j) != '>') j += 1
        if (j < t.length) {
          // lazy content: first </name that completes with [ws]*>
          var k = j + 1
          var end = -1
          while (end < 0 && k < t.length) {
            if (t.charAt(k) == '<' &&
              regionMatchesIgnoreCase(t, k, close)) {
              var m = k + close.length
              while (m < t.length && isWs(t.charAt(m))) m += 1
              if (m < t.length && t.charAt(m) == '>') end = m
            }
            k += 1
          }
          if (end >= 0) { sb.append(' '); i = end + 1; matched = true }
        }
      }
      if (!matched) { sb.append(t.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `(?s)<!--.*?-->` → " " (global). */
  private def stripComments(t: String): String = {
    var from = t.indexOf("<!--")
    if (from < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (from >= 0) {
      val end = t.indexOf("-->", from + 4)
      if (end >= 0) {
        sb.append(t, i, from).append(' ')
        i = end + 3
        from = t.indexOf("<!--", i)
      } else from = -1
    }
    sb.append(t, i, t.length)
    sb.toString
  }

  /** `(?i)<br`, optional ws, optional `/`, then `>` → "\n" (global). */
  private def replaceBr(t: String): String = {
    if (t.indexOf('<') < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      var matched = false
      if (t.charAt(i) == '<' && regionMatchesIgnoreCase(t, i, "<br")) {
        var j = i + 3
        while (j < t.length && isWs(t.charAt(j))) j += 1
        if (j < t.length && t.charAt(j) == '/') j += 1
        if (j < t.length && t.charAt(j) == '>') {
          sb.append('\n'); i = j + 1; matched = true
        }
      }
      if (!matched) { sb.append(t.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private val BlockNames = Array("p", "div", "h1", "h2", "h3", "h4", "h5",
    "h6", "li", "tr", "table", "ul", "ol", "blockquote", "pre")

  /** `(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|pre)[ws]*>` →
    * "\n" (global). Alternatives are tried exhaustively — each requires
    * its own full `[ws]*>` completion, so order cannot matter. */
  private def replaceBlockClose(t: String): String = {
    if (t.indexOf('<') < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      var end = -1
      if (t.charAt(i) == '<' && i + 1 < t.length && t.charAt(i + 1) == '/') {
        var n = 0
        while (end < 0 && n < BlockNames.length) {
          val name = BlockNames(n)
          if (regionMatchesIgnoreCase(t, i + 2, name)) {
            var j = i + 2 + name.length
            while (j < t.length && isWs(t.charAt(j))) j += 1
            if (j < t.length && t.charAt(j) == '>') end = j
          }
          n += 1
        }
      }
      if (end >= 0) { sb.append('\n'); i = end + 1 }
      else { sb.append(t.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `(?s)<[^>]*>` → " " then `<[^>]*$` → " " (both global). After the
    * paired pass, any remaining `<` has no `>` after it, so the tail
    * pass is "truncate at the first `<` past the last `>`, append one
    * space" — folded into the same sweep via the precomputed last-`>`. */
  private def stripRemainingTags(t: String): String = {
    if (t.indexOf('<') < 0) return t
    val lastGt = t.lastIndexOf('>')
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    var done = false
    while (i < t.length && !done) {
      if (t.charAt(i) == '<') {
        if (i < lastGt) {
          var j = i + 1
          while (t.charAt(j) != '>') j += 1 // exists: i < lastGt
          sb.append(' '); i = j + 1
        } else { sb.append(' '); done = true } // `<[^>]*$`
      } else { sb.append(t.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private val EntityFrom = Array("&lt;", "&gt;", "&quot;", "&#39;",
    "&apos;", "&nbsp;", "&amp;")
  private val EntityTo = Array("<", ">", "\"", "'", "'", " ", "&")

  /** Seven sequential literal replaces, `&amp;` last (one-decode rule —
    * sequential and single-scan coincide because no replacement output
    * can complete an earlier entity, argued in the class doc). */
  private def decodeEntities(t: String): String = {
    if (t.indexOf('&') < 0) return t
    var cur = t
    var e = 0
    while (e < EntityFrom.length) {
      var from = cur.indexOf(EntityFrom(e))
      if (from >= 0) {
        val sb = new java.lang.StringBuilder(cur.length)
        var i = 0
        while (from >= 0) {
          sb.append(cur, i, from).append(EntityTo(e))
          i = from + EntityFrom(e).length
          from = cur.indexOf(EntityFrom(e), i)
        }
        sb.append(cur, i, cur.length)
        cur = sb.toString
      }
      e += 1
    }
    cur
  }

  /** The four whitespace regexes as one run-classifying sweep: a blank
    * run ([ \t\f\r\n]+) emits min(newlines, 2) `\n`s when it contains
    * any, else one space; leading/trailing runs drop entirely. */
  private def normalizeWs(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (isWs(c)) {
        var nl = 0
        var j = i
        while (j < t.length && isWs(t.charAt(j))) {
          if (t.charAt(j) == '\n') nl += 1
          j += 1
        }
        if (sb.length > 0 && j < t.length) {
          if (nl == 0) sb.append(' ')
          else if (nl == 1) sb.append('\n')
          else sb.append("\n\n")
        }
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The full `Html.htmlText` pipeline; null-safe at the Expression. */
  def htmlText(s: UTF8String): UTF8String = {
    var t = s.toString
    t = stripElement(t, "script")
    t = stripElement(t, "style")
    t = stripComments(t)
    t = replaceBr(t)
    t = replaceBlockClose(t)
    t = stripRemainingTags(t)
    t = decodeEntities(t)
    t = normalizeWs(t)
    UTF8String.fromString(t)
  }
}

/** `html_text(html)` as a native expression (whole-stage codegen via a
  * static kernel call) — bit-identical to the Column regexp chain
  * (`Html.htmlTextChain`), fuzz-pinned by `HtmlSpec`. */
case class HtmlTextExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"
  override protected def nullSafeEval(s: Any): Any =
    HtmlKernels.htmlText(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.HtmlKernels.htmlText($c)")
  override protected def withNewChildInternal(nc: Expression): HtmlTextExpr =
    copy(child = nc)
}

/** Column builder (mirrors [[TextHashExprs]]). */
object HtmlExprs {
  def htmlText(c: Column): Column =
    ExpressionUtils.column(HtmlTextExpr(ExpressionUtils.expression(c)))
}
