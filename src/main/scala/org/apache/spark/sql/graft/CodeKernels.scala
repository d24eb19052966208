/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * is private[sql] — the standard placement for third-party native
 * expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-scan StarCoder code-signal kernel (Li 2023 §3 metrics). The
  * Column formulation ([[graft.functions.TextAnalysis.codeSignalsChain]],
  * kept as the oracle-replay reference) costs per row: a split
  * allocation, an INTERPRETED max-line HOF, three multiline-regex passes
  * and a whole-text regexp_replace copy — the 100× web one-off measured
  * it as the family's priciest per-byte projection (50 s warm at
  * bytes_factor 170). This kernel computes all six fields in ONE pass
  * over the UTF-8 bytes and stays inside whole-stage codegen.
  *
  * Bit-parity contract (spec-fuzzed against the chain): line = `\n`
  * split with trailing empty kept; lengths in CODE POINTS (Spark
  * `length` semantics — count non-continuation bytes; `\n` can never be
  * a continuation byte, so the scan is safe on multi-byte text); a
  * comment line's first non-[ \t] chars are `#`, `//` or `--` (the
  * `(?m)^[ \t]*(#|//|--)` anchor); a blank line has no char outside
  * [ \t] (`\r` counts NON-blank, exactly as the chain's `[^ \t\n]`
  * class); fractions round 6dp through the same BigDecimal HALF_UP as
  * Spark's Round-on-double. */
object CodeKernels {

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (max_line_len, mean_line_len, alnum_frac, comment_frac,
    * blank_frac, code_pass) in one byte scan. */
  def codeSignals(text: UTF8String): InternalRow = {
    val b = text.getBytes
    val len = b.length
    var i = 0
    var nLines = 1L
    var totalChars = 0L // code points excluding the \n separators
    var maxLine = 0L
    var curLine = 0L
    var alnum = 0L
    var comments = 0L
    var nonBlank = 0L
    // per-line states: 0 = in indent ([ \t]*), 1 = first non-indent
    // char seen (comment verdict taken), and blankness decided
    var inIndent = true
    var lineNonBlank = false
    while (i < len) {
      val c = b(i)
      if (c == '\n') {
        if (maxLine < curLine) maxLine = curLine
        if (lineNonBlank) nonBlank += 1
        nLines += 1
        curLine = 0
        inIndent = true
        lineNonBlank = false
      } else {
        if ((c & 0xC0) != 0x80) { // a code point starts here
          curLine += 1
          totalChars += 1
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9')) alnum += 1
        }
        if (c != ' ' && c != '\t') {
          lineNonBlank = true
          if (inIndent) {
            // first non-indent char: the comment anchor's decision point
            if (c == '#' ||
              (c == '/' && i + 1 < len && b(i + 1) == '/') ||
              (c == '-' && i + 1 < len && b(i + 1) == '-')) comments += 1
            inIndent = false
          }
        }
      }
      i += 1
    }
    if (maxLine < curLine) maxLine = curLine
    if (lineNonBlank) nonBlank += 1
    val nL = math.max(nLines, 1L).toDouble
    val meanLine = r6(totalChars.toDouble / nL)
    val alnumFrac = r6(alnum.toDouble /
      math.max(totalChars + (nLines - 1), 1L).toDouble)
    val commentFrac = r6(comments.toDouble / nL)
    val blankFrac = r6((nLines - nonBlank).toDouble / nL)
    InternalRow(maxLine.toInt, meanLine, alnumFrac, commentFrac,
      blankFrac,
      maxLine <= 1000L && meanLine <= 100.0 && alnumFrac >= 0.25)
  }
}

/** Native struct-producing expression over [[CodeKernels.codeSignals]];
  * field names/types match the Column chain so gates and user code are
  * drop-in. */
case class CodeSignalsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CodeSignalsExpr.schema
  override def prettyName: String = "code_signals"

  override protected def nullSafeEval(t: Any): Any =
    CodeKernels.codeSignals(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graft.CodeKernels.codeSignals($t)")

  override protected def withNewChildInternal(newChild: Expression)
  : CodeSignalsExpr = copy(child = newChild)
}

object CodeSignalsExpr {
  val schema: StructType = StructType(Seq(
    StructField("max_line_len", IntegerType, nullable = false),
    StructField("mean_line_len", DoubleType, nullable = false),
    StructField("alnum_frac", DoubleType, nullable = false),
    StructField("comment_frac", DoubleType, nullable = false),
    StructField("blank_frac", DoubleType, nullable = false),
    StructField("code_pass", BooleanType, nullable = false)))
}
