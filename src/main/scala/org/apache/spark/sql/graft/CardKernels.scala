/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * is private[sql] — the standard placement for third-party native
 * expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-validated payment-card scrubbing — the PII tier a regex alone
  * cannot express (Dolma/FineWeb-style pipelines pair a digit-run
  * candidate regex WITH the Luhn mod-10 check so order ids and
  * timestamps survive while real card numbers redact).
  *
  * Candidate = a maximal digit run allowing ONE space or dash between
  * adjacent digits (the regex `\d(?:[ -]?\d)+`, leftmost-greedy in both
  * Java and RE2 — the oracle replays it verbatim) whose DIGIT count is
  * 13–19. A candidate redacts to `<CC>` iff its digits pass Luhn
  * (double every second digit from the right, subtract 9 past 9, total
  * ≡ 0 mod 10). One scan over the UTF-8 bytes: digits and separators
  * are ASCII, so multi-byte text passes through untouched. */
object CardKernels {

  private def luhn(digits: Array[Byte], from: Int, n: Int): Boolean = {
    var sum = 0
    var i = 0
    while (i < n) {
      val d = digits(from + n - 1 - i) - '0'
      sum += (if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t }
              else d)
      i += 1
    }
    sum % 10 == 0
  }

  /** (scrubbed, n_candidates, n_valid, valid_cards) — candidates are
    * the 13–19-digit runs; `valid_cards` joins the Luhn-valid ones with
    * `|` in order of appearance (the oracle's bit-check target). */
  private val Placeholder = "<CC>".getBytes

  def scrubCards(text: UTF8String): InternalRow = {
    val b = text.getBytes
    val len = b.length
    val out = new java.io.ByteArrayOutputStream(len)
    val valid = new java.io.ByteArrayOutputStream()
    val digits = new Array[Byte](32)
    var nCand = 0
    var nValid = 0
    var i = 0
    while (i < len) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        // extend the maximal run: digit, then (sep? digit)* — exactly
        // the candidate regex's leftmost-greedy consumption
        val start = i
        var nd = 0
        var j = i
        var runEnd = i // index AFTER the last digit consumed
        var go = true
        while (go && j < len) {
          val cj = b(j)
          if (cj >= '0' && cj <= '9') {
            if (nd < 32) digits(nd) = cj
            nd += 1; j += 1; runEnd = j
          } else if ((cj == ' ' || cj == '-') && j + 1 < len &&
            b(j + 1) >= '0' && b(j + 1) <= '9') {
            j += 1 // one separator, next is a digit
          } else go = false
        }
        val isCand = nd >= 13 && nd <= 19
        val isValid = isCand && luhn(digits, 0, nd)
        if (isCand) {
          nCand += 1
          if (isValid) {
            nValid += 1
            if (valid.size() > 0) valid.write('|')
            valid.write(b, start, runEnd - start)
            out.write(Placeholder, 0, Placeholder.length)
          }
        }
        if (!isValid) out.write(b, start, runEnd - start)
        i = runEnd
      } else {
        out.write(c) // any non-digit byte (multi-byte UTF-8 included)
        i += 1       // copies verbatim — the scan only acts on ASCII
      }
    }
    InternalRow(UTF8String.fromBytes(out.toByteArray), nCand, nValid,
      UTF8String.fromBytes(valid.toByteArray))
  }
}

/** Native struct expression over [[CardKernels.scrubCards]]. */
case class CardScrubExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CardScrubExpr.schema
  override def prettyName: String = "scrub_cards"

  override protected def nullSafeEval(t: Any): Any =
    CardKernels.scrubCards(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graft.CardKernels.scrubCards($t)")

  override protected def withNewChildInternal(newChild: Expression)
  : CardScrubExpr = copy(child = newChild)
}

object CardScrubExpr {
  val schema: StructType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_candidates", IntegerType, nullable = false),
    StructField("n_valid", IntegerType, nullable = false),
    StructField("valid_cards", StringType, nullable = false)))
}
