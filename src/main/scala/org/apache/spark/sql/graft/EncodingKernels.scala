package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for mojibake repair — the core fix of the ftfy family
  * (Speer, `ftfy: fixes text for you`; the `fix_encoding` step CC-style
  * pipelines run right after HTML extraction): text whose UTF-8 bytes
  * were mis-decoded as Latin-1/Windows-1252 somewhere upstream
  * ("cafÃ©", "â€œsmartâ€") re-encodes through the SLOPPY-cp1252
  * inverse (cp1252's 27 punctuation/symbol remaps inverted; the five
  * undefined bytes and the C1 range fall back to their Latin-1
  * identity, so both mis-decode flavors repair) and strictly re-decodes
  * as UTF-8 (overlong forms, surrogates, and truncated sequences all
  * REPORT). The repair applies only when the whole round trip succeeds
  * AND changes the string — ASCII and already-clean text pass through
  * untouched, a string with any char outside the cp1252 image (CJK,
  * emoji, …) is provably not mojibake of this class and never touched.
  * Double mojibake (two bad decodes upstream) repairs by fixpoint
  * iteration, capped at 3 passes; the decorations the spec pins prove
  * the loop STOPS at the true text (a repaired string re-encodes to an
  * invalid UTF-8 byte sequence, so the loop cannot overshoot).
  *
  * Scale: a per-row char scan with zero allocation on the (dominant)
  * ASCII path — one branchy pass to find a high char, repair attempted
  * only then. Rides whole-stage codegen as a single static call. */
object EncodingKernels {

  /** Sloppy windows-1252 inverse: the byte whose cp1252 (or Latin-1)
    * decode is `c`, or -1 when `c` is outside both images. */
  private def cp1252Byte(c: Char): Int =
    if (c < 0x100) c // ASCII + Latin-1 range incl. sloppy C1 controls
    else c match {
      case 0x20AC => 0x80; case 0x201A => 0x82; case 0x0192 => 0x83
      case 0x201E => 0x84; case 0x2026 => 0x85; case 0x2020 => 0x86
      case 0x2021 => 0x87; case 0x02C6 => 0x88; case 0x2030 => 0x89
      case 0x0160 => 0x8A; case 0x2039 => 0x8B; case 0x0152 => 0x8C
      case 0x017D => 0x8E; case 0x2018 => 0x91; case 0x2019 => 0x92
      case 0x201C => 0x93; case 0x201D => 0x94; case 0x2022 => 0x95
      case 0x2013 => 0x96; case 0x2014 => 0x97; case 0x02DC => 0x98
      case 0x2122 => 0x99; case 0x0161 => 0x9A; case 0x203A => 0x9B
      case 0x0153 => 0x9C; case 0x017E => 0x9E; case 0x0178 => 0x9F
      case _ => -1
    }

  private def strictUtf8(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** cp1252 remaps of bytes 0x80–0x9F (sloppy: the five undefined bytes
    * and untouched positions fall back to their Latin-1/C1 identity —
    * the inverse of [[cp1252Byte]] restricted to that range). */
  private val Cp1252High: Array[Char] = {
    val a = (0x80 to 0x9F).map(_.toChar).toArray
    val remaps = Seq(0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192,
      0x84 -> 0x201E, 0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021,
      0x88 -> 0x02C6, 0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039,
      0x8C -> 0x0152, 0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019,
      0x93 -> 0x201C, 0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013,
      0x97 -> 0x2014, 0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161,
      0x9B -> 0x203A, 0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    remaps.foreach { case (b, c) => a(b - 0x80) = c.toChar }
    a
  }

  /** Sloppy-windows-1252 decode of raw bytes (total — every byte maps;
    * the charset tier [[graft.sources.Warc.payloadText]] routes here
    * when an HTTP header declares cp1252, which Spark's `decode`
    * whitelist lacks). */
  def cp1252Decode(b: Array[Byte]): UTF8String = {
    val chars = new Array[Char](b.length)
    var i = 0
    while (i < b.length) {
      val ub = b(i) & 0xff
      chars(i) =
        if (ub >= 0x80 && ub <= 0x9F) Cp1252High(ub - 0x80) else ub.toChar
      i += 1
    }
    UTF8String.fromString(new String(chars))
  }

  def fixMojibake(u: UTF8String): UTF8String = {
    var s = u.toString
    var pass = 0
    var changed = true
    while (changed && pass < 3) {
      changed = false
      var hasHigh = false
      var mappable = true
      var i = 0
      while (i < s.length && mappable) {
        val c = s.charAt(i)
        if (c >= 0x80) {
          hasHigh = true
          if (cp1252Byte(c) < 0) mappable = false
        }
        i += 1
      }
      if (hasHigh && mappable) {
        val bytes = new Array[Byte](s.length)
        var j = 0
        while (j < s.length) {
          bytes(j) = cp1252Byte(s.charAt(j)).toByte
          j += 1
        }
        val dec = strictUtf8(bytes)
        if (dec != null && dec != s) { s = dec; changed = true }
      }
      pass += 1
    }
    UTF8String.fromString(s)
  }
}

/** `fix_mojibake(text)` as a native expression (whole-stage codegen via
  * a static kernel call). */
case class FixMojibakeExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override protected def nullSafeEval(s: Any): Any =
    EncodingKernels.fixMojibake(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EncodingKernels.fixMojibake($c)")
  override protected def withNewChildInternal(nc: Expression)
  : FixMojibakeExpr = copy(child = nc)
}

/** `cp1252_decode(bin)` — sloppy-windows-1252 bytes → string. */
case class Cp1252DecodeExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "cp1252_decode"
  override protected def nullSafeEval(b: Any): Any =
    EncodingKernels.cp1252Decode(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EncodingKernels.cp1252Decode($c)")
  override protected def withNewChildInternal(nc: Expression)
  : Cp1252DecodeExpr = copy(child = nc)
}

/** Column builder (mirrors [[HtmlExprs]]). */
object EncodingExprs {
  def fixMojibake(c: Column): Column =
    ExpressionUtils.column(FixMojibakeExpr(ExpressionUtils.expression(c)))
  def cp1252Decode(c: Column): Column =
    ExpressionUtils.column(Cp1252DecodeExpr(ExpressionUtils.expression(c)))
}
