package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLP log input format (reference
  * `pinot-plugins/pinot-input-format/pinot-clp-log/` —
  * `CLPLogRecordExtractor`: JSON log records whose configured message
  * fields are CLP-decomposed into three columns,
  * `<field>_logtype` / `<field>_dictionaryVars` / `<field>_encodedVars`).
  *
  * CLP (Compressed Log Processor, Rodrigues et al., OSDI '21) splits a log
  * message into its static text (logtype), repetitive variable values
  * (dictionary vars) and numeric values (encoded vars); the placeholder
  * bytes 0x11/0x12 mark where each variable class re-enters the text. The
  * yscope encoder jar is not in this environment, so this is a from-scratch
  * scoped codec of that public scheme:
  *
  *   - tokens are maximal runs outside the delimiter set (whitespace and
  *     `():[]{}<>,"';=`; `._-/+` stay inside tokens so paths, IPs and
  *     UUIDs survive whole);
  *   - a token containing a digit is a variable (CLP's heuristic);
  *   - pure integer tokens that fit a long become encoded vars
  *     (placeholder 0x12), except leading-zero forms, which stay
  *     dictionary vars so decode is byte-exact;
  *   - simple decimal floats (`-?\\d+.\\d+`, ≤15 digits) pack losslessly
  *     into one long — sign | decimal-point position | digit count |
  *     digit value — as encoded vars (placeholder 0x13), mirroring real
  *     CLP's packed-float class; longer/exponent forms and every other
  *     digit-bearing token go to the dictionary (placeholder 0x11).
  *
  * Decode re-substitutes variables in order, so
  * `decodeMessage(encodeMessage(m)) == m` for any message — the property
  * the specs pin. Encode is per-row and embarrassingly parallel. */
object ClpLog {

  val DictPlaceholder: Char = '\u0011'
  val IntPlaceholder: Char = '\u0012'
  val FloatPlaceholder: Char = '\u0013'
  /** Escapes placeholder bytes appearing literally in static text (real
    * CLP likewise escapes them in logtypes). */
  val Escape: Char = '\\'

  private def needsEscape(c: Char): Boolean =
    c == DictPlaceholder || c == IntPlaceholder || c == FloatPlaceholder ||
      c == Escape

  final case class Encoded(logtype: String, dictionaryVars: Seq[String],
                           encodedVars: Seq[Long])

  private def isDelim(c: Char): Boolean =
    Character.isWhitespace(c) || "():[]{}<>,\"';=".indexOf(c) >= 0

  private val IntRe = "-?\\d+".r
  private val FloatRe = "(-?)(\\d+)\\.(\\d+)".r

  /** Lossless packed-float long: [63] sign, [62..58] decimal-point
    * position, [57..53] digit count, [52..0] digit value. Returns None
    * when the token doesn't fit (>15 digits — 10^15 < 2^53 keeps the
    * value exact). */
  private[sources] def packFloat(tok: String): Option[Long] = tok match {
    case FloatRe(sign, ip, fp) =>
      val digits = ip + fp
      if (digits.length > 15) None
      else Some((if (sign.isEmpty) 0L else 1L << 63) |
        (ip.length.toLong << 58) | (digits.length.toLong << 53) |
        java.lang.Long.parseLong(digits))
    case _ => None
  }

  /** Inverse of [[packFloat]]. */
  private[sources] def unpackFloat(v: Long): String = {
    val sign = if ((v >>> 63) == 1L) "-" else ""
    val pointPos = ((v >>> 58) & 0x1f).toInt
    val len = ((v >>> 53) & 0x1f).toInt
    val digits = (v & ((1L << 53) - 1)).toString.reverse.padTo(len, '0')
      .reverse
    sign + digits.substring(0, pointPos) + "." + digits.substring(pointPos)
  }

  /** Decompose one message into (logtype, dictionary vars, encoded vars). */
  def encodeMessage(msg: String): Encoded = {
    val logtype = new StringBuilder
    val dict = new ArrayBuffer[String]
    val enc = new ArrayBuffer[Long]
    def static(s: String): Unit = s.foreach { c =>
      if (needsEscape(c)) logtype += Escape
      logtype += c
    }
    var i = 0
    val n = msg.length
    while (i < n) {
      if (isDelim(msg(i))) { static(msg(i).toString); i += 1 }
      else {
        val start = i
        while (i < n && !isDelim(msg(i))) i += 1
        val tok = msg.substring(start, i)
        if (!tok.exists(_.isDigit)) static(tok) // static text
        else if (packFloat(tok).isDefined) {
          enc += packFloat(tok).get
          logtype += FloatPlaceholder
        } else if (IntRe.matches(tok) && tok.toLongOption.isDefined) {
          enc += tok.toLong
          // leading zeros / "-0" wouldn't survive Long round-trip — those
          // stay dictionary vars so decode is byte-exact
          if (enc.last.toString == tok) logtype += IntPlaceholder
          else { enc.remove(enc.length - 1); dict += tok
                 logtype += DictPlaceholder }
        } else { dict += tok; logtype += DictPlaceholder }
      }
    }
    Encoded(logtype.toString, dict.toSeq, enc.toSeq)
  }

  /** Reassemble the original message (inverse of [[encodeMessage]]). */
  def decodeMessage(logtype: String, dictionaryVars: Seq[String],
                    encodedVars: Seq[Long]): String = {
    val out = new StringBuilder
    var d = 0
    var e = 0
    var i = 0
    while (i < logtype.length) {
      logtype(i) match {
        case Escape => out += logtype(i + 1); i += 1
        case DictPlaceholder => out ++= dictionaryVars(d); d += 1
        case IntPlaceholder => out.append(encodedVars(e)); e += 1
        case FloatPlaceholder => out ++= unpackFloat(encodedVars(e)); e += 1
        case c => out += c
      }
      i += 1
    }
    require(d == dictionaryVars.length && e == encodedVars.length,
      s"variable count mismatch: logtype wants ($d,$e), " +
        s"got (${dictionaryVars.length},${encodedVars.length})")
    out.toString
  }

  private val encodeUdf = udf((m: String) =>
    if (m == null) null else encodeMessage(m))
  private val decodeUdf = udf(
    (lt: String, dv: Seq[String], ev: Seq[Long]) =>
      if (lt == null) null else decodeMessage(lt, dv, ev))

  /** CLP-encode `field` into the reference's three-column shape
    * (`<field>_logtype`, `<field>_dictionaryVars`, `<field>_encodedVars`),
    * dropping the original column — `CLPLogRecordExtractor.encodeFieldWithClp`.
    * Ingest-time, one pass, no shuffle. */
  def encodeField(df: DataFrame, field: String): DataFrame = {
    val e = encodeUdf(col(field))
    df.withColumn(s"${field}_logtype", e.getField("logtype"))
      .withColumn(s"${field}_dictionaryVars", e.getField("dictionaryVars"))
      .withColumn(s"${field}_encodedVars", e.getField("encodedVars"))
      .drop(field)
  }

  /** Reassembled message column from the three encoded columns (search /
    * export path). */
  def decodeField(df: DataFrame, field: String): DataFrame =
    df.withColumn(field, decodeUdf(col(s"${field}_logtype"),
      col(s"${field}_dictionaryVars"), col(s"${field}_encodedVars")))

  /** Read a JSONL log archive, CLP-encoding `clpFields` (the
    * `CLPLogMessageDecoder` shape: every other field passes through as
    * JSON). */
  def read(spark: SparkSession, path: String, clpFields: Seq[String])
  : DataFrame =
    clpFields.foldLeft(spark.read.json(path))(encodeField)
}
