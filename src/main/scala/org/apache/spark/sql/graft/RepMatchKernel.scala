/* Hosted under org.apache.spark.sql — Catalyst's extension surface
 * (AbstractDataType) is private[sql]. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 rule-path wildcard match as a direct two-pointer scan —
  * the hot probe of [[graft.operators.Robots.frontierFilter]]. The
  * declarative twin (rule → regex via `ruleRegex`, probed with
  * `regexp_like`) pays `Pattern.compile` PER ROW when the pattern is a
  * join-supplied column — the per-row compile dwarfs the match at
  * frontier scale. This kernel matches the rule text directly: `*`
  * spans any char run (greedy-leftmost segment placement — the classic
  * wildcard algorithm), a trailing `$` anchors the end, everything
  * else is a literal; unanchored rules match a PREFIX of the path.
  * Bit-parity with the regex twin is fuzz-pinned in RobotsSpec. */
object RepMatchKernel {

  /** Static match entry (called from generated code). */
  def repMatch(path: UTF8String, rule: UTF8String): Boolean = {
    val s = path.toString
    var p = rule.toString
    val anchored = p.nonEmpty && p.charAt(p.length - 1) == '$'
    if (anchored) p = p.substring(0, p.length - 1)
    val parts = p.split("\\*", -1)
    if (!s.startsWith(parts(0))) return false
    if (parts.length == 1)
      return !anchored || s.length == parts(0).length
    var i = parts(0).length
    var k = 1
    while (k < parts.length - 1) {
      val idx = s.indexOf(parts(k), i)
      if (idx < 0) return false
      i = idx + parts(k).length
      k += 1
    }
    val last = parts(parts.length - 1)
    if (anchored) s.length - last.length >= i && s.endsWith(last)
    else s.indexOf(last, i) >= 0
  }

  def column(path: Column, rule: Column): Column =
    ExpressionUtils.column(RepMatch(
      ExpressionUtils.expression(path), ExpressionUtils.expression(rule)))
}

case class RepMatch(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "rep_match"

  override protected def nullSafeEval(s: Any, p: Any): Any =
    RepMatchKernel.repMatch(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, (s, p) =>
      s"org.apache.spark.sql.graft.RepMatchKernel.repMatch($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepMatch =
    copy(left = newLeft, right = newRight)
}
