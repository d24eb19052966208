/* Hosted under org.apache.spark.sql — Catalyst's extension surface
 * (AbstractDataType) is private[sql]. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED arrays of longs — a primitive merge walk in
  * whole-stage codegen. Spark's generic `array_intersect` builds a hash
  * set per row with boxed elements; for the near-dup verifier (millions of
  * candidate pairs × a few hundred hashed shingles each) the merge walk on
  * pre-sorted arrays is the classic postings-intersection kernel.
  * Inputs MUST be sorted ascending and duplicate-free (array_sort ∘
  * array_distinct upstream) — the caller owns that invariant. */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val vx = x.getLong(i); val vy = y.getLong(j)
      if (vx == vy) { n += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName keeps locals unique when two instances share a
      // codegen stage (non-nullable children emit at enclosing scope).
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i);
         |  long $vy = $b.getLong($j);
         |  if ($vx == $vy) { $n++; $i++; $j++; }
         |  else if ($vx < $vy) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectSize {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
