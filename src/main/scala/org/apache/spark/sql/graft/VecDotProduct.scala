/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * (AbstractDataType, ExpressionUtils) is private[sql] — the standard
 * placement for third-party native expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates interpreted — per-element lambda invocation with boxing. This
  * expression participates in whole-stage codegen: the generated Java is a
  * primitive float loop reading Tungsten `ArrayData` directly, no per-row
  * allocation. Semantics match the HOF version bit-for-bit for null-free
  * arrays (left-to-right double accumulation — the order the DuckDB oracle
  * sums in too).
  *
  * The (b)-tier of the custom-operator ladder (SURVEY §2: native
  * `Expression` with `doGenCode` beats UDF): the scalar kernel of the
  * embedding ANN / near-dup operators. */
case class VecDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName: with non-nullable children the snippet lands at
      // enclosing scope, so two instances in one codegen stage would
      // otherwise declare duplicate Java locals (Janino failure).
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge for graft code outside the sql package. */
object GraftExpressions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Luhn-validated card scrub struct (see [[CardKernels]]). */
  def scrubCards(text: Column): Column =
    ExpressionUtils.column(CardScrubExpr(
      ExpressionUtils.expression(text)))

  /** One-scan StarCoder code-signal struct (see [[CodeKernels]]). */
  def codeSignals(text: Column): Column =
    ExpressionUtils.column(CodeSignalsExpr(
      ExpressionUtils.expression(text)))

  /** Exact integral division (SQL's `a div b`, floor-toward-zero on
    * BIGINT): the `/` Column operator divides as DOUBLE, which silently
    * loses bits past 2^53 — fatal for micro-unit rank arithmetic. `div`
    * is parser-level only (not in FunctionRegistry), hence this bridge. */
  def integralDiv(a: Column, b: Column): Column =
    ExpressionUtils.column(org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b)))

  /** Lift a Column-level function into a FunctionRegistry builder —
    * how the Pinot-named surface becomes callable from spark.sql. Uses the
    * EAGER ColumnNode converter: `ExpressionUtils.expression` returns a
    * lazy Unevaluable placeholder that only resolves on the Dataset path,
    * not inside a FunctionRegistry substitution. */
  def builder(f: Seq[Column] => Column)
  : Seq[Expression] => Expression =
    args => ColumnNodeToExpressionConverter(
      f(args.map(ExpressionUtils.column)).node)

  /** Builder variant receiving raw argument Expressions — for functions
    * that must read a LITERAL argument at registration time (predicate /
    * query strings compiled into expression trees, e.g. TEXT_MATCH and
    * JSON_MATCH). */
  def builderRaw(f: Seq[Expression] => Column)
  : Seq[Expression] => Expression =
    args => ColumnNodeToExpressionConverter(f(args).node)

  /** Extract a required foldable string argument. */
  def litString(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
        if s != null => s.toString
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a string literal, got: ${other.sql}")
  }

  /** Expression → Column for raw builders. */
  def asColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Column → Expression (eager converter) — for optimizer rules that
    * lower Column-built trees into a plan they are rewriting. */
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
