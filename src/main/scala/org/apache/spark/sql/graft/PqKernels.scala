/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * (AbstractDataType, ExpressionUtils) is private[sql] — the standard
 * placement for third-party native expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, FloatType, IntegerType, LongType}

/** Tight-loop kernels behind the product-quantization ANN operators.
  *
  * The Column-level formulation of PQ encode / ADC (m·k unrolled
  * `subDistU` sub-expressions + `least(struct…)` argmin trees) generates
  * a ~12,000-line Java class at m=8,k=16 — past janino's method limits,
  * so Spark silently fell back to interpreted evaluation (round-12
  * verdict: 9× `ERROR CodeGenerator` in the PQ specs). These kernels
  * compute bit-identical values in ONE compact generated call per row:
  * the codebook rides into codegen as a reference object and the m·k·sub
  * triple loop lives in pre-compiled bytecode, so the generated class
  * stays tiny and whole-stage codegen survives.
  *
  * Arithmetic contract (must stay bit-exact with the DuckDB oracle and
  * the previous Column formulation):
  *   d  = dot(x,x) − 2·dot(x,c) + dot(c,c)  — each dot a left-to-right
  *        float→double accumulation ([[VecDotProduct]] order);
  *   du = floor(round(d, 6)·1e6 + 0.5) as long, where round is Spark's
  *        Round on double = BigDecimal.valueOf(d).setScale(6, HALF_UP).
  *
  * Reference analog: Pinot's vector-index scoring kernels are likewise
  * native single-pass code, not expression trees. */
object PqKernels {

  /** == `floor(round(d, 6) * 1e6 + 0.5).cast(long)` (Spark semantics).
    *
    * Fast path: with d·1e6 ≤ ~1e15 the naive double computation agrees
    * with the exact decimal rounding whenever it lands ≥1e-3 away from a
    * half-integer boundary (total double error here is ≤ ~4e-16·|d·1e6|,
    * orders of magnitude inside the band). Near a boundary, fall back to
    * the literal BigDecimal replication of Spark's Round-on-double. */
  def quantU(d: Double): Long = {
    val t = d * 1e6 + 0.5
    val fl = Math.floor(t)
    val frac = t - fl
    // past 2^51 double spacing reaches 0.5, so frac is exactly 0 or 0.5
    // — the half-integer case lands INSIDE the accept band while the
    // accumulated error of d*1e6+0.5 can exceed it; route to the exact
    // path whenever spacing makes the band test meaningless
    if (Math.abs(t) < 2.251799813685248e15 &&
        frac > 1e-3 && frac < 0.999) fl.toLong
    else {
      val r = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      Math.floor(r * 1e6 + 0.5).toLong
    }
  }

  /** Self-dots `dot(c,c)` of every centroid — precomputed once per plan
    * (same float→double left-to-right accumulation as the per-row dots). */
  def selfDots(cb: Array[Float], sub: Int): Array[Double] = {
    val n = cb.length / sub
    val out = new Array[Double](n)
    var c = 0
    while (c < n) {
      var acc = 0.0
      var i = c * sub
      val end = i + sub
      while (i < end) { val v = cb(i).toDouble; acc += v * v; i += 1 }
      out(c) = acc
      c += 1
    }
    out
  }

  /** Per-subspace argmin codes (ties → lowest code): array<int> of m.
    * `vec` shorter than (j+1)·sub replays `slice` semantics — the dots
    * run over the available prefix only. */
  def pqCodes(vec: ArrayData, m: Int, k: Int, sub: Int,
              cb: Array[Float], cc: Array[Double]): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val lim = math.max(0, math.min(sub, n - base))
      var xx = 0.0
      var i = 0
      while (i < lim) {
        val v = vec.getFloat(base + i).toDouble; xx += v * v; i += 1
      }
      var bestU = Long.MaxValue
      var best = 0
      var c = 0
      while (c < k) {
        var xc = 0.0
        var p = (j * k + c) * sub
        i = 0
        while (i < lim) {
          xc += vec.getFloat(base + i).toDouble * cb(p).toDouble
          i += 1; p += 1
        }
        val u = quantU(xx - 2.0 * xc + cc(j * k + c))
        if (u < bestU) { bestU = u; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Full m×k quantized-distance table: array<array<long>> — the ADC
    * table each query row carries (m=1 doubles as the IVF coarse-cell
    * distance vector). */
  def pqAdcTable(vec: ArrayData, m: Int, k: Int, sub: Int,
                 cb: Array[Float], cc: Array[Double]): ArrayData = {
    val n = vec.numElements()
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val lim = math.max(0, math.min(sub, n - base))
      var xx = 0.0
      var i = 0
      while (i < lim) {
        val v = vec.getFloat(base + i).toDouble; xx += v * v; i += 1
      }
      val row = new Array[Long](k)
      var c = 0
      while (c < k) {
        var xc = 0.0
        var p = (j * k + c) * sub
        i = 0
        while (i < lim) {
          xc += vec.getFloat(base + i).toDouble * cb(p).toDouble
          i += 1; p += 1
        }
        row(c) = quantU(xx - 2.0 * xc + cc(j * k + c))
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Rounded-cosine argmax over k centroids (ties → lowest index) — the
    * SemDeDup assignment kernel. Bit-exact with the Column formulation
    * `greatest(struct(round(dot(x,c)/(|x|·|c|), 6), -i)…)`: dots are
    * left-to-right float→double, |x| is the FULL-vector norm, each
    * centroid dot runs over min(sub, |x|) elements, and the rounded
    * cosine maps to a scaled long via [[quantU]] (monotone and
    * injective on the 6-dp grid, so comparisons agree exactly). NaN
    * cosines (zero vectors) map to Long.MaxValue, matching Spark's
    * NaN-greatest double ordering. */
  def cosArgmax(vec: ArrayData, k: Int, sub: Int, cb: Array[Float],
                cnorms: Array[Double]): Int = {
    val n = vec.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) { val v = vec.getFloat(i).toDouble; xx += v * v; i += 1 }
    val nx = Math.sqrt(xx)
    val lim = math.max(0, math.min(sub, n))
    var bestU = Long.MinValue
    var best = 0
    var c = 0
    while (c < k) {
      var xc = 0.0
      var p = c * sub
      i = 0
      while (i < lim) {
        xc += vec.getFloat(i).toDouble * cb(p).toDouble
        i += 1; p += 1
      }
      val cos = xc / (nx * cnorms(c))
      val u =
        if (java.lang.Double.isNaN(cos)) Long.MaxValue else quantU(cos)
      if (u > bestU) { bestU = u; best = c }
      c += 1
    }
    best
  }

  /** ADC accumulation: Σ_j qtab[j][codes[j]] — exact long sum. */
  def pqAdcSum(qtab: ArrayData, codes: ArrayData, bytes: Boolean): Long = {
    val m = codes.numElements()
    var acc = 0L
    var j = 0
    while (j < m) {
      val c = if (bytes) codes.getByte(j).toInt else codes.getInt(j)
      acc += qtab.getArray(j).getLong(c)
      j += 1
    }
    acc
  }
}

/** Codebook constants shared by the PQ expressions: the flat centroid
  * array rides into generated code as a reference object, the self-dots
  * are precomputed once per expression instance. */
sealed trait PqCodebookExpr { self: UnaryExpression =>
  def m: Int
  def k: Int
  def sub: Int
  def codebook: Array[Float]
  require(codebook.length == m * k * sub,
    s"codebook length ${codebook.length} != m*k*sub = ${m * k * sub}")
  @transient protected lazy val cc: Array[Double] =
    PqKernels.selfDots(codebook, sub)

  protected def genKernelCall(ctx: CodegenContext, ev: ExprCode,
                              kernel: String): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    val ccRef = ctx.addReferenceObj("pqSelfDots", cc, "double[]")
    self.nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"org.apache.spark.sql.graft.PqKernels.$kernel($c, $m, $k, $sub, " +
      s"$cbRef, $ccRef);")
  }
}

/** Per-subspace nearest-centroid codes as ONE compact codegen call:
  * array<float> vector → array<int> of m codes. With m=1 and sub=dim this
  * is the IVF coarse-cell argmin. */
case class PqCodesExpr(child: Expression, m: Int, k: Int, sub: Int,
                       codebook: Array[Float])
  extends UnaryExpression with ExpectsInputTypes with PqCodebookExpr {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override protected def nullSafeEval(a: Any): Any =
    PqKernels.pqCodes(a.asInstanceOf[ArrayData], m, k, sub, codebook, cc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = genKernelCall(ctx, ev, "pqCodes")
  override protected def withNewChildInternal(nc: Expression): PqCodesExpr =
    copy(child = nc)
}

/** Quantized-distance table (the query-side ADC table): array<float>
  * vector → array<array<long>> of m×k scaled-long distances. */
case class PqAdcTableExpr(child: Expression, m: Int, k: Int, sub: Int,
                          codebook: Array[Float])
  extends UnaryExpression with ExpectsInputTypes with PqCodebookExpr {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_table"
  override protected def nullSafeEval(a: Any): Any =
    PqKernels.pqAdcTable(a.asInstanceOf[ArrayData], m, k, sub, codebook, cc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = genKernelCall(ctx, ev, "pqAdcTable")
  override protected def withNewChildInternal(nc: Expression): PqAdcTableExpr =
    copy(child = nc)
}

/** Rounded-cosine argmax as ONE compact codegen call: array<float>
  * vector → int centroid index (the SemDeDup flat-assignment kernel;
  * the k-unrolled greatest(struct…) tree it replaces is codegen-hostile
  * at the √k the adaptive path reaches on large corpora). */
case class CosArgmaxExpr(child: Expression, k: Int, sub: Int,
                         codebook: Array[Float])
  extends UnaryExpression with ExpectsInputTypes {
  require(codebook.length == k * sub,
    s"codebook length ${codebook.length} != k*sub = ${k * sub}")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cos_argmax"
  @transient private lazy val cnorms: Array[Double] =
    PqKernels.selfDots(codebook, sub).map(Math.sqrt)
  override protected def nullSafeEval(a: Any): Any =
    PqKernels.cosArgmax(a.asInstanceOf[ArrayData], k, sub, codebook, cnorms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val cbRef = ctx.addReferenceObj("cosCodebook", codebook, "float[]")
    val cnRef = ctx.addReferenceObj("cosNorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"org.apache.spark.sql.graft.PqKernels.cosArgmax($c, $k, $sub, " +
      s"$cbRef, $cnRef);")
  }
  override protected def withNewChildInternal(nc: Expression): CosArgmaxExpr =
    copy(child = nc)
}

/** ADC distance: Σ_j qtab[j][codes[j]] as one exact long sum. Codes may
  * be array<tinyint> (the persisted m-byte form) or array<int>. */
case class PqAdcSumExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_sum"
  private def codesAreBytes: Boolean = right.dataType match {
    case ArrayType(ByteType, _) => true
    case _ => false
  }
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(et, _)) =>
        et == ByteType || et == IntegerType
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<array<long>>, array<tinyint|int>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.pqAdcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      codesAreBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = " +
      s"org.apache.spark.sql.graft.PqKernels.pqAdcSum($a, $b, " +
      s"$codesAreBytes);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcSumExpr =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridges for the PQ kernels (graft code lives outside
  * the sql package). Codebooks arrive in the operator-facing m×k×sub
  * nesting and are flattened once here. */
object PqExpressions {
  private def flat(centroids: Array[Array[Array[Float]]]): Array[Float] =
    centroids.flatMap(_.flatMap(identity))

  def pqCodes(vec: Column, centroids: Array[Array[Array[Float]]]): Column = {
    val m = centroids.length
    val k = centroids.head.length
    val sub = centroids.head.head.length
    ExpressionUtils.column(PqCodesExpr(
      ExpressionUtils.expression(vec), m, k, sub, flat(centroids)))
  }

  def pqAdcTable(vec: Column, centroids: Array[Array[Array[Float]]])
  : Column = {
    val m = centroids.length
    val k = centroids.head.length
    val sub = centroids.head.head.length
    ExpressionUtils.column(PqAdcTableExpr(
      ExpressionUtils.expression(vec), m, k, sub, flat(centroids)))
  }

  def pqAdcSum(qtab: Column, codes: Column): Column =
    ExpressionUtils.column(PqAdcSumExpr(
      ExpressionUtils.expression(qtab), ExpressionUtils.expression(codes)))

  def cosArgmax(vec: Column, centroids: Array[Array[Float]]): Column = {
    val k = centroids.length
    val sub = centroids.head.length
    ExpressionUtils.column(CosArgmaxExpr(
      ExpressionUtils.expression(vec), k, sub,
      centroids.flatten))
  }
}
