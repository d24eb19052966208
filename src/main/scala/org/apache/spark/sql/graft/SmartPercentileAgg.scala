/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * is private[sql] — the standard placement for third-party native
 * aggregates. */
package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, DoubleType}

/** percentileSmartTDigest (reference
  * `PercentileSmartTDigestAggregationFunction`): raw values accumulate in
  * a plain list until `threshold`, then the buffer converts to a sketch —
  * small groups get EXACT percentiles, large groups a bounded-error
  * estimate, in a single mergeable pass. KLL plays the TDigest role
  * (same mergeable quantile-sketch contract; TDigest isn't in this
  * environment's jars). Exact-path interpolation matches SQL
  * percentile/quantile_cont, so below the threshold the result is
  * bit-identical to the exact aggregate. */
final class SmartBuf(threshold: Int, k: Int) {
  var values: java.util.ArrayList[java.lang.Double] =
    new java.util.ArrayList[java.lang.Double]()
  var sketch: KllDoublesSketch = null

  def isExact: Boolean = sketch == null

  private def convert(): Unit = {
    sketch = KllDoublesSketch.newHeapInstance(k)
    val it = values.iterator()
    while (it.hasNext) sketch.update(it.next().doubleValue)
    values = null
  }

  def add(d: Double): Unit =
    if (sketch != null) sketch.update(d)
    else {
      values.add(d)
      if (values.size > threshold) convert()
    }

  def mergeIn(other: SmartBuf): Unit =
    if (sketch == null && other.sketch == null) {
      values.addAll(other.values)
      if (values.size > threshold) convert()
    } else {
      if (sketch == null) convert()
      if (other.sketch == null && other.values.size > 0) {
        val it = other.values.iterator()
        while (it.hasNext) sketch.update(it.next().doubleValue)
      } else if (other.sketch != null) sketch.merge(other.sketch)
    }

  /** quantile_cont interpolation on the sorted raw list. */
  def quantile(frac: Double): Double =
    if (sketch != null) {
      if (sketch.isEmpty) Double.NaN else sketch.getQuantile(frac)
    } else if (values.isEmpty) Double.NaN
    else {
      val arr = new Array[Double](values.size)
      var i = 0
      while (i < arr.length) { arr(i) = values.get(i); i += 1 }
      java.util.Arrays.sort(arr)
      val pos = frac * (arr.length - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, arr.length - 1)
      arr(lo) + (pos - lo) * (arr(hi) - arr(lo))
    }

  def serialize(): Array[Byte] =
    if (sketch == null) {
      val bb = java.nio.ByteBuffer.allocate(5 + 8 * values.size)
      bb.put(0: Byte).putInt(values.size)
      val it = values.iterator()
      while (it.hasNext) bb.putDouble(it.next().doubleValue)
      bb.array()
    } else {
      val sk = sketch.toByteArray
      val bb = java.nio.ByteBuffer.allocate(1 + sk.length)
      bb.put(1: Byte).put(sk)
      bb.array()
    }
}

object SmartBuf {
  def deserialize(bytes: Array[Byte], threshold: Int, k: Int): SmartBuf = {
    val buf = new SmartBuf(threshold, k)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.get() match {
      case 0 =>
        val n = bb.getInt
        var i = 0
        while (i < n) { buf.values.add(bb.getDouble); i += 1 }
      case _ =>
        buf.values = null
        buf.sketch = KllDoublesSketch.heapify(
          Memory.wrap(java.util.Arrays.copyOfRange(bytes, 1, bytes.length)))
    }
    buf
  }
}

case class SmartPercentileAgg(
    child: Expression,
    frac: Double,
    threshold: Int = 4096,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmartBuf]
  with UnaryLike[Expression] {

  override def prettyName: String = "percentile_smart"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SmartBuf =
    new SmartBuf(threshold, k)

  override def update(buffer: SmartBuf, input: InternalRow): SmartBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[java.lang.Number].doubleValue)
    buffer
  }

  override def merge(buffer: SmartBuf, other: SmartBuf): SmartBuf = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: SmartBuf): Any = buffer.quantile(frac)

  override def serialize(buffer: SmartBuf): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SmartBuf =
    SmartBuf.deserialize(bytes, threshold, k)

  override def withNewMutableAggBufferOffset(o: Int): SmartPercentileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SmartPercentileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(nc: Expression)
  : SmartPercentileAgg = copy(child = nc)
}

object SmartPercentileAgg {
  def column(c: Column, frac: Double, threshold: Int = 4096): Column =
    ExpressionUtils.column(
      SmartPercentileAgg(ExpressionUtils.expression(c), frac, threshold)
        .toAggregateExpression())
}
