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
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** percentileRawEst as a `TypedImperativeAggregate` — the same SPI tier as
  * Spark's own HllSketchAgg and the reference's `AggregationFunction`
  * contract (`aggregate / merge / extractFinalResult` with an opaque
  * intermediate): the KLL sketch object lives in the buffer and is only
  * serialized at shuffle boundaries, not per row (the `Aggregator`
  * formulation pays heapify+serialize on every update). Result is the
  * serialized sketch, mergeable across jobs. */
case class KllPercentileAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "percentile_raw_kll"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow)
  : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v match {
      case d: java.lang.Double => d.doubleValue
      case f: java.lang.Float => f.doubleValue
      case n: java.lang.Number => n.doubleValue
    })
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch)
  : KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllPercentileAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllPercentileAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(nc: Expression)
  : KllPercentileAgg = copy(child = nc)
}

object KllPercentileAgg {
  def column(c: Column, k: Int = 200): Column =
    ExpressionUtils.column(
      KllPercentileAgg(ExpressionUtils.expression(c), k)
        .toAggregateExpression())
}
