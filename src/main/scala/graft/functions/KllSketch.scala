package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** Raw quantile sketches (reference `PercentileRawEstAggregationFunction` /
  * `PercentileRawTDigestAggregationFunction`: the SERIALIZED sketch is the
  * aggregation result, so brokers/jobs can merge and re-query quantiles
  * without the raw data).
  *
  * DataSketches KLL doubles sketch fills the role: mergeable, bounded
  * rank error (~1.65% at k=200), compact serialized form. The aggregation
  * buffer is the serialized sketch (heapify → update/merge → serialize) —
  * same discipline as [[IdSetSketch]]; at scale the partial/merge/final
  * contract distributes like any other aggregate. */
object KllSketch {
  private val K = 200

  val aggregator: Aggregator[java.lang.Double, Array[Byte], Array[Byte]] =
    new Aggregator[java.lang.Double, Array[Byte], Array[Byte]] {
      private def heapify(b: Array[Byte]): KllDoublesSketch =
        if (b.isEmpty) KllDoublesSketch.newHeapInstance(K)
        else KllDoublesSketch.heapify(Memory.wrap(b))
      def zero: Array[Byte] = Array.empty
      def reduce(buf: Array[Byte], v: java.lang.Double): Array[Byte] = {
        if (v == null) buf
        else {
          val s = heapify(buf)
          s.update(v.doubleValue)
          s.toByteArray
        }
      }
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val s = heapify(a)
          s.merge(heapify(b))
          s.toByteArray
        }
      }
      def finish(buf: Array[Byte]): Array[Byte] = buf
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** percentileRawEst(col) → serialized KLL sketch bytes. Backed by the
    * native TypedImperativeAggregate (sketch object in the buffer,
    * serialization only at shuffle boundaries — the `AggregationFunction`
    * SPI tier); [[aggregator]] above stays as the portable spec-checked
    * Aggregator formulation. */
  def percentileRawAgg(c: Column): Column =
    org.apache.spark.sql.graft.KllPercentileAgg.column(c.cast("double"))

  /** Aggregator-based formulation (spec reference / non-sql-internal). */
  def percentileRawAggPortable(c: Column): Column = udaf(aggregator).apply(c)

  /** Quantile estimate from a serialized sketch (broker-side finish).
    * A serialized EMPTY sketch (all-null group from the native agg) is
    * non-empty bytes but has no items — getQuantile would throw, so it
    * maps to NaN like the zero buffer. */
  val kllQuantile = udf((b: Array[Byte], p: Double) =>
    if (b == null || b.isEmpty) Double.NaN
    else {
      val s = KllDoublesSketch.heapify(Memory.wrap(b))
      if (s.isEmpty) Double.NaN else s.getQuantile(p)
    })

  /** Items seen by a serialized sketch (merge sanity checks). */
  val kllN = udf((b: Array[Byte]) =>
    if (b == null || b.isEmpty) 0L
    else KllDoublesSketch.heapify(Memory.wrap(b)).getN)
}
