package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** Serialized IdSet sketch (reference `IdSetAggregationFunction` /
  * `InIdSetTransformFunction` / `IN_SUBQUERY`: the broker materializes a
  * subquery's ids into a serialized bitmap set, ships it as a literal, and
  * servers filter with membership tests).
  *
  * Exact, mergeable, order-independent: the aggregation state is a sorted
  * distinct long array, serialized delta-varint (small for clustered id
  * domains — the RoaringBitmap role without the library). Set algebra
  * (union / intersect / membership / cardinality) operates directly on the
  * serialized form, so sketches can be exchanged between jobs like the
  * reference ships IdSets between broker and servers. */
object IdSetSketch {
  // ---- serialization: sorted distinct deltas, varint-encoded ----
  private[graft] def serialize(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var prev = 0L
    var first = true
    sorted.foreach { v =>
      var d = if (first) v else v - prev
      first = false; prev = v
      // zigzag for the (possibly negative) first value
      var z = (d << 1) ^ (d >> 63)
      while ((z & ~0x7FL) != 0) {
        out.write(((z & 0x7F) | 0x80).toInt); z >>>= 7
      }
      out.write(z.toInt)
    }
    out.toByteArray
  }

  private[graft] def deserialize(b: Array[Byte]): Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    var prev = 0L
    var first = true
    while (i < b.length) {
      var z = 0L; var shift = 0
      var more = true
      while (more) {
        val x = b(i) & 0xFF; i += 1
        z |= (x & 0x7FL) << shift; shift += 7
        more = (x & 0x80) != 0
      }
      val d = (z >>> 1) ^ -(z & 1)
      val v = if (first) d else prev + d
      first = false; prev = v
      buf += v
    }
    buf.toArray
  }

  /** idSetAgg(longCol) → serialized sketch bytes. */
  val aggregator: Aggregator[java.lang.Long, Set[Long], Array[Byte]] =
    new Aggregator[java.lang.Long, Set[Long], Array[Byte]] {
      def zero: Set[Long] = Set.empty
      def reduce(s: Set[Long], v: java.lang.Long): Set[Long] =
        if (v == null) s else s + v.longValue()
      def merge(a: Set[Long], b: Set[Long]): Set[Long] = a ++ b
      def finish(s: Set[Long]): Array[Byte] = serialize(s.toArray.sorted)
      def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  def idSetAgg(c: Column): Column = udaf(aggregator).apply(c)

  // ---- set algebra over the serialized form ----
  val cardinality = udf((b: Array[Byte]) => deserialize(b).length)
  val union = udf((a: Array[Byte], b: Array[Byte]) =>
    serialize((deserialize(a).toSet ++ deserialize(b).toSet).toArray.sorted))
  val intersect = udf((a: Array[Byte], b: Array[Byte]) =>
    serialize((deserialize(a).toSet & deserialize(b).toSet).toArray.sorted))
  val difference = udf((a: Array[Byte], b: Array[Byte]) =>
    serialize((deserialize(a).toSet -- deserialize(b).toSet).toArray.sorted))
  /** inIdSet(id, sketch) — the membership filter fed by a materialized
    * sketch (broadcast the sketch bytes; the probe is a binary search). */
  val inIdSet = udf((v: Long, b: Array[Byte]) =>
    java.util.Arrays.binarySearch(deserialize(b), v) >= 0)
}
