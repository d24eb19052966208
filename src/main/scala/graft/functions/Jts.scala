package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Geometry, GeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader}

/** JTS-backed geospatial surface (SURVEY §2.3 ST_* row; reference
  * `pinot-core/.../geospatial/transform/` — ST_GeomFromText, ST_Area,
  * ST_Distance, ST_Contains/Within/Equals, ST_AsText, and the STUnion
  * aggregation `StUnionAggregationFunction`).
  *
  * Geometries travel as WKT strings at the API edge and WKB bytes inside
  * the STUnion aggregation buffer. Functions are Scala UDFs (geometry
  * algorithms aren't expressible as Catalyst primitives); JTS
  * reader/writer instances are per-call — they are not thread-safe and
  * executor tasks run concurrently. [[Geo]] remains the codegen-friendly
  * planar fast path for point workloads. */
object Jts {
  private def parse(wkt: String): Geometry =
    new WKTReader(new GeometryFactory()).read(wkt)

  val stArea = udf((wkt: String) => parse(wkt).getArea)
  val stLength = udf((wkt: String) => parse(wkt).getLength)
  val stDistance = udf((a: String, b: String) => parse(a).distance(parse(b)))
  val stContains = udf((a: String, b: String) => parse(a).contains(parse(b)))
  val stWithin = udf((a: String, b: String) => parse(a).within(parse(b)))
  val stEquals = udf((a: String, b: String) => parse(a).equals(parse(b)))
  val stCentroidX = udf((wkt: String) => parse(wkt).getCentroid.getX)
  val stCentroidY = udf((wkt: String) => parse(wkt).getCentroid.getY)
  val stPointWkt = udf((x: Double, y: Double) => s"POINT ($x $y)")
  val stBoxWkt = udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
    s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")

  /** STUnion: geometry union as a typed Aggregator (partial/merge/final —
    * mergeable, so it distributes like any other agg). Buffer is WKB. */
  val stUnionAggregator: Aggregator[String, Array[Byte], Array[Byte]] =
    new Aggregator[String, Array[Byte], Array[Byte]] {
      private def toGeom(b: Array[Byte]): Option[Geometry] =
        if (b.isEmpty) None else Some(new WKBReader().read(b))
      private def toWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)
      def zero: Array[Byte] = Array.empty
      def reduce(buf: Array[Byte], wkt: String): Array[Byte] = {
        val g = parse(wkt)
        toWkb(toGeom(buf).map(_.union(g)).getOrElse(g))
      }
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        (toGeom(a), toGeom(b)) match {
          case (Some(x), Some(y)) => toWkb(x.union(y))
          case (Some(x), None) => toWkb(x)
          case (None, Some(y)) => toWkb(y)
          case _ => Array.empty
        }
      def finish(buf: Array[Byte]): Array[Byte] = buf
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** stUnionAgg(wktCol) → WKB of the union. */
  def stUnionAgg(c: Column): Column =
    org.apache.spark.sql.functions.udaf(stUnionAggregator).apply(c)

  /** Area of a WKB geometry (for inspecting union results). */
  val wkbArea = udf((wkb: Array[Byte]) =>
    if (wkb.isEmpty) 0.0 else new WKBReader().read(wkb).getArea)
}
