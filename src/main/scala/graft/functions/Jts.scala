package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader}

/** JTS-backed geospatial surface (SURVEY §2.3 ST_* row; reference
  * `pinot-core/.../geospatial/transform/` — ST_GeomFromText, ST_Area,
  * ST_Distance, ST_Contains/Within/Equals, ST_AsText, and the STUnion
  * aggregation `StUnionAggregationFunction`).
  *
  * Geometries travel as WKT strings at the API edge and WKB bytes inside
  * the STUnion aggregation buffer. Functions are Scala UDFs (geometry
  * algorithms aren't expressible as Catalyst primitives). JTS readers are
  * not thread-safe, so each executor thread gets its own via ThreadLocal,
  * and parsed geometries sit behind a small per-thread LRU — a constant
  * literal or repeated geometry column parses once per thread, not once
  * per row. For predicates against a CONSTANT geometry use the prepared
  * variants ([[stContainsPrepared]] / [[stContainsPointPrepared]] /
  * [[stWithinPrepared]]): the constant is parsed + indexed
  * (PreparedGeometry) once per executor, which is the difference between
  * O(rows · polygon-size) and O(rows · log(polygon-size)) at 100 TB.
  * [[Geo]] remains the codegen-friendly planar fast path for point
  * workloads. */
object Jts {
  /** WKT parses performed (all threads) — scale-regression spec hook. */
  private[graft] val parseCount = new AtomicLong(0L)

  private val factoryTl: ThreadLocal[GeometryFactory] =
    ThreadLocal.withInitial(() => new GeometryFactory())
  private val readerTl: ThreadLocal[WKTReader] =
    ThreadLocal.withInitial(() => new WKTReader(new GeometryFactory()))
  private val wkbReaderTl: ThreadLocal[WKBReader] =
    ThreadLocal.withInitial(() => new WKBReader())
  private val wkbWriterTl: ThreadLocal[WKBWriter] =
    ThreadLocal.withInitial(() => new WKBWriter())

  // Per-thread LRU of parsed geometries: repeated WKT (constant literals,
  // low-cardinality geometry columns) parses once per thread. Points and
  // other high-cardinality values just cycle through without hurting.
  private val cacheTl: ThreadLocal[java.util.LinkedHashMap[String, Geometry]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Geometry](128, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Geometry]): Boolean = size() > 64
      })

  private def parse(wkt: String): Geometry = {
    val cache = cacheTl.get()
    val hit = cache.get(wkt)
    if (hit != null) hit
    else {
      parseCount.incrementAndGet()
      val g = readerTl.get().read(wkt)
      cache.put(wkt, g)
      g
    }
  }

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

  /** Serializable holder for a constant geometry: ships the WKT, parses +
    * prepares once per executor (transient lazy), never per row. */
  private final class Prepared(constWkt: String) extends Serializable {
    @transient private lazy val prep: PreparedGeometry = {
      parseCount.incrementAndGet()
      new PreparedGeometryFactory().create(
        new WKTReader(new GeometryFactory()).read(constWkt))
    }
    def contains(wkt: String): Boolean = prep.contains(parse(wkt))
    def containsXY(x: Double, y: Double): Boolean =
      prep.contains(factoryTl.get().createPoint(new Coordinate(x, y)))
    def withinOf(wkt: String): Boolean = parse(wkt).within(prep.getGeometry)
  }

  /** ST_Contains(constant, geomCol) with the constant prepared once. */
  def stContainsPrepared(constWkt: String): UserDefinedFunction = {
    val p = new Prepared(constWkt)
    udf((wkt: String) => p.contains(wkt))
  }

  /** ST_Contains(constant, POINT(x y)) without the per-row WKT round-trip:
    * coordinates go straight into a JTS point. The hot shape of polygon
    * inclusion at scale. */
  def stContainsPointPrepared(constWkt: String): UserDefinedFunction = {
    val p = new Prepared(constWkt)
    udf((x: Double, y: Double) => p.containsXY(x, y))
  }

  /** ST_Within(geomCol, constant) with the constant prepared once. */
  def stWithinPrepared(constWkt: String): UserDefinedFunction = {
    val p = new Prepared(constWkt)
    udf((wkt: String) => p.withinOf(wkt))
  }

  /** STUnion: geometry union as a typed Aggregator (partial/merge/final —
    * mergeable, so it distributes like any other agg). Buffer is WKB. */
  val stUnionAggregator: Aggregator[String, Array[Byte], Array[Byte]] =
    new Aggregator[String, Array[Byte], Array[Byte]] {
      private def toGeom(b: Array[Byte]): Option[Geometry] =
        if (b.isEmpty) None else Some(wkbReaderTl.get().read(b))
      private def toWkb(g: Geometry): Array[Byte] =
        wkbWriterTl.get().write(g)
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
    if (wkb.isEmpty) 0.0 else wkbReaderTl.get().read(wkb).getArea)

  // ---- serialization forms (reference ST_AsBinary / ST_GeomFromWKB /
  // ST_AsText / ST_GeometryType / ST_Polygon — TransformFunctionType
  // ST_GEOG_FROM_WKB..ST_AS_TEXT rows; the reference's geospatial
  // transforms in pinot-core/.../geospatial/transform/) ----

  /** ST_AsBinary(geom): geometry → WKB bytes. */
  val stAsBinary = udf((wkt: String) => wkbWriterTl.get().write(parse(wkt)))

  /** ST_GeomFromWKB(bytes) → the engine's WKT representation, so the
    * result composes with every other ST_* here. */
  val stGeomFromWkb = udf((wkb: Array[Byte]) =>
    wkbReaderTl.get().read(wkb).toText)

  /** ST_AsText(geom): canonical WKT (parse round-trip normalizes spacing
    * the way the reference re-serializes through its geometry object). */
  val stAsText = udf((wkt: String) => parse(wkt).toText)

  /** ST_GeometryType(geom): "Point" | "Polygon" | … (JTS type names —
    * the reference is JTS-backed too, so the vocabulary matches). */
  val stGeometryType = udf((wkt: String) => parse(wkt).getGeometryType)

  /** ST_Polygon(wkt): construct-and-validate a polygon from text
    * (reference ST_Polygon rejects non-polygon input). */
  val stPolygon = udf((wkt: String) => {
    val g = parse(wkt)
    require(g.getGeometryType == "Polygon",
      s"ST_Polygon: not a polygon: ${g.getGeometryType}")
    g.toText
  })
}
