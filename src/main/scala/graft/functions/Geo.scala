package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial surface (SURVEY §2.3 — reference `ST_*` transform functions,
  * `pinot-core/.../geospatial/transform/`, H3 index filters).
  *
  * Planar geometry only (JTS/H3 libs are not in this container): points are
  * (x, y) structs, distance is Euclidean, containment is bbox — the same
  * Column contract a JTS-backed implementation would fill in. geoToH3 is
  * approximated by a fixed-width grid-cell index (the pruning role H3 cells
  * play in `H3IndexFilterOperator`). */
object Geo {
  def stPoint(x: Column, y: Column): Column =
    struct(x.as("x"), y.as("y"))
  def stX(p: Column): Column = p.getField("x")
  def stY(p: Column): Column = p.getField("y")

  /** Euclidean distance (geometry ST_Distance). */
  def stDistance(a: Column, b: Column): Column = {
    val dx = stX(a) - stX(b); val dy = stY(a) - stY(b)
    sqrt(dx * dx + dy * dy)
  }

  /** Point-in-bbox (the decidable core of ST_Contains/ST_Within). */
  def stWithinBBox(p: Column, xmin: Double, ymin: Double,
                   xmax: Double, ymax: Double): Column =
    stX(p).between(xmin, xmax) && stY(p).between(ymin, ymax)

  /** geoToH3 analog: index of a `res`-degree grid cell — equality-joinable
    * and prunable like an H3 cell id. */
  def gridCell(p: Column, res: Double): Column =
    floor(stX(p) / res).cast("long") * 100000L + floor(stY(p) / res).cast("long")
}
