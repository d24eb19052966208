package graft

import graft.functions.Jts
import org.apache.spark.sql.functions._

class JtsSpec extends SparkSpec {

  test("ST_ scalar functions over WKT") {
    val s = spark
    import s.implicits._
    val df = Seq(("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))", "POINT (1 1)",
      "POINT (10 2)")).toDF("poly", "pin", "pout")
    val r = df.select(
      Jts.stArea(col("poly")).as("area"),
      Jts.stContains(col("poly"), col("pin")).as("cin"),
      Jts.stContains(col("poly"), col("pout")).as("cout"),
      Jts.stWithin(col("pin"), col("poly")).as("win"),
      Jts.stDistance(col("pin"), col("pout")).as("dist"),
      Jts.stCentroidX(col("poly")).as("cx")).head()
    assert(r.getAs[Double]("area") == 8.0)
    assert(r.getAs[Boolean]("cin") && !r.getAs[Boolean]("cout"))
    assert(r.getAs[Boolean]("win"))
    assert(math.abs(r.getAs[Double]("dist") -
      math.sqrt(81 + 1)) < 1e-12)
    assert(r.getAs[Double]("cx") == 2.0)
  }

  test("prepared contains: parse count stays O(threads), not O(rows)") {
    val s = spark
    import s.implicits._
    val n = 5000
    val pts = (1 to n).map(i =>
      (i.toLong, (i % 100).toDouble, ((i * 7) % 100).toDouble))
      .toDF("id", "x", "y")
    val tri = "POLYGON ((0 0, 97 13, 41 89, 0 0))"
    val inTri = Jts.stContainsPointPrepared(tri)
    val before = Jts.parseCount.get()
    val k = pts.filter(inTri(col("x"), col("y"))).count()
    val parses = Jts.parseCount.get() - before
    assert(k > 0)
    // one prepare per executor thread (local[4] + retries margin), never
    // the n-per-row re-parse of the naive UDF
    assert(parses <= 32, s"$parses WKT parses for $n rows")

    // prepared paths agree with the naive UDFs
    val naive = pts.filter(Jts.stContains(lit(tri),
      Jts.stPointWkt(col("x"), col("y")))).count()
    assert(naive == k)
    val wktPts = pts.withColumn("w", Jts.stPointWkt(col("x"), col("y")))
    val prepCount = wktPts.filter(Jts.stContainsPrepared(tri)(col("w"))).count()
    val withinCount = wktPts.filter(Jts.stWithinPrepared(tri)(col("w"))).count()
    assert(prepCount == k && withinCount == k)
  }

  test("repeated WKT parses once per thread (LRU cache)") {
    val s = spark
    import s.implicits._
    val poly = "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))"
    val df = (1 to 2000).map(_ => poly).toDF("g")
    val before = Jts.parseCount.get()
    df.select(Jts.stArea(col("g")).as("a")).agg(sum(col("a"))).collect()
    val parses = Jts.parseCount.get() - before
    assert(parses <= 32, s"$parses parses for 2000 identical WKT rows")
  }

  test("WKB serialization round-trip: ST_AsBinary/ST_GeomFromWKB/ST_AsText" +
      "/ST_GeometryType/ST_Polygon") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))", "Polygon", 8.0),
      ("POINT (3 4)", "Point", 0.0),
      ("LINESTRING (0 0, 3 4)", "LineString", 0.0))
      .toDF("g", "expType", "expArea")
    val back = Jts.stGeomFromWkb(Jts.stAsBinary(col("g")))
    val r = df.select(
      Jts.stGeometryType(col("g")).as("t"),
      col("expType"), col("expArea"),
      Jts.stArea(back).as("area"),
      (Jts.stAsText(back) === Jts.stAsText(col("g"))).as("stable"))
      .collect()
    r.foreach { row =>
      assert(row.getAs[String]("t") == row.getAs[String]("expType"))
      assert(row.getAs[Double]("area") == row.getAs[Double]("expArea"))
      assert(row.getAs[Boolean]("stable"))
    }
    // ST_Polygon validates its input
    val ok = df.filter(col("expType") === "Polygon")
      .select(Jts.stPolygon(col("g"))).head().getString(0)
    assert(ok.startsWith("POLYGON"))
    intercept[Exception] {
      Seq("POINT (1 2)").toDF("g").select(Jts.stPolygon(col("g"))).collect()
    }
  }

  test("STUnion merges overlapping geometries (area < sum)") {
    val s = spark
    import s.implicits._
    val df = Seq("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))").toDF("g")
    val unionArea = df.agg(Jts.wkbArea(Jts.stUnionAgg(col("g"))))
      .head().getDouble(0)
    assert(unionArea == 6.0) // 4 + 4 - 2 overlap
  }
}
