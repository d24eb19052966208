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
