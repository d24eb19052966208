package graft

import graft.operators.StarTree
import org.apache.spark.sql.functions._

class StarTreeSpec extends SparkSpec {

  private lazy val facts = Tables.lineitem(spark, sfDir)
  private lazy val summary = StarTree.build(facts,
    Seq("l_returnflag", "l_linestatus", "l_suppkey"),
    Seq(StarTree.Metric("l_quantity", Seq("sum", "min", "max"))))

  test("summary is much smaller than facts") {
    assert(summary.count() < facts.count() / 2)
  }

  test("subset-dim query over summary matches direct aggregation") {
    val viaTree = StarTree.query(summary, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("sum_l_quantity"), col("n_rows"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val direct = facts.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(viaTree.keySet == direct.keySet)
    viaTree.keys.foreach { k =>
      assert(math.abs(viaTree(k)._1 - direct(k)._1) < 1e-6)
      assert(viaTree(k)._2 == direct(k)._2)
    }
  }

  test("filtered star query respects dim filters") {
    val viaTree = StarTree.query(summary, Seq(),
      Some(col("l_linestatus") === "F"))
      .head().getAs[Long]("n_rows")
    val direct = facts.filter(col("l_linestatus") === "F").count()
    assert(viaTree == direct)
  }
}
