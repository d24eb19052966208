package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedAgg equals direct groupBy for any bucket count") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Par.dsum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    Seq(1, 4, 16).foreach { buckets =>
      val salted = Skew.saltedAgg(ev, Seq("event_type"), buckets,
        partials = Seq(count(lit(1)).as("pn"),
          sum(Par.money(col("value"))).as("ps")),
        finals = Seq(sum(col("pn")).as("n"),
          sum(col("ps")).cast("double").as("s")))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(salted == direct, s"buckets=$buckets")
    }
  }

  test("saltedJoin equals plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val os = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val direct = li.join(os, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, os, "l_orderkey", 8).count()
    assert(salted == direct)
  }
}
