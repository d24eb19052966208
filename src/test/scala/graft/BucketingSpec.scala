package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY §4.3 "partitioned shuffle" /
  * colocated-shuffle elision — `GreedyShuffleRewriteVisitor`): both sides
  * bucketed on the join key with equal bucket counts join WITHOUT a
  * shuffle exchange. At 100 TB this converts the fact-fact join from a
  * full two-sided shuffle into local per-bucket merges. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without shuffle exchange") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val os = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    os.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("os_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("os_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (the final group-by
      // is on the same key, so it also rides the bucketing)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      // sanity: result matches the unbucketed join
      val direct = li.join(os, col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() > 0)
      assert(spark.table("li_bucketed").join(spark.table("os_bucketed"),
        col("l_orderkey") === col("o_orderkey")).count() == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS os_bucketed")
    }
  }
}
