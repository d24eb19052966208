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

  test("Bucketing operator: build-once tables, coLocatedJoin has no " +
    "exchange, reopen reuses the files") {
    import graft.operators.Bucketing
    Bucketing.reset(spark)
    try {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      val os = Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      val bli = Bucketing.bucketed(spark, li, "li", sfDir, "l_orderkey", 8)
      val bos = Bucketing.bucketed(spark, os, "os", sfDir, "l_orderkey", 8)
      val joined = Bucketing.coLocatedJoin(bli, bos, "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(joined.count() ==
        li.join(os, Seq("l_orderkey")).count())
      // build-once: a second open resolves to the SAME table files (no
      // rewrite — the input location set is identical)
      val again = Bucketing.bucketed(spark, li, "li", sfDir, "l_orderkey", 8)
      assert(again.inputFiles.sorted.sameElements(bli.inputFiles.sorted))
      // a different key or bucket count gets its own physical table
      val other = Bucketing.bucketed(spark, li, "li", sfDir, "l_orderkey", 4)
      assert(!other.inputFiles.sameElements(bli.inputFiles))
    } finally Bucketing.reset(spark)
  }
}
