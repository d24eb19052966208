package graft

import graft.operators.StarTree
import graft.rules.StarTreeCatalog
import org.apache.spark.sql.functions._

/** Star-tree routing rule: a fitting aggregate over the fact scan is
  * silently answered from the registered materialized summary. */
class StarTreeRouteSpec extends SparkSpec {

  test("fitting aggregate routes to the summary; results identical") {
    val factPath = s"$sfDir/lineitem.parquet"
    val facts = spark.read.parquet(factPath)
    val direct = facts.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
        max(col("l_quantity")).as("mx"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap

    val sumDir = java.nio.file.Files
      .createTempDirectory("graft-startree").toString
    StarTree.build(facts, Seq("l_returnflag", "l_linestatus", "l_suppkey"),
        Seq(StarTree.Metric("l_quantity", Seq("sum", "min", "max"))))
      .write.mode("overwrite").parquet(s"$sumDir/sum")
    val summary = spark.read.parquet(s"$sumDir/sum")

    try {
      StarTreeCatalog.register(
        Set(s"file:$factPath"), Set("l_returnflag", "l_linestatus",
          "l_suppkey"), summary)
      val routed = facts.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
          max(col("l_quantity")).as("mx"))
      // the optimized plan must scan the summary, not the facts
      val planFiles = routed.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
      assert(planFiles.exists(_.contains("graft-startree")),
        s"expected summary scan, got: $planFiles")
      assert(!planFiles.exists(_.contains("lineitem")),
        s"fact scan not eliminated: $planFiles")
      val viaRule = routed.collect().map(r =>
        (r.getString(0), r.getString(1)) ->
          ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(viaRule == direct)

      // non-fitting shapes must NOT route: avg is not pre-computed
      val avgPlan = facts.groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity"))).queryExecution.optimizedPlan
      val avgFiles = avgPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
      assert(avgFiles.exists(_.contains("lineitem")))
    } finally StarTreeCatalog.clear()
  }
}
