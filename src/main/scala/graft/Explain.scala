package graft

/** Plan-audit main: prints the formatted physical plan of the named queries
  * (default: a representative set) so scan pruning (PushedFilters /
  * ReadSchema), join strategies (BroadcastHashJoin vs SortMergeJoin) and
  * WholeStageCodegen spans can be inspected. Dev tool — not part of the
  * driver contract. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_agg_tpch_q1", "q_join_inner", "q_join_lookup",
        "q_filter_time_range", "q_window_cumsum", "q_sort_topn",
        "q_ann_bucketed")
    val byName = queries.Registry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
