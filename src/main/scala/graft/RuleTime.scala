package graft

/** Dev diagnostic: per-gate planning-phase and per-rule timing split —
  * the bisect tool for "is this gate's creep execution or the optimizer
  * pipeline?" (round-15 verdict asked for exactly this adjudication on
  * the routed-json family; StarTreeRoute's empty-catalog overhead was
  * found by hand the same way in r15).
  *
  * Usage: runMain graft.RuleTime <sfDir> <q1,q2,...> [iters]
  * Prints, per gate per iteration: execution wall time, the Catalyst
  * phase durations (analysis/optimization/planning) from Spark's
  * QueryPlanningTracker, and the top rules by effective run time. */
object RuleTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSet
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = queries.Registry.all.filter(q => names.contains(q.name))
    sel.foreach { q =>
      q.setup.foreach(_(spark, sfDir))
      (1 to iters).foreach { i =>
        val s0 = Bench.stealTicks()
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val tPlanBuilt = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        val steal = Bench.stealMsSince(s0)
        val tr = df.queryExecution.tracker
        val phases = tr.phases.map { case (k, v) =>
          s"$k=${v.durationMs}ms"
        }.toSeq.sorted.mkString(" ")
        val topRules = tr.rules.toSeq
          .sortBy(-_._2.totalTimeNs)
          .take(8)
          .map { case (r, s) =>
            f"${r.split('.').last}:${s.totalTimeNs / 1e6}%.1fms" }
          .mkString(" ")
        println(f"[ruletime] ${q.name} iter$i " +
          f"total=${(t1 - t0) / 1e9}%.3fs " +
          f"build=${(tPlanBuilt - t0) / 1e9}%.3fs " +
          f"steal=${steal}ms | $phases | top: $topRules")
        graft.operators.Checkpoints.sweep()
      }
    }
    spark.stop()
  }
}
