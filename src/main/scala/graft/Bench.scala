package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results are fully materialized through the `noop`
  * sink — `count()` would let Catalyst prune projections and undercount the
  * real work. One untimed warm-up query absorbs JIT/classloading so the
  * numbers reflect steady-state execution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
    : Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warm-up (untimed): JIT, codegen, parquet footer caches
    runOnce(SparkEntry.queries("q_agg_tpch_q1"))

    // min of N iterations — steady-state timing, not first-run JIT noise;
    // queries already past the re-run budget keep their first time (caps
    // the wall-clock cost of repetition to the cheap majority)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val rerunBudgetSec = 10.0
    // dev-only subset filter (comma-separated names); driver sets nothing
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = queries.Registry.all
      .filter(q => only.forall(_.contains(q.name)))
    val results = selected.map { q =>
      // a failing query must surface as an error, not masquerade as a
      // fast wall-time silently inflating the bench
      var err: Option[String] = None
      def timed(): Double = {
        val t0 = System.nanoTime()
        try runOnce(q.run) catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("").take(200)
            err = Some(s"${e.getClass.getSimpleName}: $msg")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val first = timed()
      val rest = if (err.isEmpty && first <= rerunBudgetSec)
        (2 to iters).map(_ => timed()) else Nil
      (q.name, (first +: rest).min, err)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      jstr(k) + ":" + jstr(e) }
    val errJson =
      if (errs.isEmpty) "" else s""","errors":${errs.mkString("{", ",", "}")}"""
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
