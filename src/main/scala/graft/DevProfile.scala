package graft

import org.apache.spark.sql.functions._

/** Step-level profiling of the index-lifecycle and streaming-sink
  * protocols — prints per-step wall times + job counts so optimization
  * targets the step that actually costs. Dev tool like [[Explain]]; not
  * part of the driver contract. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def step[T](name: String)(f: => T): T = {
      org.apache.spark.graft.ListenerBusAccess
        .waitUntilEmpty(spark.sparkContext, 5000)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val ms = (System.nanoTime() - t0) / 1e6
      org.apache.spark.graft.ListenerBusAccess
        .waitUntilEmpty(spark.sparkContext, 5000)
      System.err.println(f"[prof] $name%-34s ${ms}%9.1f ms  " +
        s"jobs=${jobs.get() - j0}")
      r
    }

    val which = if (args.isEmpty) Seq("text", "json") else args.toSeq

    if (which.contains("text")) {
      import graft.sources.TextIndexLifecycle
      val root = "target/graft_prof_textidx"
      TextIndexLifecycle.deleteRoot(root)
      val docs = Tables.documents(spark, sfDir)
      step("text warmup count")(docs.count())
      step("text append even")(TextIndexLifecycle.append(spark, root,
        "text", "doc_id", docs.filter(col("doc_id") % 2 === 0), "b_even"))
      step("text append odd")(TextIndexLifecycle.append(spark, root,
        "text", "doc_id", docs.filter(col("doc_id") % 2 === 1), "b_odd"))
      step("text append odd REPLAY")(TextIndexLifecycle.append(spark, root,
        "text", "doc_id", docs.filter(col("doc_id") % 2 === 1), "b_odd"))
      step("text delete")(TextIndexLifecycle.delete(spark, root, "text",
        docs.filter(col("doc_id") % 10 === 0).select(col("doc_id")),
        "doc_id", "del_1"))
      step("text compact")(
        TextIndexLifecycle.compact(spark, root, "text", "doc_id"))
      step("text compact REPLAY")(
        TextIndexLifecycle.compact(spark, root, "text", "doc_id"))
      step("text probe")(TextIndexLifecycle.load(spark, root, "text",
          "doc_id")
        .filter(col("tp") === graft.operators.TextMatch.tpOf("vector"))
        .filter(col("token") === "vector")
        .select(col("doc_id"), col("pos"))
        .orderBy(col("doc_id"), col("pos"))
        .write.format("noop").mode("overwrite").save())
      TextIndexLifecycle.deleteRoot(root)
    }

    if (which.contains("stream")) {
      // one incrementalMinHash micro-batch, step-decomposed by job
      import graft.operators.Dedup
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val b1 = docs.filter(col("doc_id") % 4 === 0)
      val b2 = docs.filter(col("doc_id") % 4 === 1)
      Dedup.dropIndex(spark, "prof_near")
      step(s"minhash batch1 (n=${n / 4})")(
        Dedup.incrementalMinHash(spark, b1, "text", "doc_id", "prof_near",
          k = 3, bands = 4, rowsPerBand = 2, minAgree = 0.75,
          batchTag = Some("p_0")).count())
      step("minhash batch2")(
        Dedup.incrementalMinHash(spark, b2, "text", "doc_id", "prof_near",
          k = 3, bands = 4, rowsPerBand = 2, minAgree = 0.75,
          batchTag = Some("p_1")).count())
      graft.operators.Checkpoints.sweep()
      Dedup.dropIndex(spark, "prof_near")
      // one exact micro-batch
      Dedup.dropIndex(spark, "prof_exact")
      step("exact batch1")(
        Dedup.incrementalExact(spark, b1, "text", "doc_id", "prof_exact",
          batchTag = Some("p_0")).count())
      step("exact batch2")(
        Dedup.incrementalExact(spark, b2, "text", "doc_id", "prof_exact",
          batchTag = Some("p_1")).count())
      graft.operators.Checkpoints.sweep()
      Dedup.dropIndex(spark, "prof_exact")
      // one paragraphDedup micro-batch
      val state = new graft.streaming.Streams.BloomDedupState(
        "para", 1 << 20, 3)
      step("paradedup batch1")(
        graft.streaming.Streams.paragraphDedupBatch(state, b1, 0L,
          "text", "doc_id", "\n").count())
      step("paradedup batch2")(
        graft.streaming.Streams.paragraphDedupBatch(state, b2, 1L,
          "text", "doc_id", "\n").count())
    }

    spark.stop()
  }
}
