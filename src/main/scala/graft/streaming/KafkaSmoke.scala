package graft.streaming

/** Live-Kafka smoke main — the runnable path that closes the container's
  * Kafka waiver the moment connector jars are present.
  *
  * The container ships no broker and no spark-sql-kafka jar, so the live
  * consume loop is an environment waiver: [[Streams.kafkaSource]]'s
  * option surface is spec-tested through Spark's real source-resolution
  * machinery (a registered fake provider captures the options map), but
  * nothing can consume. This main is the one-command proof once the
  * environment provides both:
  *
  * {{{
  * # 1. drop the connector jars (spark-sql-kafka-0-10_2.13,
  * #    spark-token-provider-kafka-0-10_2.13, kafka-clients,
  * #    commons-pool2) into lib/  — or point GRAFT_EXTRA_JARS at them
  * # 2. run against a live broker/topic:
  * sbt "runMain graft.streaming.KafkaSmoke broker:9092 events"
  * }}}
  *
  * It consumes from earliest for one bounded micro-batch (rate-capped),
  * counts rows via foreachBatch, and exits 0 on a successful batch —
  * exercising source resolution, option forwarding, the consume loop,
  * and the micro-batch protocol end to end. No code changes needed:
  * this file compiles (and is exercised by the spec) with the connector
  * ABSENT — only `main` requires it at runtime.
  */
object KafkaSmoke {

  /** Exit 0 = consumed a micro-batch; exits nonzero with the resolution
    * error when the connector jar or broker is missing. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: KafkaSmoke <bootstrap-servers> <topic> [maxRows]")
    val (brokers, topic) = (args(0), args(1))
    val maxRows = if (args.length > 2) args(2).toLong else 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = consumeOneBatch(spark, brokers, topic, maxRows)
    System.err.println(s"[kafka-smoke] consumed $n rows from '$topic'")
    spark.stop()
  }

  /** One bounded micro-batch from the live source: earliest offsets,
    * rate-capped at `maxRows`, counted via foreachBatch, and STOPPED
    * after the first batch completes — AvailableNow alone would keep
    * draining the whole topic backlog in maxRows-sized batches, so the
    * stop is what makes the smoke's total work actually bounded.
    * Returns the row count (0 for an empty topic — still a successful
    * consume; the 60 s latch timeout covers the zero-batch case). */
  def consumeOneBatch(spark: org.apache.spark.sql.SparkSession,
                      brokers: String, topic: String,
                      maxRows: Long): Long = {
    val src = Streams.kafkaSource(spark, brokers, topic,
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(maxRows),
      kafkaOptions = Map("failOnDataLoss" -> "false"))
    val n = new java.util.concurrent.atomic.AtomicLong()
    val firstBatch = new java.util.concurrent.CountDownLatch(1)
    val q = src.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // only the first batch counts (the latch gates the main thread);
        // AtomicLong because this closure runs on the stream thread
        if (firstBatch.getCount > 0) {
          n.set(batch.count())
          firstBatch.countDown()
        }
      }
      .start()
    firstBatch.await(60, java.util.concurrent.TimeUnit.SECONDS)
    q.stop()
    q.awaitTermination()
    n.get()
  }
}
