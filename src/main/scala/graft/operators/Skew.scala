package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4.3). AQE's skew-join split handles most cases
  * at runtime (enabled in GraftSession); these are the explicit salting
  * tools for when a key's mass exceeds what one task should hold — e.g. a
  * power-law user_id at 100 TB.
  */
object Skew {
  /** Two-phase salted aggregation: partial-aggregate on (keys, salt) —
    * spreading a hot key over `buckets` tasks — then final-aggregate on
    * keys. The caller supplies mergeable partials (sum/count/min/max) and
    * the finals that combine them. Correct for any associative aggregate;
    * identical result to a direct groupBy, independent of `buckets`. */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a random salt in [0, buckets); the right side is
    * replicated `buckets`× with every salt value, and the join key becomes
    * (key, salt) — the hot key's rows land in `buckets` different tasks.
    * Use when the right side is too big to broadcast but small enough to
    * replicate; otherwise prefer AQE skew-join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
