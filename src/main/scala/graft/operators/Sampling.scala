package graft.operators

import graft.functions.Scalars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting for training pipelines.
  *
  * Beyond the reference (which has no sampling surface): a 100 TB corpus
  * needs train/val/test assignment that is REPRODUCIBLE — independent of
  * partitioning, executor count, and run order — which rules out RNG-based
  * `randomSplit`. The standard recipe is a salted content hash of the
  * document id: every engine that agrees on md5 agrees on the split. */
object Sampling {

  /** Bucket in [0, 10000) from (salt, id) — the split assignment's
    * resolution (0.01%). */
  def bucket(idCol: org.apache.spark.sql.Column, salt: String)
  : org.apache.spark.sql.Column =
    Scalars.hash60(concat(lit(salt), lit(":"), idCol.cast("string"))) % 10000L

  /** Assign each row a named split by hash bucket: `splits` are ordered
    * (name, fraction) with fractions summing to ≤ 1; rows past the last
    * cumulative boundary get null (unassigned holdout). One projection,
    * no shuffle, no RNG state — the same id lands in the same split on
    * any cluster, any run. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)],
                salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    val b = bucket(col(idCol), salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    // CASE WHEN b < c1 THEN s1 WHEN b < c2 THEN s2 … ELSE null
    val cases = splits.zip(bounds).reverse.foldLeft(
      lit(null).cast("string")) { case (els, ((name, _), cum)) =>
        when(b < lit(math.round(cum * 10000)), lit(name)).otherwise(els)
    }
    df.withColumn("split", cases)
  }
}
