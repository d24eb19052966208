package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The candidate join is query×corpus; with few query points Spark
  *    broadcasts the queries, so the corpus is scanned once, map-side, no
  *    shuffle of the corpus. Ranking is a bounded per-query top-k (window
  *    row_number over a partition keyed by query id — k·|Q| rows survive).
  *  - [[bucketedTopK]]: sign-bucket LSH — queries only compare against
  *    co-bucketed candidates (equi-join on the bucket key). At 100 TB this
  *    is the difference between a full-corpus scan per query batch and a
  *    keyed shuffle that touches ~|corpus|/2^nBits rows per bucket. Recall
  *    is traded via nBits; multi-probe = union over neighboring buckets.
  */
object Similarity {
  /** Exact top-k by cosine for each query row. Both inputs need (idCol,
    * vecCol). Deterministic: ties break by candidate id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms ride each side precomputed — per pair: one dot product
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.norm2(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      Vectors.norm2(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** LSH-bucketed ANN: only candidates sharing the query's sign-bucket are
    * scored. Same output shape as [[bruteForceTopK]] (rk may stop short of k
    * when a bucket is sparse — the recall trade). */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, nBits: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.signBucket(col(vecCol), nBits).as("bucket"),
      Vectors.norm2(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      Vectors.signBucket(col(vecCol), nBits).as("bucket"),
      Vectors.norm2(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
