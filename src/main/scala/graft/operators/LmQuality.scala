package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring (beyond the reference): the
  * CCNet-style corpus filter — train an n-gram LM on the corpus, score
  * each document by its cross-entropy under the model, drop the tail.
  * Public method: Wenzek et al. 2020 ("CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data") filter on LM perplexity;
  * here the LM is a self-trained add-k bigram model, so the whole
  * pipeline is closed over the corpus and replayable cross-engine.
  *
  * Model: p(w2|w1) = (c(w1,w2) + k) / (c1(w1) + k·V) where c1 counts w1
  * as a bigram LEFT context and V is the corpus vocabulary size.
  * Per-document cross-entropy = −mean of ln p over the doc's bigrams.
  *
  * Exactness: each bigram's ln p rounds to 6dp and rides as a 1e6-scaled
  * long (`u`), so the per-document SUM is integer-exact and independent
  * of aggregation order — the DuckDB oracle replays it bit-for-bit. The
  * reported `xent` does ONE double division at the end.
  *
  * Scale shape: counting is two map-side-combined keyed aggregations
  * over the exploded bigram stream; scoring is two equi-joins of that
  * stream against the count tables (at real scale the count tables prune
  * to min-count survivors and broadcast — the join keys are the same
  * either way) and one keyed re-aggregation per document. The driver
  * holds one scalar (V). */
object LmQuality {

  /** Score every document: (idCol, n_bigrams, sum_u, xent). Documents
    * with fewer than two tokens have n_bigrams = 0 and null scores. */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
              k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k=$k must be > 0")
    val toks = TA.tokens(col(textCol))
    val len1 = greatest(size(toks) - 1, lit(0))
    val bg = df.select(col(idCol), explode(zip_with(
        slice(toks, lit(1), len1), slice(toks, lit(2), len1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = df.select(explode(toks).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)
    val p = (col("c12").cast("double") + lit(k)) /
      (col("c1").cast("double") + lit(k) * lit(v.toDouble))
    val u = bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col(idCol),
        round(round(log(p), 6) * 1e6).cast("long").as("u"))
    val agg = u.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("u")).as("sum_u"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("sum_u"),
        round(-(col("sum_u").cast("double") /
          (col("n_bigrams").cast("double") * 1e6)), 6).as("xent"))
  }

  /** CCNet's corpus split: rank documents by LM cross-entropy (best
    * first) and cut the total order into `nBuckets` contiguous ranks —
    * head/middle/tail at the default 3, the paper's quality tiers.
    * Unscorable documents (no bigrams → null xent) rank last.
    *
    * Deterministic total order (null-flag, xent, id); the bucket of a
    * row depends only on its global rank, assigned by the distributed
    * dense-rank (range sort + zipWithIndex's two passes — never a
    * single-partition window), with bucket = rank·k div n so sizes
    * differ by at most one. Output: lmScore columns + `ppl_bucket`. */
  def perplexityBuckets(docs: DataFrame, textCol: String, idCol: String,
                        k: Double = 1.0, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets must be >= 2")
    val spark = docs.sparkSession
    // snapshot once: count, the range-partitioner's sampling pass, and
    // zipWithIndex would each re-train-and-score the LM otherwise.
    // Swept between queries.
    val scored = Checkpoints.eager(lmScore(docs, textCol, idCol, k)
      .withColumn("__nl", when(col("xent").isNull, 1).otherwise(0))
      .withColumn("__x", coalesce(col("xent"), lit(0.0))))
    val n = scored.count()
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = scored
      .repartitionByRange(parts, col("__nl"), col("__x"), col(idCol))
      .sortWithinPartitions(col("__nl"), col("__x"), col(idCol))
    val names = if (nBuckets == 3) Array("head", "middle", "tail")
    else Array.tabulate(nBuckets)(i => s"b$i")
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "ppl_bucket", org.apache.spark.sql.types.StringType,
        nullable = false))
    val kk = nBuckets.toLong
    val withB = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(
        r.toSeq :+ names((i * kk / n).toInt))
    }
    spark.createDataFrame(withB, schema).drop("__nl", "__x")
  }
}
