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
    * with fewer than two tokens have n_bigrams = 0 and null scores.
    *
    * Shape (optimization round 19 — guide §2.3/§2.4): the model lives on
    * the VOCABULARY-sized tables, never on the occurrence stream.
    *
    *   - `c1` derives from `c12` (c1(w1) = Σ_w2 c12(w1,w2) — every
    *     left-context occurrence is exactly one bigram row), dropping a
    *     full corpus re-tokenization + a second occurrence-stream
    *     shuffle that the old shape paid.
    *   - V (the distinct-token count) derives from the pair table's
    *     endpoint vocabulary plus the single-token documents: a doc with
    *     ≥2 tokens has every token in some bigram's w1 or w2, so only
    *     1-token docs contribute tokens outside c12. This replaces a
    *     full unigram explode + distinct shuffle with a distinct over
    *     the (already materialized) vocabulary-sized pair table and a
    *     map-only scan for the rare singletons (spec-pinned vs the
    *     direct count in LmQualitySpec).
    *   - Per-BIGRAM ln p is computed ONCE per distinct pair on the
    *     count table (`pairU`), then one equi-join attaches it to the
    *     stream. The old shape joined the stream against c12 AND c1
    *     separately — two full occurrence-stream shuffle+sorts — and
    *     evaluated log/round per OCCURRENCE instead of per distinct
    *     pair. Identical integers by construction: u depends only on
    *     (c12, c1, V, k).
    *
    * Occurrence-stream passes: 2 tokenizations (count pass, score pass)
    * + the singleton scan — down from 4; stream shuffles: 2 (pair join,
    * per-doc re-agg) — down from 3. */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
              k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k=$k must be > 0")
    val toks = TA.tokens(col(textCol))
    val n = size(toks)
    val len1 = greatest(n - 1, lit(0))
    val pairs = zip_with(slice(toks, lit(1), len1), slice(toks, lit(2), len1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    // ONE corpus tokenization: the per-doc stream carries bigram pairs,
    // plus a (token, NULL) sentinel for 1-token docs so the vocabulary
    // can be recovered without a separate unigram pass (a doc with ≥2
    // tokens has every token as some bigram endpoint; only 1-token docs
    // contribute vocabulary outside the pair table).
    val stream = when(n === 1,
        array(struct(element_at(toks, 1).as("w1"),
          lit(null).cast("string").as("w2"))))
      .otherwise(pairs)
    // the exploded per-doc stream, checkpointed ONCE (no shuffle — the
    // blocks are partition-local) so model AND scoring read it instead
    // of re-scanning and re-tokenizing the corpus: the old shape paid 4
    // tokenization passes (c12, c1, V, scoring join). Blocks are swept
    // between queries. (A per-(doc,pair) pre-aggregation was measured
    // SLOWER here: it adds a full-stream shuffle the old plan never
    // had, since the count tables broadcast into the scoring join.)
    // FOOTPRINT (ADVICE r19): this materializes one (id, w1, w2) row per
    // token OCCURRENCE — O(total corpus tokens) in the block manager per
    // scoring call, roughly duplicating the tokenized corpus for the
    // call's duration. MEMORY_AND_DISK spill bounds it and the sweep
    // frees it, but a deployment scoring a 100 TB corpus in one call
    // should shard the input (score per shard, union the per-doc rows)
    // rather than rely on this checkpoint holding the whole stream.
    val dc = Checkpoints.eager(
      df.select(col(idCol), explode(stream).as("p"))
        .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2")))
    val bgc = dc.filter(col("w2").isNotNull)
    val c12 = bgc.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // c1 derives from c12 (c1(w1) = Σ_w2 c12 — every left-context
    // occurrence is exactly one bigram row): vocabulary-sized agg, no
    // stream re-pass.
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    // V as a ONE-ROW frame cross-joined into the model instead of a
    // separate head() action: lmScore is fully lazy — one checkpoint
    // job + one job per consumer action.
    val vAgg = c12.select(col("w1").as("t"))
      .unionAll(c12.select(col("w2").as("t")))
      .unionAll(dc.filter(col("w2").isNull).select(col("w1").as("t")))
      .agg(count_distinct(col("t")).cast("double").as("__v"))
    val p = (col("c12").cast("double") + lit(k)) /
      (col("c1").cast("double") + lit(k) * col("__v"))
    // per-BIGRAM ln p computed once per distinct pair on the count
    // table, then attached to the per-doc pair counts by one
    // vocabulary-keyed equi-join; per-doc sums weight by the proxy's
    // counts — integer-exact, same u per occurrence as the old
    // per-occurrence evaluation.
    val pairU = c12.join(c1, Seq("w1")).crossJoin(broadcast(vAgg))
      .select(col("w1"), col("w2"),
        round(round(log(p), 6) * 1e6).cast("long").as("u"))
    val agg = bgc.join(pairU, Seq("w1", "w2"))
      .groupBy(col(idCol))
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
