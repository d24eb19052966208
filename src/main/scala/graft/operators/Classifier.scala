package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised text classification for corpus curation (beyond the
  * reference): the fastText-tier "quality classifier" of LLM data
  * pipelines — train a linear bag-of-words model on labeled documents,
  * score the rest of the corpus, keep/route by predicted class. Public
  * method: multinomial Naive Bayes with add-k smoothing (McCallum &
  * Nigam 1998), the classic linear text classifier; GPT-3's WebText
  * quality filter and CCNet's target-vs-background scoring are the same
  * shape (a per-class log-linear score summed over token features).
  *
  * Model: score(c, doc) = ln P(c) + Σ_tok ln p(tok|c), with
  * p(tok|c) = (count(tok, c) + k) / (total_c + k·V), V = train vocab
  * size. Prediction = argmax_c, ties broken by label ascending.
  *
  * Exactness: every per-token ln rounds to 6dp and rides as a
  * 1e6-scaled long, so per-document per-class sums are integer-exact
  * and aggregation-order-free — the DuckDB oracle replays predictions
  * bit-for-bit (same pattern as [[LmQuality]]).
  *
  * Scale shape: training is ONE map-side-combined keyed aggregation
  * over the exploded (label, token) stream plus two scalar-sized
  * side aggregates (label totals, vocab size). Scoring explodes test
  * tokens once, expands by the label set (a handful of rows — the
  * label frame is crossJoin-safe), equi-joins the count table on
  * (token, label) — AQE broadcasts it when it fits, and at 100 TB the
  * count table prunes to min-count survivors first — and re-aggregates
  * per (doc, label). No shuffle carries document text; the widest
  * stream is tokens × nLabels. The driver holds two scalars (V, N). */
object Classifier {

  /** Score and classify `test` against a model trained on `train`.
    * Output: (idCol, pred, score_u, n_tokens) — one row per test doc,
    * `score_u` the winning class's 1e6-scaled log-posterior numerator,
    * `n_tokens` the doc's token count (0-token docs classify by prior
    * alone). */
  def nbClassify(train: DataFrame, test: DataFrame, textCol: String,
                 labelCol: String, idCol: String,
                 k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k=$k must be > 0")
    val trTok = train.select(col(labelCol).as("__lbl"),
      explode(TA.tokens(col(textCol))).as("__t"))
    // one pass each: (label, token) counts, per-label token totals,
    // per-label doc counts, vocab size, corpus doc count
    val ct = trTok.groupBy("__lbl", "__t").agg(count(lit(1)).as("__c"))
    val lt = trTok.groupBy("__lbl").agg(count(lit(1)).as("__tot"))
    val nd = train.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__ndc"))
    val nDocs = train.count()
    val v = trTok.agg(count_distinct(col("__t"))).head().getLong(0)

    def u6(x: org.apache.spark.sql.Column) =
      round(round(log(x), 6) * 1e6).cast("long")

    // per-label prior + smoothing denominator — one tiny frame, joined
    // to everything else by label (broadcast by size)
    val labels = lt.join(nd, Seq("__lbl"))
      .select(col("__lbl"), col("__tot"),
        u6(col("__ndc").cast("double") / lit(nDocs.toDouble)).as("__pu"))

    val teTok = test.select(col(idCol), posexplode(TA.tokens(col(textCol))))
      .select(col(idCol), col("col").as("__t"))
    // token stream × label set, count looked up per (token, label);
    // unseen (token, label) pairs take the smoothed-zero likelihood
    val scored = teTok.crossJoin(labels)
      .join(ct, Seq("__lbl", "__t"), "left")
      .select(col(idCol), col("__lbl"), col("__pu"),
        u6((coalesce(col("__c"), lit(0L)).cast("double") + lit(k)) /
          (col("__tot").cast("double") + lit(k) * lit(v.toDouble)))
          .as("__u"))
    val perClass = scored.groupBy(col(idCol), col("__lbl"), col("__pu"))
      .agg(sum(col("__u")).as("__su"), count(lit(1)).as("__n"))
    // every test doc gets every class row even with zero tokens:
    // re-anchor on test × labels and coalesce the token sums to 0
    val anchored = test.select(col(idCol)).crossJoin(labels
        .select(col("__lbl"), col("__pu")))
      .join(perClass, Seq(idCol, "__lbl", "__pu"), "left")
      .select(col(idCol), col("__lbl"),
        (col("__pu") + coalesce(col("__su"), lit(0L))).as("score_u"),
        coalesce(col("__n"), lit(0L)).as("n_tokens"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_u").desc, col("__lbl").asc)
    anchored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__lbl").as("pred"), col("score_u"),
        col("n_tokens"))
  }
}
