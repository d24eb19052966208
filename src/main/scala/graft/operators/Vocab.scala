package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary construction (beyond the reference): the
  * count-and-rank step every tokenizer-training / vocab-pruning pipeline
  * runs before BPE merges or embedding-table sizing.
  *
  * Scale shape: tokenize is a per-row projection (codegen tokenizer from
  * [[graft.functions.TextAnalysis]]); the explode feeds ONE hash
  * aggregation on token (map-side partial combine collapses each
  * partition's counts to its distinct tokens before the shuffle, so the
  * shuffle moves |vocab|-sized partials, not |corpus| token occurrences);
  * top-K lands as TakeOrderedAndProject (per-partition heap + driver
  * merge of K rows), never a global sort of the vocabulary. */
object Vocab {

  /** Global token counts: (token, n_occurrences, n_docs). */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String)
  : DataFrame =
    df.select(col(idCol), explode(TA.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col(idCol)).as("n_docs"))

  /** Top-`k` vocabulary with deterministic ties (count desc, token asc)
    * and rank (1-based, dense over the deterministic order). */
  def build(df: DataFrame, textCol: String, idCol: String, k: Int,
            minCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = tokenCounts(df, textCol, idCol)
      .filter(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("token")).limit(k)
    // rank over K rows only (the limit already shrank the frame): the
    // single-partition window is over at most `k` rows, not the corpus
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n_occurrences").desc,
        col("token"))))
  }
}
