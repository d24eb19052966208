package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid table semantics (SURVEY §1.1): one logical table served from an
  * OFFLINE part and a REALTIME part, split by a time boundary — the broker
  * rewrites each query into `offline WHERE t < boundary` ∪ `realtime WHERE
  * t >= boundary` (`BaseBrokerRequestHandler.java:459-499`).
  *
  * Spark realization: a union view with the boundary predicates pushed into
  * each side's scan. Partition-prune-friendly: with the offline side
  * partitioned by date and the realtime side a streaming table, the
  * boundary predicate prunes whole partitions before I/O. */
object HybridTable {
  /** The broker's time-boundary split, as a reusable view. */
  def view(offline: DataFrame, realtime: DataFrame, timeCol: String,
           boundary: Column): DataFrame =
    offline.filter(col(timeCol) < boundary)
      .unionByName(realtime.filter(col(timeCol) >= boundary))

  /** Inverted text index (ColumnIndexType.TEXT_INDEX analog): token → doc
    * postings as a DataFrame. Materialize once (write to parquet bucketed
    * by token at scale); conjunctive term queries become postings
    * intersections — an equi-join + count, never a corpus scan. */
  def invertedTextIndex(docs: DataFrame, textCol: String, idCol: String)
  : DataFrame =
    docs.select(col(idCol),
      explode(array_distinct(graft.functions.TextAnalysis
        .tokens(col(textCol)))).as("token"))

  /** Conjunctive TEXT_MATCH via the inverted index: ids of docs containing
    * ALL `terms` (exact-token semantics). */
  def matchAllTerms(index: DataFrame, idCol: String, terms: Seq[String])
  : DataFrame =
    index.filter(col("token").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("token")).as("nt"))
      .filter(col("nt") === terms.length)
      .select(col(idCol))

  /** POSITIONAL inverted index (Lucene-style postings with positions):
    * (id, token, pos). The extra column is what phrase queries need —
    * same bucketed-by-token layout at scale. */
  def positionalTextIndex(docs: DataFrame, textCol: String, idCol: String)
  : DataFrame =
    docs.select(col(idCol),
      posexplode(graft.functions.TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "token")))

  /** TF-IDF relevance over the postings (Lucene scoring role): per (doc,
    * token) tf × ln(N/df). One aggregation over the index builds tf; df
    * is a token-keyed aggregate broadcast back — all keyed operations,
    * proportional to |postings|, never a corpus scan. */
  def tfIdf(index: DataFrame, idCol: String, nDocs: Long): DataFrame = {
    val tf = index.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = index.groupBy(col("token"))
      .agg(count_distinct(col(idCol)).as("df"))
    tf.join(broadcast(df_), "token")
      .select(col(idCol), col("token"),
        (col("tf") * log(lit(nDocs.toDouble) / col("df"))).as("tfidf"))
  }

  /** BM25 relevance over per-occurrence postings (the scoring Lucene runs
    * behind the reference's TEXT_MATCH ranking;
    * `pinot-core/.../operator/filter/TextMatchFilterOperator.java` delegates
    * scoring to the Lucene index). Lucene's IDF variant:
    * ln(1 + (N − df + 0.5)/(df + 0.5)), length-normalized tf with the
    * corpus-mean doc length.
    *
    * Shape for 100 TB: tf and doc length are ONE aggregation each over the
    * postings; df and avgdl are token-/corpus-level aggregates that are
    * tiny (|vocab| and 1 row) and broadcast back — the postings shuffle
    * once on (id, token), nothing else moves. */
  def bm25(index: DataFrame, idCol: String, nDocs: Long,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = index.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = index.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    val df_ = index.groupBy(col("token"))
      .agg(count_distinct(col(idCol)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(dl, idCol).join(broadcast(avgdl)).join(broadcast(df_), "token")
      .select(col(idCol), col("token"),
        (idf * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl")))).as("bm25"))
  }

  /** Phrase TEXT_MATCH ('"w1 w2 …"' in Lucene syntax): docs where the
    * terms occur at CONSECUTIVE positions. Each adjacent term pair is an
    * equi-join on (id, position offset) over the positional postings —
    * intersections stay keyed, no corpus scan, no cross join. */
  def matchPhrase(posIndex: DataFrame, idCol: String, phrase: Seq[String])
  : DataFrame = {
    require(phrase.nonEmpty)
    val first = posIndex.filter(col("token") === phrase.head)
      .select(col(idCol), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (term, i)) =>
      val next = posIndex.filter(col("token") === term)
        .select(col(idCol), (col("pos") - i).as("pos"))
      acc.join(next, Seq(idCol, "pos"))
    }.select(col(idCol)).distinct()
  }
}
