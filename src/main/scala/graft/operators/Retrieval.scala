package graft.operators

import graft.functions.{TextAnalysis => TA, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
  * ranking and a dense cosine ranking — the fusion layer a RAG / search
  * pipeline puts over the engine's two existing retrieval tiers (Lucene
  * BM25 behind the reference's TEXT_MATCH,
  * `pinot-core/.../filter/TextMatchFilterOperator.java`, re-expressed in
  * [[HybridTable.bm25]]; dense ANN in [[Similarity]]).
  *
  * rrf(d) = Σ_r 1/(k0 + rank_r(d)) over the rankers that returned d
  * (Cormack, Clarke & Buettcher, SIGIR'09) — only RANKS enter the sum, so
  * incomparable score scales (BM25 vs cosine) fuse without calibration,
  * and a document missing from one list simply contributes the other
  * list's term.
  *
  * Scale shape: each ranker is the already-proven operator (BM25 =
  * postings aggregations that shuffle once; cosine = brute oracle tier or
  * IVF/PQ scale tier); fusion itself joins top-n ranked LISTS (n ≪
  * corpus) — negligible next to the rankers, and embarrassingly parallel
  * per query if the inputs carry a query id in `idCol`'s grouping. */
object Retrieval {

  /** Fuse named ranked lists. Each input holds (idCol, rank) with rank
    * 1-based; output: (idCol, <name>_rank…, rrf, rank) — the fused
    * 1-based ranking, ties broken by idCol, truncated to `k`. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0 && k0 >= 0, s"bad k=$k / k0=$k0")
    val renamed = rankings.map { case (name, df) =>
      df.select(col(idCol), col("rank").cast("int").as(s"${name}_rank"))
    }
    val joined = renamed.reduce(_.join(_, Seq(idCol), "full_outer"))
    val score = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0) + col(s"${name}_rank")), lit(0.0))
    }.reduce(_ + _)
    val w = Window.orderBy(col("rrf").desc, col(idCol))
    joined.withColumn("rrf", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-group [[rrfFuse]]: every input holds (byCol, idCol, rank) with
    * rank 1-based WITHIN its byCol group (one group per query of a
    * batch); fusion, ranking, and the top-k cut all happen per group in
    * one pass — N queries cost one job wave, not N. */
  def rrfFuseBy(rankings: Seq[(String, DataFrame)], idCol: String,
                byCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0 && k0 >= 0, s"bad k=$k / k0=$k0")
    val renamed = rankings.map { case (name, df) =>
      df.select(col(byCol), col(idCol),
        col("rank").cast("int").as(s"${name}_rank"))
    }
    val joined = renamed.reduce(_.join(_, Seq(byCol, idCol), "full_outer"))
    val score = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0) + col(s"${name}_rank")), lit(0.0))
    }.reduce(_ + _)
    val w = Window.partitionBy(col(byCol))
      .orderBy(col("rrf").desc, col(idCol))
    joined.withColumn("rrf", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** BATCH hybrid retrieval: fuse a whole frame of queries —
    * (queryIdCol, termsCol: array&lt;string&gt;, qvecCol:
    * array&lt;float&gt;) — against one corpus in ONE pass per ranker
    * (the service shape; [[hybridTopK]] is the single-query oracle
    * tier). Corpus statistics (postings, BM25 weights, doc count) are
    * computed once and shared by every query; the query frame
    * broadcasts; per-query ranking is a window partitioned by query id
    * (WindowGroupLimit bounds it to nPerRanker per group before any full
    * sort). Output: (queryIdCol, idCol, lex_rank, dense_rank, rrf,
    * rank ≤ k) — embarrassingly parallel across queries, exactly one
    * job wave over the corpus per ranker.
    *
    * Scale: the dense tier here is the brute one-pass baseline
    * (corpus × N scored map-side off a broadcast query frame, then the
    * grouped top-n cut); swap in [[Similarity.ivfTopKWith]] per cell for
    * the IVF-pruned path when N × corpus stops fitting a wave. */
  def hybridTopKBatch(docs: DataFrame, emb: DataFrame, idCol: String,
                      textCol: String, vecCol: String, queries: DataFrame,
                      queryIdCol: String = "query_id",
                      termsCol: String = "terms", qvecCol: String = "qvec",
                      k: Int = 10, k0: Int = 60, nPerRanker: Int = 100)
  : DataFrame = {
    require(vecCol != qvecCol,
      "corpus and query vector columns must have distinct names")
    val lex = lexRankedBatch(docs, idCol, textCol, queries, queryIdCol,
      termsCol, nPerRanker)
    val denseW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos").desc, col(idCol))
    val dense = emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(qvecCol))))
      .select(col(queryIdCol), col(idCol),
        round(try_divide(Vectors.dot(col(vecCol), col(qvecCol)),
          Vectors.norm2(col(vecCol)) * Vectors.norm2(col(qvecCol))), 6)
          .as("cos"))
      .filter(col("cos").isNotNull) // zero-norm guard, as in hybridTopK
      .withColumn("rank", row_number().over(denseW))
      .filter(col("rank") <= nPerRanker)
      .select(col(queryIdCol), col(idCol), col("rank"))
    rrfFuseBy(Seq("lex" -> lex, "dense" -> dense), idCol, queryIdCol, k, k0)
  }

  /** [[hybridTopKBatch]] with the dense tier IVF-PRUNED: corpus vectors
    * assign once to the supplied coarse `cells` (argmin over the
    * scaled-long distance — one codegen projection, zero shuffle; ties
    * break to the lowest cell like the ANN tiers), each query probes its
    * `nProbe` nearest cells, and only those cells' candidates score —
    * per query the scan touches ~nProbe/nCells of the corpus instead of
    * all of it. This is the scale path the brute batch tier documents:
    * at 100 TB the assignment is the persisted cell-partitioned IVF
    * layout ([[Similarity.persistIvfIndex]]) and the probe join prunes
    * to cell directories. `cells` from [[Similarity.ivfCellsSeeded]]
    * (deterministic, oracle-replayable) or [[Similarity.ivfCellsLloyd]]
    * (quality mode) — identical plan, different constants. */
  def hybridTopKBatchIvf(docs: DataFrame, emb: DataFrame, idCol: String,
                         textCol: String, vecCol: String,
                         queries: DataFrame, cells: Array[Array[Float]],
                         nProbe: Int, queryIdCol: String = "query_id",
                         termsCol: String = "terms",
                         qvecCol: String = "qvec", k: Int = 10,
                         k0: Int = 60, nPerRanker: Int = 100): DataFrame = {
    require(nProbe >= 1 && nProbe <= cells.length,
      s"nProbe $nProbe not in [1, ${cells.length}]")
    require(vecCol != qvecCol,
      "corpus and query vector columns must have distinct names")
    val lex = lexRankedBatch(docs, idCol, textCol, queries, queryIdCol,
      termsCol, nPerRanker)
    val assigned = assignCells(emb, idCol, vecCol, cells)
    val dense = denseCellProbe(assigned, idCol, vecCol, queries, cells,
      nProbe, queryIdCol, qvecCol, nPerRanker)
    rrfFuseBy(Seq("lex" -> lex, "dense" -> dense), idCol, queryIdCol, k, k0)
  }

  /** Batch hybrid over PERSISTED indexes — the service at steady state:
    * `postings` is the live positional text index
    * ([[graft.sources.TextIndexLifecycle.load]]: one row per token
    * occurrence, so tf/dl/df and BM25 derive without touching any
    * document text) and `assigned` the cell-assigned vector index
    * ([[Similarity.loadIvfIndex]]`.assigned`, cell-partitioned on disk —
    * each query's probes prune to nProbe cell directories). Nothing here
    * reads the corpus: both rankers run entirely off index files, which
    * is the point at 100 TB — the crawl is cold storage, the indexes are
    * the hot set. Same fusion and output shape as [[hybridTopKBatch]].
    *
    * The probe centroids come FROM THE INDEX (`index.centroids` — the
    * ones its rows were assigned under), never from the caller: a
    * centroid array that differed from the assignment-time cells would
    * silently probe the wrong cells and bleed recall with no error. The
    * centroid collect is nCells rows — driver-trivial. */
  def hybridTopKBatchIndexed(postings: DataFrame,
                             index: Similarity.IvfIndex,
                             idCol: String, vecCol: String,
                             queries: DataFrame, nProbe: Int,
                             queryIdCol: String = "query_id",
                             termsCol: String = "terms",
                             qvecCol: String = "qvec", k: Int = 10,
                             k0: Int = 60, nPerRanker: Int = 100,
                             nDocsKnown: Option[Long] = None)
  : DataFrame = {
    require(vecCol != qvecCol,
      "corpus and query vector columns must have distinct names")
    val cells = centroidCells(index)
    val assigned = index.assigned.select(col("cand_id").as(idCol),
      col("cv").as(vecCol), col("cell"))
    // nDocs is constant between index appends: a service passes the
    // memoized stat via nDocsKnown so each query batch skips the
    // distinct-count scan of the postings; None recomputes (the
    // self-contained gate path).
    val nDocs = nDocsKnown.getOrElse(
      postings.select(col(idCol)).distinct().count())
    val lex = lexRankedFromPostings(postings, idCol, nDocs, queries,
      queryIdCol, termsCol, nPerRanker)
    val dense = denseCellProbe(assigned, idCol, vecCol, queries, cells,
      nProbe, queryIdCol, qvecCol, nPerRanker)
    rrfFuseBy(Seq("lex" -> lex, "dense" -> dense), idCol, queryIdCol, k, k0)
  }

  /** The index's own probe centroids as a dense 0..n-1 array (the form
    * [[cellArgmin]]/[[denseCellProbe]] consume) — cell ids must be the
    * contiguous range the assignment wrote, asserted here so a corrupt
    * or hand-edited centroid table fails loudly instead of mis-probing. */
  private def centroidCells(index: Similarity.IvfIndex)
  : Array[Array[Float]] = {
    val rows = index.centroids.select(col("cell").cast("int"),
      col("centroid")).collect()
    require(rows.nonEmpty, "index has no centroids")
    val byCell = rows.map(r => r.getInt(0) ->
      r.getSeq[Float](1).toArray).sortBy(_._1)
    require(byCell.map(_._1).sameElements(byCell.indices),
      s"centroid cell ids not contiguous 0..${rows.length - 1}")
    byCell.map(_._2)
  }

  /** Seeded-cell assignment of a vector frame — the build side of the
    * persisted index [[hybridTopKBatchIndexed]] probes: (idCol, vecCol,
    * cell). Persist cell-partitioned ([[Similarity.persistIvfIndex]])
    * so probes prune to cell directories. */
  def assignCells(vectors: DataFrame, idCol: String, vecCol: String,
                  cells: Array[Array[Float]]): DataFrame = {
    require(cells.nonEmpty, "need at least one cell centroid")
    vectors.select(col(idCol), col(vecCol),
      cellArgmin(col(vecCol), cells).as("cell"))
  }

  /** Argmin cell id over the scaled-long distance — ONE compact codegen
    * kernel call ([[Similarity.cellArgmin]]; an unrolled least(struct…)
    * tree here breaks janino at large nCells), ties to the lowest cell
    * (the ANN tiers' total order). */
  private def cellArgmin(v: org.apache.spark.sql.Column,
                         cells: Array[Array[Float]])
  : org.apache.spark.sql.Column = Similarity.cellArgmin(v, cells)

  /** IVF-pruned dense tier shared by the batch hybrids: each query
    * probes its nProbe nearest cells (struct sort = (distance, cell id),
    * the exact total order the oracles replay) and scores only those
    * cells' candidates. */
  private def denseCellProbe(assigned: DataFrame, idCol: String,
                             vecCol: String, queries: DataFrame,
                             cells: Array[Array[Float]], nProbe: Int,
                             queryIdCol: String, qvecCol: String,
                             nPerRanker: Int): DataFrame = {
    // probe choice = struct sort over the compact kernel's distance
    // vector ([[Similarity.cellScores]]) — same (distance, cell) total
    // order the oracles replay, no k-unrolled expression tree
    val qprobe = queries.select(col(queryIdCol), col(qvecCol),
      explode(transform(slice(array_sort(
        Similarity.cellScores(col(qvecCol), cells)), 1,
        nProbe), p => p.getField("c"))).as("cell"))
    val denseW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos").desc, col(idCol))
    assigned.join(broadcast(qprobe), Seq("cell"))
      .select(col(queryIdCol), col(idCol),
        round(try_divide(Vectors.dot(col(vecCol), col(qvecCol)),
          Vectors.norm2(col(vecCol)) * Vectors.norm2(col(qvecCol))), 6)
          .as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rank", row_number().over(denseW))
      .filter(col("rank") <= nPerRanker)
      .select(col(queryIdCol), col(idCol), col("rank"))
  }

  /** Shared lexical tier of the batch hybrids: corpus BM25 weights
    * computed once, joined to the broadcast exploded query terms,
    * summed per (query, doc), ranked per query with a
    * WindowGroupLimit-bounded cut. */
  private def lexRankedBatch(docs: DataFrame, idCol: String,
                             textCol: String, queries: DataFrame,
                             queryIdCol: String, termsCol: String,
                             nPerRanker: Int): DataFrame = {
    val postings = docs.select(col(idCol),
      explode(TA.tokens(col(textCol))).as("token"))
    val nDocs = docs.count() // once per BATCH, shared by all queries
    lexRankedFromPostings(postings, idCol, nDocs, queries, queryIdCol,
      termsCol, nPerRanker)
  }

  /** BM25 ranking off an occurrence-level postings frame (one row per
    * token occurrence — raw tokenization or the persisted positional
    * text index equally). */
  private def lexRankedFromPostings(postings: DataFrame, idCol: String,
                                    nDocs: Long, queries: DataFrame,
                                    queryIdCol: String, termsCol: String,
                                    nPerRanker: Int): DataFrame = {
    val qTerms = queries.select(col(queryIdCol),
      explode(col(termsCol)).as("token"))
    val lexW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol))
    HybridTable.bm25(postings.select(col(idCol), col("token")), idCol,
        nDocs)
      .join(broadcast(qTerms), "token")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("bm25")), 6).as("score"))
      .withColumn("rank", row_number().over(lexW))
      .filter(col("rank") <= nPerRanker)
      .select(col(queryIdCol), col(idCol), col("rank"))
  }

  /** Single-query hybrid top-k over an aligned (documents, embeddings)
    * pair: BM25 of `queryTerms` (summed over distinct terms) fused with
    * cosine against `queryVec`. A strict special case of
    * [[hybridTopKBatch]] — one query row, same rankers, same fusion, the
    * batch's query-id column projected away — so the two APIs cannot
    * drift. (Terms dedupe first: the historical single-query ranker
    * filtered with `isin`, which never counted a term twice.) */
  def hybridTopK(docs: DataFrame, emb: DataFrame, idCol: String,
                 textCol: String, vecCol: String,
                 queryTerms: Seq[String], queryVec: Seq[Float],
                 k: Int, k0: Int = 60, nPerRanker: Int = 100): DataFrame = {
    require(queryTerms.nonEmpty && queryVec.nonEmpty, "empty query")
    val one = docs.sparkSession.range(1).select(
      lit(0).as("__qid"), typedLit(queryTerms.distinct).as("__terms"),
      typedLit(queryVec).as("__qvec"))
    hybridTopKBatch(docs, emb, idCol, textCol, vecCol, one,
      queryIdCol = "__qid", termsCol = "__terms", qvecCol = "__qvec",
      k = k, k0 = k0, nPerRanker = nPerRanker)
      .drop("__qid")
  }
}
