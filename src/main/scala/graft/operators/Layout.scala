package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) keys for multi-column file
  * pruning.
  *
  * Why it matters at 100 TB: parquet scans prune on per-file (and
  * per-row-group) min/max statistics. Sorting by one column clusters
  * only that column — a predicate on the second key still touches every
  * file. Interleaving the bits of several columns' quantized ranks
  * produces a total order in which files stay clustered on ALL the
  * interleaved dimensions at once, so selective predicates on any of
  * them skip most files (the ZORDER of Delta/Databricks, itself the
  * classic Morton curve — public technique).
  *
  * Pipeline shape: quantization needs each column's min/max — ONE tiny
  * aggregation; the z-value itself is pure codegen bit arithmetic; the
  * layout write is one range-partitioned shuffle on the z-key. */
object Layout {

  /** Morton interleave of already-quantized non-negative ints (each in
    * [0, 2^bits)): bit i of column j lands at position i·n + j. Pure
    * column expression — no UDF. Total bits (bits × n columns) must fit
    * a long. */
  def interleaveBits(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty, "need at least one column")
    require(bits * qs.size <= 63, s"${qs.size} cols × $bits bits > 63")
    val n = qs.size
    val terms = for {
      (q, j) <- qs.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(q.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Quantize a numeric column to an integer rank in [0, 2^bits) given
    * its [lo, hi] range (linear; hi maps to the top bucket). Constant
    * columns (hi == lo) map to 0. */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(buckets),
      floor((c.cast("double") - lit(lo)) / (lit(hi) - lit(lo)) *
        (buckets + 1))).cast("long")
  }

  /** Z-value column for `cols` of `df`: one min/max aggregation sizes the
    * quantizers (driver holds 2×n doubles), then the key is codegen bit
    * math. Returns (df + zCol, the per-column ranges used). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
                 zCol: String = "__z"): (DataFrame, Map[String, (Double, Double)]) = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"),
        max(col(c).cast("double")).as(s"__hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // min/max over an empty frame (or an all-null column) come back as
    // NULL; unboxing them via getAs[Double] would NPE. Fall back to the
    // constant-column path (0.0, 0.0) → quantize maps everything to 0.
    def boxed(name: String): Option[Double] =
      Option(row.getAs[java.lang.Double](name)).map(_.doubleValue())
    val ranges = cols.map { c =>
      val lo = boxed(s"__lo_$c")
      val hi = boxed(s"__hi_$c")
      c -> ((lo.getOrElse(0.0), hi.getOrElse(0.0)))
    }.toMap
    val z = interleaveBits(cols.map { c =>
      val (lo, hi) = ranges(c)
      quantize(col(c), lo, hi, bits)
    }, bits)
    (df.withColumn(zCol, z), ranges)
  }

  /** Write `df` Z-ordered on `cols`: range-partition by the z-key into
    * `nFiles` contiguous curve segments (ONE shuffle), sort within each
    * partition, drop the key, write parquet. Every output file covers a
    * compact z-range, so its min/max stats are tight on EVERY interleaved
    * column — the pruning contract the curve exists for. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val (withZ, _) = withZValue(df, cols, bits)
    withZ.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Clustering quality: per-partition min/max span of each column under
    * the current row order, normalized by the column's global range —
    * the average fraction of the value space a partition touches (lower
    * = tighter pruning). The spec gate asserts z-order beats the
    * single-column sort on the OTHER column. */
  def clusteringSpan(df: DataFrame, cols: Seq[String]): DataFrame = {
    val withPid = df.withColumn("__pid", spark_partition_id())
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c")))
    withPid.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
  }

  // ---- semantic document ordering (in-context pretraining) ----------
  // "In-Context Pretraining: Language Modeling Beyond Document
  // Boundaries" (Shi et al. 2024): order the corpus so RELATED
  // documents are adjacent before concat-and-chunk packing — the model
  // then reads coherent multi-document contexts instead of random
  // juxtapositions. The paper walks a greedy nearest-neighbor path
  // over document embeddings within each shard; this is that walk,
  // deterministic and oracle-replayable.

  /** Greedy nearest-neighbor chain per bucket: start at the bucket's
    * min id, repeatedly hop to the unvisited member with the highest
    * cosine to the CURRENT document (rounded to 6 dp for cross-engine
    * determinism; ties and zero-norm vectors — cosine = −999 — break
    * ascending by id). Returns (bucketCol, idCol, chain_pos) with
    * chain_pos 1-based in walk order.
    *
    * `bucketCol` is the parallel unit, exactly like
    * [[Packing.packExamples]]'s group: the paper orders within shards,
    * an IVF user orders within cells. The walk is O(n² · dim) per
    * bucket in memory — bound buckets accordingly (an IVF cell of 10k
    * docs × dim 64 ≈ 10⁹ mults, seconds on one executor core; buckets
    * run in parallel). Ids tie-break on their STRING form
    * (engine-independent, as in packExamples). */
  def semanticChain(df: DataFrame, idCol: String, vecCol: String,
                    bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val chained = df
      .select(col(bucketCol).cast("string"), col(idCol).cast("string"),
        col(vecCol).cast("array<float>"))
      .as[(String, String, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (b, it) =>
        val mem = it.map { case (_, id, v) => (id, v) }.toArray
          .sortBy(_._1)
        def cos6(u: Array[Float], v: Array[Float]): Double = {
          var du = 0.0; var dv = 0.0; var dd = 0.0; var i = 0
          while (i < u.length) {
            du += u(i).toDouble * u(i); dv += v(i).toDouble * v(i)
            dd += u(i).toDouble * v(i); i += 1
          }
          if (du == 0.0 || dv == 0.0) -999.0
          else BigDecimal(dd / (math.sqrt(du) * math.sqrt(dv)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val n = mem.length
        val visited = new Array[Boolean](n)
        val out = new Array[(String, String, Long)](n)
        var cur = 0 // min id = first after the sort
        visited(0) = true
        out(0) = (b, mem(0)._1, 1L)
        var pos = 1
        while (pos < n) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var j = 0
          while (j < n) {
            if (!visited(j)) {
              val sc = cos6(mem(cur)._2, mem(j)._2)
              // ties break ascending by id: the sort above makes the
              // FIRST unvisited j with this score the smallest id
              if (sc > bestScore) { bestScore = sc; best = j }
            }
            j += 1
          }
          visited(best) = true
          cur = best
          out(pos) = (b, mem(best)._1, pos + 1L)
          pos += 1
        }
        out.iterator
      }
      .toDF("__b", "__id", "chain_pos")
    df.select(col(bucketCol), col(idCol))
      .join(chained, col(bucketCol).cast("string") === col("__b") &&
        col(idCol).cast("string") === col("__id"))
      .drop("__b", "__id")
  }

  /** [[semanticChain]] lifted to a TOTAL corpus order: `ctx_pos` =
    * bucket offset + (chain_pos − 1), buckets ordered by their string
    * form — feed straight into
    * [[Packing.concatChunksOrdered]] as the order column ("shuffle by
    * meaning, then pack"). Bucket offsets are the same two-pass
    * prefix-sum idiom as packing: one tiny per-bucket count collect,
    * never a global window. */
  /** CURRICULUM ordering — a scale-correct GLOBAL position by score
    * (easy→hard data ordering; Bengio et al. 2009's curriculum
    * schedule applied to corpus layout): `orderBy` + one row_number
    * window is a single-partition funnel at corpus scale, so the
    * global rank computes as the range-bucketed TWO-PASS PREFIX SUM
    * the packing tier already proves out — rows bucket by coarse
    * score range, each bucket ranks locally (bucket-keyed window),
    * bucket counts collect (|buckets| rows, driver-tiny) and
    * broadcast back as offsets; `curriculum_pos` = offset + local
    * rank − 1 equals the global (score, id-string) rank EXACTLY
    * because bucketing is monotone in score. `buckets` bounds the
    * largest window partition at ~n/buckets for spread scores; a
    * heavily-skewed score distribution wants finer buckets. Ascending
    * (easy-first); negate the score column for hard-first.
    *
    * Null scores are rejected (ADVICE r16): `floor(null)` would give
    * a null bucket key, and a null score has no defined place in a
    * monotone easy→hard order anyway — filter or impute before
    * calling. The check rides the offsets collect the operator
    * already pays (a null score surfaces as a null bucket key in the
    * per-bucket totals — ADVICE r17 removed the extra up-front
    * `filter(isNull).count()` scan this used to cost). */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: String,
                      lo: Double, hi: Double,
                      buckets: Int = 256): DataFrame = {
    require(hi > lo, s"score range [$lo, $hi) is empty")
    require(buckets >= 1, "need at least one bucket")
    val spark = df.sparkSession
    import spark.implicits._
    // when() keeps a null score a NULL bucket key (Spark's
    // greatest/least SKIP nulls, which would silently file it under
    // bucket 0) so the totals collect below can reject it
    val b = when(col(scoreCol).isNotNull, least(greatest(
        floor((col(scoreCol) - lo) / (hi - lo) * buckets), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int"))
    val bucketed = df.withColumn("__ob", b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ob"))
      .orderBy(col(scoreCol), col(idCol).cast("string"))
    val totalRows = bucketed.groupBy(col("__ob"))
      .agg(count(lit(1)).as("__n"))
      .collect()
    require(totalRows.forall(!_.isNullAt(0)),
      s"curriculumOrder: null $scoreCol — a null score has no place " +
        "in a monotone score order; filter or impute first")
    val totals = totalRows.map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offDf = totals.map(_._1).zip(offsets).toSeq
      .toDF("__ob", "__off")
    bucketed.withColumn("__r", row_number().over(w))
      .join(broadcast(offDf), Seq("__ob"))
      .withColumn("curriculum_pos", col("__off") + col("__r") - 1)
      .drop("__ob", "__r", "__off")
  }

  def semanticOrder(df: DataFrame, idCol: String, vecCol: String,
                    bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val chained = semanticChain(df, idCol, vecCol, bucketCol)
    val totals = chained.groupBy(col(bucketCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offsetDf = totals.map(_._1).zip(offsets).toSeq
      .toDF("__b", "__off")
    chained
      .join(broadcast(offsetDf),
        col(bucketCol).cast("string") === col("__b"))
      .withColumn("ctx_pos", col("__off") + col("chain_pos") - 1)
      .drop("__b", "__off")
  }
}
