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

  /** Keep a deterministic `fraction` of rows by hash bucket of the id —
    * the reproducible replacement for `df.sample()`: no RNG state, the
    * same ids survive on any cluster, and re-running with a larger
    * fraction yields a SUPERSET (buckets are stable, the threshold just
    * moves). Pure filter — no shuffle. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   salt: String = "graft"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.filter(bucket(col(idCol), salt) < lit(math.round(fraction * 10000)))
  }

  /** Deterministic per-key reservoir: exactly min(k, |group|) rows per
    * key, chosen by salted content hash of the id — the stratified
    * "k examples per source/language/bucket" sampler (eval-set carving,
    * per-domain caps with exact counts, few-shot pool selection). Unlike
    * [[sampleByHash]]'s fractional keep, group sizes are EXACT, and
    * unlike an RNG reservoir the choice is reproducible at any
    * parallelism (same salt → same sample).
    *
    * Adds `sample_rank` (1-based, the key's hash order). Scale: one
    * shuffle on the key + a per-key window sort. A pathologically hot
    * key serializes its own partition's sort; for corpus-scale hot keys
    * pre-thin with `sampleByHash` at a fraction that still guarantees
    * ≥ k survivors, then rank the survivors. */
  def reservoirPerKey(df: DataFrame, keyCols: Seq[String], idCol: String,
                      k: Int, salt: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCols.nonEmpty, "need at least one key column")
    // full 60-bit hash order (not the 10k-bucket split resolution —
    // fewer ties), id as the deterministic tiebreak
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(Scalars.hash60(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Weighted source mixing: downsample each source to its target weight —
    * the corpus-mixing step of a training pipeline ("keep 100% of wiki,
    * 30% of web, 5% of logs"). Sources absent from `weights` keep
    * `defaultWeight` (0 = drop). Salting by source decorrelates the
    * per-source keeps from each other and from any split produced by
    * [[hashSplit]]. One projection + filter — no shuffle, no RNG. */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
                 weights: Map[String, Double], defaultWeight: Double = 1.0,
                 salt: String = "graft"): DataFrame = {
    (weights.values ++ Seq(defaultWeight)).foreach(w =>
      require(w >= 0 && w <= 1, s"weight $w not in [0,1]"))
    // bucket salted per source: hash over (salt, source, id)
    val b = Scalars.hash60(concat(lit(salt), lit(":"), col(sourceCol),
      lit(":"), col(idCol).cast("string"))) % 10000L
    val threshold = weights.foldLeft(
      lit(math.round(defaultWeight * 10000))) { case (els, (src, w)) =>
        when(col(sourceCol) === src, lit(math.round(w * 10000))).otherwise(els)
    }
    df.filter(b < threshold)
  }

  /** TOKEN-budget source mixing — the cut real pretraining mixes are
    * specified in ("take 30B tokens of web, 5B of code"): per-source
    * token budgets, not row fractions ([[mixSources]]' unit). Each
    * source's documents order by a salted content hash of the id (the
    * Packing order discipline — reproducible at any parallelism) and
    * the source keeps exactly the prefix of documents whose preceding
    * token count `tok_start` is < its budget. Document-whole
    * semantics: the last kept document may overshoot, the
    * shardByTokens "≈budget ± one tail" convention. Sources absent
    * from `budgets` drop — a mix is exhaustive by definition; a zero
    * budget keeps nothing.
    *
    * Scale: the Packing two-pass distributed prefix sum, per source —
    * a window per (source, hash-bucket) computes local prefixes
    * (~|source|/nBuckets rows each; scale nBuckets with the cluster),
    * then |sources|·nBuckets per-bucket totals prefix-sum on the
    * driver (bounded: a mix has config-many sources) and broadcast
    * back. The corpus shuffles once, into (source, bucket). */
  def takeTokenBudget(df: DataFrame, idCol: String, sourceCol: String,
                      textCol: String, budgets: Map[String, Long],
                      nBuckets: Int = 256, salt: String = "graft")
  : DataFrame = {
    require(budgets.nonEmpty, "empty budget map")
    budgets.values.foreach(b =>
      require(b >= 0, s"negative token budget $b"))
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    import graft.functions.{TextAnalysis => TA}
    val ord = Scalars.hash60(concat(lit(salt), lit(":"),
      col(idCol).cast("string")))
    val base = df
      .filter(col(sourceCol).isin(budgets.keys.toSeq: _*))
      .select(col(idCol), col(sourceCol).as("__src"),
        TA.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        ord.as("__ord"), (ord % nBuckets).as("__bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__src"), col("__bucket"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val withLocal = base.withColumn("__prev_local",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    // pass 2: per-(source, bucket) totals → driver per-source prefix
    // sums → broadcast back as each bucket's source-global offset
    val totals = base.groupBy(col("__src"), col("__bucket"))
      .agg(sum(col("n_tokens")).as("__total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val offsets = totals.groupBy(_._1).toSeq.flatMap {
      case (src, rows) =>
        val sorted = rows.sortBy(_._2)
        sorted.map(_._2)
          .zip(sorted.map(_._3).scanLeft(0L)(_ + _).init)
          .map { case (bkt, off) => (src, bkt, off) }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("__osrc", "__obucket", "__off")
    val budgetCol = budgets.foldLeft(lit(0L)) { case (els, (s, b)) =>
      when(col("__src") === s, lit(b)).otherwise(els)
    }
    withLocal
      .join(broadcast(offsetDf), col("__src") === col("__osrc") &&
        col("__bucket") === col("__obucket"))
      .withColumn("tok_start", col("__off") + col("__prev_local"))
      .filter(col("tok_start") < budgetCol)
      .select(col(idCol), col("__src").as(sourceCol), col("n_tokens"),
        col("tok_start"))
  }

  /** Temperature-flattened source mixing (public method: the p_s ∝ n_s^τ
    * rebalance of Conneau 2019 / XLM-R and most LLM data recipes — τ < 1
    * upweights rare sources relative to their natural share). The largest
    * corpus consistent with the target mix keeps 100% of the SMALLEST
    * source: solving m_s = c·n_s^τ, m_s ≤ n_s for maximal c gives
    * keep-rate_s = (n_min/n_s)^(1−τ). τ = 1 keeps everything (natural
    * mix); τ = 0 equalizes source counts.
    *
    * Scale shape: one count agg (map-side combined, #sources rows to the
    * driver) to learn n_s, then the keep is [[mixSources]]' pure salted
    * filter — no corpus shuffle, no RNG, deterministic at any
    * parallelism. Rates round half-up at 1/10000 via mixSources; the
    * pow() is IEEE double both engine-side and oracle-side (boundary
    * flips would need a pow ulp landing within 5e-5 of a threshold —
    * not a property real corpus counts exhibit). */
  def mixByTemperature(df: DataFrame, idCol: String, sourceCol: String,
                       tau: Double, salt: String = "graft"): DataFrame = {
    require(tau >= 0 && tau <= 1, s"temperature $tau not in [0,1]")
    val counts = df.groupBy(col(sourceCol)).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    if (counts.isEmpty) return df
    val nMin = counts.values.min.toDouble
    val rates = counts.map { case (src, n) =>
      src -> math.pow(nMin / n, 1.0 - tau)
    }
    mixSources(df, idCol, sourceCol, rates, defaultWeight = 0.0,
      salt = salt)
  }

  /** STRATIFIED quality gate — keep the top `frac` of each stratum by
    * score (CCNet keeps the best perplexity bucket PER LANGUAGE; the
    * FineWeb ablations filter per dump): a GLOBAL threshold lets one
    * high-resource stratum crowd every tail stratum out entirely, so
    * the quantile must be per stratum. Deterministic: rows rank by
    * (score desc, id asc) within their stratum and the top
    * ceil(frac · n_s) survive — exact arithmetic, no RNG, same
    * survivors at any parallelism. One count agg (|strata| rows,
    * broadcast back) + one per-stratum window. */
  def keepTopFraction(df: DataFrame, stratumCol: String, scoreCol: String,
                      idCol: String, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac not in [0,1]")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(stratumCol).as("__ks"), col("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    // the threshold multiplies in DECIMAL, not double: 10 × 0.3 is
    // 3.0000000000000004 in IEEE doubles and would ceil to 4 — a
    // config-stated fraction is a finite decimal, so the product is
    // exact and ceil(n·frac) means what the config says
    val fracDec = lit(new java.math.BigDecimal(frac.toString))
    df.join(broadcast(counts), col(stratumCol) === col("__ks"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <=
        ceil(col("__n") * fracDec).cast("long"))
      .drop("__ks", "__n", "__rk")
  }

  /** Per-row weighted keep (importance sampling — the DSIR-style
    * resampling primitive: keep each document with probability equal to
    * its weight, e.g. a quality score or domain importance ratio in
    * [0,1]). Deterministic: the salted id-hash bucket stands in for the
    * uniform draw, so the same (id, weight) survives on any cluster, and
    * raising a weight only ever ADDS survivors (monotone, like
    * [[sampleByHash]]'s fraction). Weights clamp to [0,1]; the threshold
    * rounds half-up at 1/10000 resolution exactly as [[mixSources]]
    * does for its constant weights. Pure filter — no shuffle, no RNG. */
  def sampleByWeight(df: DataFrame, idCol: String, weightCol: String,
                     salt: String = "graft"): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)),
      lit(1.0))
    df.filter(bucket(col(idCol), salt) <
      floor(w * 10000 + 0.5).cast("long"))
  }

  /** Reproducible epoch shuffle: a deterministic global permutation of
    * the corpus per epoch — order by the salted (epoch, id) hash, then
    * assign each row its dense global position. The training-loader
    * primitive RNG shuffles can't give you: the same epoch yields the
    * same order on any cluster, any partitioning, any run.
    *
    * Scale shape: one range shuffle on the hash (global sort order),
    * then zipWithIndex's two passes (per-partition counts → broadcast
    * offsets) — the canonical distributed dense-rank, never a
    * single-partition window. The emitted position depends only on the
    * total order (hash, id), not on where range boundaries land, so the
    * output is deterministic even though boundary sampling isn't. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   salt: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    val h = Scalars.hash60(concat(lit(salt), lit(":"), lit(epoch),
      lit(":"), col(idCol).cast("string")))
    val hashed = df.withColumn("__h", h)
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = hashed.repartitionByRange(parts, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shuffle_pos", org.apache.spark.sql.types.LongType, nullable = false))
    val withPos = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withPos, schema).drop("__h")
  }

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

  /** SPLIT-LEAKAGE report — MEASURES what [[splitByCluster]] prevents:
    * documents in a non-train split whose EXACT text also appears in
    * train — eval rows the model has literally seen, the inflation a
    * post-hoc audit must quantify before trusting any eval number.
    * Exact tier by 60-bit text hash: train's distinct hashes
    * semi-probe the eval side, so only (hash, id) longs shuffle and
    * the report is eval-split-sized. For NEAR-dup leakage, run
    * [[splitByCluster]]'s pair input through the same shape — or
    * better, split by cluster and make this report return empty.
    * Returns (idCol, splitCol) of leaked eval documents. */
  def splitLeakage(labeled: DataFrame, idCol: String, textCol: String,
                   splitCol: String = "split",
                   trainName: String = "train"): DataFrame = {
    val train = labeled.filter(col(splitCol) === trainName)
      .select(Scalars.hash60(col(textCol)).as("__h")).distinct()
    labeled
      .filter(col(splitCol) =!= trainName && col(splitCol).isNotNull)
      .select(col(idCol), col(splitCol),
        Scalars.hash60(col(textCol)).as("__h"))
      .join(train, Seq("__h"), "left_semi")
      .select(col(idCol), col(splitCol))
  }

  /** NEAR-DUP tier of [[splitLeakage]]: documents in a non-train split
    * with a near-duplicate (an edge in `pairs` — [[Dedup.minHashPairs]]
    * / simHash / embedding pairs, whatever the pipeline's dedup tier
    * produces) in train. Catches the leakage exact hashing cannot see
    * — paraphrased or lightly-edited twins — which is precisely the
    * case that motivated [[splitByCluster]]. Edges symmetrize, train
    * ids semi-probe the eval endpoint; everything shuffled is id
    * pairs. Returns (idCol, splitCol) of leaked eval documents. */
  def splitLeakageNear(labeled: DataFrame, pairs: DataFrame,
                       idCol: String, splitCol: String = "split",
                       trainName: String = "train"): DataFrame = {
    val e = pairs.select(col("id_a").as("__s"), col("id_b").as("__d"))
      .unionAll(pairs.select(col("id_b").as("__s"),
        col("id_a").as("__d")))
    val trainIds = labeled.filter(col(splitCol) === trainName)
      .select(col(idCol).as("__d")).distinct()
    val leakEnds = e.join(trainIds, Seq("__d"), "left_semi")
      .select(col("__s").as(idCol)).distinct()
    labeled
      .filter(col(splitCol) =!= trainName && col(splitCol).isNotNull)
      .join(leakEnds, Seq(idCol), "left_semi")
      .select(col(idCol), col(splitCol))
  }

  /** EPOCH / repetition plan for data-constrained mixing (Muennighoff
    * et al. 2023, "Scaling Data-Constrained Language Models": repeating
    * data up to ~4 epochs costs little — the planning step that turns
    * (available tokens, target mixture weight, total budget) into how
    * many times each source actually repeats): per source,
    * `target_tokens` = floor(weight·budget) in EXACT decimal,
    * `tokens_realized` = min(target, floor(maxEpochs·available)) —
    * integer-exact, the cap is where repetition stops paying —
    * `epochs` = realized/available (6dp), and `deficit` = target −
    * realized, the tokens the cap refuses (to be re-weighted onto
    * other sources or accepted as a smaller run). Pure projection
    * over the per-source frame (one row per source — driver-scale). */
  def epochPlan(perSource: DataFrame, sourceCol: String,
                tokensCol: String, weightCol: String, budget: Long,
                maxEpochs: java.math.BigDecimal): DataFrame = {
    val w = col(weightCol)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6))
    perSource
      .withColumn("target_tokens",
        floor(w * lit(budget)).cast("long"))
      .withColumn("tokens_realized",
        least(col("target_tokens"),
          floor(lit(maxEpochs) * col(tokensCol)).cast("long")))
      .withColumn("epochs",
        round(col("tokens_realized").cast("double") / col(tokensCol), 6))
      .withColumn("deficit",
        col("target_tokens") - col("tokens_realized"))
  }

  /** DoReMi-style DOMAIN REWEIGHTING (Xie et al. 2023 "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining") —
    * the data-side analog of the paper's Group-DRO proxy run: domains
    * where the proxy model's loss exceeds the reference model's
    * ("excess loss" — the signal that more of that domain would help)
    * receive multiplicatively increased mixture weight over `rounds`
    * exponentiated-gradient updates, each smoothed toward uniform:
    *
    *   w ← (1 − c) · normalize(w · exp(η · λ)) + c/k,   w₀ = 1/k
    *
    * with λ_d = max(0, mean(proxy) − mean(ref)) per domain (6-dp
    * rounded from exact decimal sums — order-free). The per-domain
    * loop runs on the DRIVER over the |domains|-sized aggregate (the
    * [[epochPlan]] idiom); normalization sums run in SORTED domain
    * order so the oracle's running-sum replay is IEEE-identical, and
    * exp() shares [[mixByTemperature]]'s pow() cross-engine
    * justification (a boundary flip needs an exp ulp within 5e-7 of a
    * 6-dp edge). Returns (domain, n_docs, excess, weight) with weight
    * rounded 6 dp; feed the weights to [[epochPlan]] /
    * [[takeTokenBudget]] as the mixture. */
  def doremiWeights(scored: DataFrame, domainCol: String,
                    proxyLossCol: String, refLossCol: String,
                    eta: Double = 1.0, rounds: Int = 3,
                    smoothing: Double = 0.01): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(smoothing >= 0 && smoothing < 1,
      s"smoothing $smoothing not in [0,1)")
    val spark = scored.sparkSession
    import spark.implicits._
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val per = scored
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(proxyLossCol).cast(d6)).as("__sp"),
        sum(col(refLossCol).cast(d6)).as("__sr"))
      .withColumn("excess", greatest(lit(0.0),
        round((col("__sp") - col("__sr")).cast("double") /
          col("n_docs"), 6)))
      .select(col("domain"), col("n_docs"), col("excess"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val k = per.length
    require(k > 0, "no domains")
    var w = Array.fill(k)(1.0 / k)
    for (_ <- 1 to rounds) {
      val wp = Array.tabulate(k)(i => w(i) * math.exp(eta * per(i)._3))
      var tot = 0.0 // sequential adds in sorted-domain order — the
      wp.foreach(tot += _) // oracle's running-sum replay
      w = wp.map(x => (1 - smoothing) * (x / tot) + smoothing / k)
    }
    per.zip(w).toSeq.map { case ((d, n, e), wt) =>
      (d, n, e, BigDecimal(wt)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("domain", "n_docs", "excess", "weight")
  }

  /** Leakage-safe split: near-duplicate CLUSTERS move as a unit, so no
    * eval document has a near-dup of itself in train — the published
    * train/test-contamination failure of splitting after (or without)
    * dedup. Components of `pairs` ([[Dedup.clusters]]) share a group
    * key (singletons: their own id); the split then hash-buckets the
    * GROUP key with the same salted-md5 assignment as [[hashSplit]].
    * Fractions govern group mass, so realized row fractions drift with
    * duplicate-cluster sizes — the price of zero leakage.
    *
    * Scale shape: clusters' pointer-jumping joins + ONE corpus⋈labels
    * equi-join + the pure-projection split. No new shuffle class. */
  def splitByCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
                     splits: Seq[(String, Double)],
                     salt: String = "graft"): DataFrame = {
    // reserved name (see Dedup.collapseClusters): a bare `label` joined
    // onto docs would collide with a user column of the same name
    val labels = Dedup.clusters(pairs)
      .select(col("id").as(idCol), col("label").as("__cluster_lbl"))
    val grouped = docs.join(labels, Seq(idCol), "left")
      .withColumn("__grp", coalesce(col("__cluster_lbl"), col(idCol)))
    hashSplit(grouped, "__grp", splits, salt).drop("__grp", "__cluster_lbl")
  }
}
