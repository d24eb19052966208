package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.{Column, DataFrame}
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
  * p(tok|c) = (count(tok, c) + k) / (total_c + k·V). The vocabulary is
  * the train tokens whose TOTAL corpus count ≥ `minCount`; V = |vocab|,
  * total_c = the surviving token mass of class c, and any token outside
  * the vocabulary (pruned or never seen) takes the smoothed-zero
  * likelihood k / (total_c + k·V). Prediction = argmax_c, ties broken
  * by label ascending. `minCount = 1` keeps every train token — the
  * unpruned model.
  *
  * Exactness: every per-token ln rounds to 6dp and rides as a
  * 1e6-scaled long, so per-document per-class sums are integer-exact
  * and aggregation-order-free — the DuckDB oracle replays predictions
  * bit-for-bit (same pattern as [[LmQuality]]).
  *
  * Scale shape: training is ONE pass over the exploded (label, token)
  * stream into a map-side-combined keyed count table, which persists;
  * label totals, priors, and the vocab size all derive from that table
  * (scalar/label-sized aggregates — the corpus is never re-tokenized).
  * Scoring explodes test tokens once, expands by the label set (a
  * handful of rows — the label frame is crossJoin-safe) and equi-joins
  * the count table on (token, label). The count-table join carries an
  * EXPLICIT broadcast hint whenever the table holds ≤
  * `broadcastCountMax` entries AND ≤ `broadcastBytesMax` measured
  * bytes — the plan cannot flip to sort-merge at
  * the AQE threshold boundary — and at 100 TB `minCount` prunes the
  * table to its frequent survivors first (Zipf: a minCount of even 2–5
  * drops the long tail, most of the distinct-token mass). Above the
  * cap it degrades to a keyed shuffle join, never a replicated build.
  * No shuffle carries document text; the widest stream is tokens ×
  * nLabels. The driver holds three scalars (V, N, count-table size). */
object Classifier {

  /** Score and classify `test` against a model trained on `train`.
    * Output: (idCol, pred, score_u, n_tokens) — one row per test doc,
    * `score_u` the winning class's 1e6-scaled log-posterior numerator,
    * `n_tokens` the doc's token count (0-token docs classify by prior
    * alone).
    *
    * @param minCount vocabulary pruning: train tokens with total corpus
    *   count below this leave the model (scored as unseen). 1 = keep all.
    * @param broadcastCountMax max (label, token) entries for which the
    *   count table is force-broadcast to the scoring join.
    * @param broadcastBytesMax max MEASURED count-table bytes (string
    *   payloads + per-entry overhead, aggregated in the stats pass) for
    *   the broadcast — both caps must hold, so wide tokens/labels stop
    *   a broadcast the entry cap alone would admit. */
  def nbClassify(train: DataFrame, test: DataFrame, textCol: String,
                 labelCol: String, idCol: String,
                 k: Double = 1.0, minCount: Long = 1L,
                 broadcastCountMax: Long = 5000000L,
                 broadcastBytesMax: Long = 192L << 20): DataFrame = {
    require(k > 0, s"smoothing k=$k must be > 0")
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val trTok = train.select(col(labelCol).as("__lbl"),
      explode(TA.tokens(col(textCol))).as("__t"))
    // ONE corpus pass: the (label, token) count table. Vocab pruning on
    // the token's cross-label total; everything downstream (label token
    // totals, vocab size, broadcast decision) derives from this table.
    val ctAll = trTok.groupBy("__lbl", "__t").agg(count(lit(1)).as("__c"))
    val ct = (if (minCount > 1L) {
      val wt = Window.partitionBy(col("__t"))
      ctAll.withColumn("__ttot", sum(col("__c")).over(wt))
        .filter(col("__ttot") >= minCount).drop("__ttot")
    } else ctAll).persist()
    // one pass also MEASURES the count table's bytes (token + label
    // string payloads + a long + UnsafeRow overhead per entry) — the
    // broadcast guard below is sized in what the build actually weighs,
    // not entries: 5M short-token entries are ~150 MB, 5M long-label
    // entries can be >0.5 GB, and only the bytes tell them apart.
    // octet_length, not length: the guard must count BYTES — a CJK token
    // is 3 UTF-8 bytes per char, and a char-counted "150 MB" table can
    // serialize to ~450 MB, exactly the oversized broadcast the cap exists
    // to stop
    val stats = ct.agg(count(lit(1)).as("nPairs"),
      count_distinct(col("__t")).as("v"),
      coalesce(sum(octet_length(col("__t")) + octet_length(col("__lbl")) +
        lit(24)), lit(0L)).as("bytes")).head()
    val (nPairs, v, ctBytes) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val lt = ct.groupBy("__lbl").agg(sum(col("__c")).as("__tot"))
    val nd = train.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__ndc"))
    val nDocs = train.count()

    def u6(x: org.apache.spark.sql.Column) =
      round(round(log(x), 6) * 1e6).cast("long")

    // per-label prior + smoothing denominator — one tiny frame, joined
    // to everything else by label (broadcast by size). LEFT join from the
    // doc counts: a class whose every token was pruned (or whose docs
    // are all empty) must SURVIVE with zero token mass — its tokens
    // score the smoothed zero, its prior still competes — not vanish
    // from the model.
    val labels = nd.join(lt, Seq("__lbl"), "left")
      .select(col("__lbl"), coalesce(col("__tot"), lit(0L)).as("__tot"),
        u6(col("__ndc").cast("double") / lit(nDocs.toDouble)).as("__pu"))

    val teTok = test.select(col(idCol), posexplode(TA.tokens(col(textCol))))
      .select(col(idCol), col("col").as("__t"))
    // token stream × label set, count looked up per (token, label);
    // out-of-vocab (token, label) pairs take the smoothed-zero
    // likelihood. Size-guarded EXPLICIT broadcast: the count table's
    // cardinality was just measured, so the join shape is deterministic
    // — never left to flip at the AQE byte-estimate boundary.
    val ctSide =
      if (nPairs <= broadcastCountMax && ctBytes <= broadcastBytesMax)
        broadcast(ct) else ct
    // v == 0 (every token pruned — the degenerate all-OOV model): token
    // likelihoods are undefined, so each token contributes 0 and docs
    // classify by prior alone; the branch is a driver-side constant, so
    // the plan never divides by the zero denominator.
    val tokenU =
      if (v == 0) lit(0L)
      else u6((coalesce(col("__c"), lit(0L)).cast("double") + lit(k)) /
        (col("__tot").cast("double") + lit(k) * lit(v.toDouble)))
    val scored = teTok.crossJoin(broadcast(labels))
      .join(ctSide, Seq("__lbl", "__t"), "left")
      .select(col(idCol), col("__lbl"), col("__pu"), tokenU.as("__u"))
    val perClass = scored.groupBy(col(idCol), col("__lbl"), col("__pu"))
      .agg(sum(col("__u")).as("__su"), count(lit(1)).as("__n"))
    // every test doc gets every class row even with zero tokens:
    // re-anchor on test × labels and coalesce the token sums to 0
    val anchored = test.select(col(idCol)).crossJoin(broadcast(labels
        .select(col("__lbl"), col("__pu"))))
      .join(perClass, Seq(idCol, "__lbl", "__pu"), "left")
      .select(col(idCol), col("__lbl"),
        (col("__pu") + coalesce(col("__su"), lit(0L))).as("score_u"),
        coalesce(col("__n"), lit(0L)).as("n_tokens"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_u").desc, col("__lbl").asc)
    val out = anchored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__lbl").as("pred"), col("score_u"),
        col("n_tokens"))
    // materialize before releasing the count-table cache the join reads
    val result = graft.operators.Checkpoints.eager(out)
    ct.unpersist(false)
    result
  }

  /** CLASSIFIER EVALUATION report — the confusion-derived per-class
    * metrics a quality/routing classifier is judged by before its
    * threshold gates a corpus (the fastText-router workflow: train →
    * EVALUATE → deploy): per class label — gold and predicted support,
    * tp/fp/fn, precision, recall, F1 (6 dp; null when the denominator
    * is 0, no epsilon; F1 via the equivalent 2·tp/(n_pred+n_gold) so
    * no null-chaining through p and r). Labels appearing only in gold
    * or only in predictions still get a row (full outer on the label —
    * a classifier that invents a class, or never predicts one, must
    * show). Two keyed aggs + one label-sized join; no corpus text past
    * the first projection. */
  def evalReport(df: DataFrame, predCol: String, goldCol: String)
  : DataFrame = {
    import org.apache.spark.sql.functions._
    val byGold = df.groupBy(col(goldCol).as("label"))
      .agg(count(lit(1)).as("n_gold"),
        sum((col(predCol) <=> col(goldCol)).cast("long")).as("tp"))
    val byPred = df.groupBy(col(predCol).as("label"))
      .agg(count(lit(1)).as("n_pred"))
    byGold.join(byPred, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_gold") - col("tp"))
      .withColumn("precision",
        when(col("n_pred") === 0, lit(null).cast("double"))
          .otherwise(round(col("tp").cast("double") / col("n_pred"), 6)))
      .withColumn("recall",
        when(col("n_gold") === 0, lit(null).cast("double"))
          .otherwise(round(col("tp").cast("double") / col("n_gold"), 6)))
      .withColumn("f1",
        when(col("n_pred") + col("n_gold") === 0,
          lit(null).cast("double"))
          .otherwise(round(lit(2.0) * col("tp") /
            (col("n_pred") + col("n_gold")), 6)))
  }

  /** PRECISION-RECALL CURVE over a SCORED frame — the threshold-sweep
    * card behind "route everything the quality classifier scores
    * above t": one point per DISTINCT score, with tp/fp cumulative
    * over the `score ≥ threshold` prefix (threshold semantics make
    * within-score ordering irrelevant — every row at a score is in or
    * out together). Emits (threshold, n_ge, tp, fp, precision,
    * recall, f1 — 6 dp; recall null when the frame has no positives).
    *
    * Scale shape — the point of this formulation: the corpus reduces
    * FIRST (one keyed agg to |distinct scores| rows: per-score n and
    * tp), and only the threshold-sized frame enters the unpartitioned
    * cumulative window — a classifier emits thousands of distinct
    * scores, not billions, so the single-partition window is bounded
    * by the score vocabulary, never by the corpus. A per-ROW sweep
    * (window over the raw frame) would be a corpus-sized single
    * partition — the anti-pattern this avoids. */
  def prCurve(df: DataFrame, goldCol: String, scoreCol: String)
  : DataFrame = {
    import org.apache.spark.sql.functions._
    // a null score has no place on a threshold sweep (it would mint a
    // phantom NULL-threshold point holding the whole corpus) — fail
    // loudly in the grouping projection, the curriculumOrder contract
    val score = when(
      assert_true(col(scoreCol).isNotNull,
        lit(s"prCurve: null $scoreCol — filter or impute first"))
        .isNull,
      col(scoreCol).cast("double"))
    val perScore = df.groupBy(score.as("threshold"))
      .agg(count(lit(1)).as("__n"),
        sum(col(goldCol).cast("long")).as("__tp"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perScore
      .withColumn("n_ge", sum(col("__n")).over(w))
      .withColumn("tp", sum(col("__tp")).over(w))
      .withColumn("__pos", sum(col("__tp")).over(wAll))
      .withColumn("fp", col("n_ge") - col("tp"))
      .withColumn("precision",
        round(col("tp").cast("double") / col("n_ge"), 6))
      .withColumn("recall",
        when(col("__pos") === 0, lit(null).cast("double"))
          .otherwise(round(col("tp").cast("double") / col("__pos"),
            6)))
      .withColumn("f1",
        when(col("tp") === 0, lit(0.0))
          .otherwise(round(lit(2.0) * col("tp") /
            (col("n_ge") + col("__pos")), 6)))
      .select(col("threshold"), col("n_ge"), col("tp"), col("fp"),
        col("precision"), col("recall"), col("f1"))
  }

  /** OPERATING-POINT picker over a [[prCurve]] sweep — the last mile
    * of "route everything the classifier scores above t": nothing in
    * the curve says WHICH t, this does. One row (the chosen point,
    * prefixed with the `objective` label), or ZERO rows when no point
    * meets the floor — an empty pick is "no operating point exists",
    * never a null-filled row. Objectives:
    *
    *   - `max_f1`: the F1-maximizing point; ties break to the HIGHEST
    *     threshold (the cheaper routing — fewer docs pass);
    *   - `precision_floor`: the LOWEST threshold with precision ≥
    *     `floorAt` — maximize recall subject to a precision bar;
    *   - `recall_floor`: among points with recall ≥ `floorAt`, the
    *     highest-precision one (ties → highest threshold) — maximize
    *     precision subject to a recall bar.
    *
    * Scale shape: the curve is |distinct scores|-sized, so each pick
    * is one TakeOrderedAndProject (top-1, no global sort) over the
    * already-reduced frame. */
  def thresholdPick(curve: DataFrame, objective: String,
                    floorAt: Double = Double.NaN): DataFrame = {
    import org.apache.spark.sql.functions._
    val needsFloor = Set("precision_floor", "recall_floor")
    require(objective == "max_f1" || needsFloor(objective),
      s"unknown objective: $objective")
    require(!needsFloor(objective) ||
      (!floorAt.isNaN && floorAt >= 0 && floorAt <= 1),
      s"$objective needs a floor in [0,1], got $floorAt")
    val picked = objective match {
      case "max_f1" =>
        curve.orderBy(col("f1").desc, col("threshold").desc)
      case "precision_floor" =>
        curve.filter(col("precision") >= floorAt)
          .orderBy(col("threshold"))
      case "recall_floor" =>
        curve.filter(col("recall") >= floorAt)
          .orderBy(col("precision").desc, col("threshold").desc)
    }
    picked.limit(1).select(lit(objective).as("objective"),
      col("threshold"), col("n_ge"), col("tp"), col("fp"),
      col("precision"), col("recall"), col("f1"))
  }

  /** RELIABILITY (calibration) card — the diagram behind "is a score
    * of 0.9 actually right 90% of the time?", the audit a
    * quality-classifier gate needs BEFORE [[thresholdPick]]'s
    * operating point means anything: scores (must be in [0,1] —
    * out-of-range or null fails loudly, the [[prCurve]] contract)
    * bin into `nBins` equal-width bins (score 1.0 joins the last
    * bin, the scikit-learn convention); per bin — n, `mean_score`
    * (confidence), `frac_pos` (empirical accuracy), and `gap` =
    * |mean_score − frac_pos|, all 6 dp. Determinism at any
    * parallelism: the score sum rides as DECIMAL(18,6) (the
    * [[graft.operators.Chats.groupAdvantage]] idiom) so the mean is
    * order-free and exact before the one double division; `gap`
    * derives from the two ROUNDED columns, so both engines agree
    * bit-for-bit. One keyed agg to nBins rows — nothing else moves. */
  def calibration(df: DataFrame, goldCol: String, scoreCol: String,
                  nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val score = when(
      assert_true(col(scoreCol).isNotNull &&
        col(scoreCol) >= 0 && col(scoreCol) <= 1,
        lit(s"calibration: $scoreCol must be non-null in [0,1]"))
        .isNull,
      col(scoreCol).cast("double"))
    val bin = least(floor(score * nBins).cast("long"),
      lit(nBins - 1L))
    df.select(bin.as("bin"),
        score.cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .as("__s"),
        col(goldCol).cast("long").as("__g"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s")).as("__ss"),
        sum(col("__g")).as("__tp"))
      .withColumn("mean_score",
        round(col("__ss").cast("double") / col("n"), 6))
      .withColumn("frac_pos",
        round(col("__tp").cast("double") / col("n"), 6))
      .withColumn("gap",
        round(abs(col("mean_score") - col("frac_pos")), 6))
      .select(col("bin"), col("n"), col("mean_score"),
        col("frac_pos"), col("gap"))
  }

  /** EXPECTED CALIBRATION ERROR over the [[calibration]] card — the
    * one number a model card publishes: ECE = Σ_b (n_b / N) · gap_b
    * (Naeini et al. 2015's binned estimator), 6 dp. Computed from the
    * card's ROUNDED 6-dp gaps via exact integer micro-units
    * (n · gap·1e6 rides as a long), so the sum is order-free and the
    * oracle replays it bit-for-bit. One agg over the nBins-row card. */
  def calibrationError(card: DataFrame): DataFrame =
    card.agg(sum(col("n")).as("n"),
        sum(col("n") * round(col("gap") * 1e6).cast("long"))
          .as("__gu"))
      .select(col("n"),
        round(col("__gu").cast("double") / 1e6 / col("n"), 6)
          .as("ece"))

  /** COHEN'S KAPPA — inter-annotator agreement for labeled training
    * data (are two raters/two model judges actually consistent, or
    * just agreeing by chance?): κ = (p_o − p_e) / (1 − p_e) with
    * p_o = observed agreement and p_e = Σ_l marginal_a(l)·marginal_b(l)
    * / n² (Cohen 1960). Null labels fail loudly — an unrated row has
    * no place in an agreement score. Returns ONE row:
    * (n, n_agree, po, pe, kappa), 6 dp; κ derives from the ROUNDED
    * po/pe so both engines agree exactly. Degenerate chance-perfect
    * margins (p_e = 1): κ = 1 when agreement is also perfect, else
    * NULL (undefined, never a fake 0). Scale shape: one global agg +
    * two label-sized marginal aggs joined on the label — the corpus
    * scans once, only label-count rows move. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String)
  : DataFrame = {
    val a = when(
      assert_true(col(aCol).isNotNull && col(bCol).isNotNull,
        lit("cohenKappa: null label — unrated rows must be " +
          "filtered first")).isNull,
      col(aCol).cast("string"))
    // materialize the two-column projection ONCE: the global agg and
    // both marginal aggs read the same blocks (the
    // unigramDriftTermsFromCounts idiom) — without this the corpus
    // (and the null-check projection) would scan three times
    val base = Checkpoints.eager(
      df.select(a.as("__a"), col(bCol).cast("string").as("__b")))
    val tot = base.agg(count(lit(1)).as("n"),
      sum((col("__a") === col("__b")).cast("long")).as("n_agree"))
    val ma = base.groupBy(col("__a").as("__l"))
      .agg(count(lit(1)).as("__ca"))
    val mb = base.groupBy(col("__b").as("__l"))
      .agg(count(lit(1)).as("__cb"))
    val pe = ma.join(mb, Seq("__l"))
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
        .as("__pen"))
    tot.crossJoin(pe)
      .withColumn("po",
        when(col("n") > 0,
          round(col("n_agree").cast("double") / col("n"), 6)))
      .withColumn("pe",
        when(col("n") > 0,
          round(col("__pen").cast("double") / col("n") / col("n"),
            6)))
      .withColumn("kappa",
        when(col("pe") === 1.0,
          when(col("po") === 1.0, lit(1.0))
            .otherwise(lit(null).cast("double")))
          .otherwise(round((col("po") - col("pe")) /
            (lit(1.0) - col("pe")), 6)))
      .select(col("n"), col("n_agree"), col("po"), col("pe"),
        col("kappa"))
  }

  /** FLEISS' KAPPA — multi-rater agreement (Fleiss 1971), the
    * consensus audit for judge ENSEMBLES (3 model judges label every
    * document: do they actually agree beyond chance?): one row per
    * (item, rater-assignment) with its label; every item must carry
    * the SAME number of ratings n ≥ 2 (the classic design — ragged
    * panels fail loudly, they are a collection bug). All sums are
    * exact integers — P̄ = (Σ_i Σ_l n_il² − N·n) / (N·n·(n−1)) and
    * p_e = Σ_l c_l² / (N·n)² — with doubles only at the final
    * divisions (6 dp); κ from the ROUNDED P̄/p_e so the oracle
    * replays bit-for-bit. Degenerate chance-perfect margins
    * (p_e = 1): κ = 1 on perfect agreement, else NULL. Returns
    * (n_items, n_raters, p_bar, p_e, kappa). Scale shape: one
    * (item, label)-keyed agg, one item-keyed agg, one label-keyed
    * agg — the ratings scan once, only count rows move. */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String)
  : DataFrame = {
    val lbl = when(
      assert_true(col(labelCol).isNotNull,
        lit("fleissKappa: null label — unrated rows must be " +
          "filtered first")).isNull,
      col(labelCol).cast("string"))
    val base = Checkpoints.eager(
      df.select(col(itemCol).cast("string").as("__i"),
        lbl.as("__l")))
    val cell = Checkpoints.eager(
      base.groupBy(col("__i"), col("__l"))
        .agg(count(lit(1)).as("__c")))
    val perItem = cell.groupBy(col("__i"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__c") * col("__c")).as("__s2"))
    val tot = perItem.agg(count(lit(1)).as("n_items"),
      min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"),
      sum(col("__s2")).as("__S2"))
    val perLabel = cell.groupBy(col("__l"))
      .agg(sum(col("__c")).as("__cl"))
    val labelSq = perLabel
      .agg(coalesce(sum(col("__cl") * col("__cl")), lit(0L))
        .as("__C2"))
    val N = col("n_items").cast("double")
    val n = col("__nmin").cast("double")
    val ragged = when(
      assert_true(col("__nmin") === col("__nmax") &&
        col("__nmin") >= 2,
        lit("fleissKappa: every item needs the SAME rating count " +
          "n >= 2 (ragged or singleton panels are a collection " +
          "bug)")).isNull,
      col("__nmin"))
    tot.crossJoin(labelSq)
      .withColumn("n_raters", ragged)
      .withColumn("p_bar",
        round((col("__S2").cast("double") - N * n) /
          (N * n * (n - 1)), 6))
      .withColumn("p_e",
        round(col("__C2").cast("double") / (N * n) / (N * n), 6))
      .withColumn("kappa",
        when(col("p_e") === 1.0,
          when(col("p_bar") === 1.0, lit(1.0))
            .otherwise(lit(null).cast("double")))
          .otherwise(round((col("p_bar") - col("p_e")) /
            (lit(1.0) - col("p_e")), 6)))
      .select(col("n_items"), col("n_raters"), col("p_bar"),
        col("p_e"), col("kappa"))
  }

  /** WEIGHTED KAPPA — [[cohenKappa]] for ORDINAL labels (Cohen
    * 1968): a 1-vs-3 quality-rating disagreement should cost more
    * than 2-vs-3. Labels must be integers in [0, k); disagreement
    * weights are |i−j| (`linear`) or (i−j)² (`quadratic` — the
    * ICC-equivalent convention model-eval reports usually quote).
    * κ_w = 1 − n·Σ d_ij·O_ij / Σ d_ij·r_i·c_j — BOTH sums are exact
    * integer arithmetic over the k×k confusion cells and margins
    * (the weights' rational denominator cancels), one double
    * division at the end (6 dp). Degenerate margins with zero
    * expected disagreement: κ = 1 when observed disagreement is
    * also zero, else NULL. Returns (n, kappa). Scale shape: one
    * (a, b)-keyed agg + two label-sized margin aggs joined k×k —
    * the ratings scan once. */
  def weightedKappa(df: DataFrame, aCol: String, bCol: String,
                    k: Int, scheme: String = "quadratic")
  : DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(scheme == "linear" || scheme == "quadratic",
      s"scheme must be linear or quadratic, got $scheme")
    def ord(c: String) = when(
      assert_true(col(c).isNotNull && col(c) >= 0 && col(c) < k,
        lit(s"weightedKappa: $c must be an integer label in " +
          s"[0, $k)")).isNull,
      col(c).cast("long"))
    def d(i: Column, j: Column): Column = {
      val diff = abs(i - j)
      if (scheme == "linear") diff else diff * diff
    }
    val base = Checkpoints.eager(
      df.select(ord(aCol).as("__a"), ord(bCol).as("__b")))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__o"))
    val obs = cells.agg(coalesce(sum(col("__o")), lit(0L)).as("n"),
      coalesce(sum(d(col("__a"), col("__b")) * col("__o")), lit(0L))
        .as("__dO"))
    val ma = base.groupBy(col("__a")).agg(count(lit(1)).as("__ra"))
    val mb = base.groupBy(col("__b")).agg(count(lit(1)).as("__cb"))
    val exp = ma.crossJoin(mb)
      .agg(coalesce(sum(d(col("__a"), col("__b")) *
        col("__ra") * col("__cb")), lit(0L)).as("__dE"))
    obs.crossJoin(exp)
      .withColumn("kappa",
        when(col("__dE") === 0L,
          when(col("__dO") === 0L, lit(1.0))
            .otherwise(lit(null).cast("double")))
          .otherwise(round(lit(1.0) -
            col("n").cast("double") * col("__dO") /
              col("__dE").cast("double"), 6)))
      .select(col("n"), col("kappa"))
  }
}
