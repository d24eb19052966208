package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Learn `n` BPE merges (the public byte-pair-encoding procedure —
    * Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
    * Subword Units"): repeatedly count adjacent symbol pairs across the
    * corpus (overlapping, frequency-weighted) and merge the most frequent
    * pair everywhere, greedy left-to-right. Returns one row per merge:
    * (round, lhs, rhs, cnt).
    *
    * Symbols travel as a delimiter-encoded string — each symbol wrapped
    * in `|`, symbols separated by one space (`"hi" → "|h| |i|"`). Merge
    * application is then a plain leftmost-non-overlapping string replace
    * of `"|l| |r|"` → `"|lr|"` — exactly the greedy scan BPE specifies,
    * as ONE codegen string op per round, with `replace()` semantics the
    * DuckDB oracle replays verbatim. `words` are whitespace tokens
    * restricted to `wordPattern`, so symbols can never contain `|` or a
    * space (delimiter safety).
    *
    * Scale shape: the corpus collapses ONCE to the distinct-word frame
    * (one shuffle, |vocab| rows); each round is one map-side-combined
    * pair aggregation over |vocab| rows plus one projection, with the
    * round's frame persisted and its parent released (work per round
    * stays O(|vocab|), lineage stays O(1)). The driver holds only the
    * winning merges — O(n). Ties break on the encoded pair string
    * (deterministic in both engines; the public implementation's
    * dict-order tie-break is arbitrary too). */
  def bpeMerges(df: DataFrame, textCol: String, n: Int,
                wordPattern: String = "^[a-z0-9]+$"): DataFrame = {
    require(n >= 1, s"merge count $n must be >= 1")
    val spark = df.sparkSession
    val words0 = df
      .select(explode(TA.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(wordPattern))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(rtrim(regexp_replace(col("word"), "(.)", "|$1| ")).as("e"),
        col("freq"))
      .persist()
    var words = words0
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= n && !exhausted) {
      val toks = split(col("e"), " ")
      val len1 = greatest(size(toks) - 1, lit(0))
      val pairs = zip_with(slice(toks, lit(1), len1),
        slice(toks, lit(2), len1), (a, b) => concat(a, lit(" "), b))
      val best = words.select(explode(pairs).as("pat"), col("freq"))
        .groupBy("pat").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pat"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pat = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val parts = pat.split(" ")
        def strip(s: String) = s.substring(1, s.length - 1)
        merges += ((r, strip(parts(0)), strip(parts(1)), cnt))
        val next = words.select(
          replace(col("e"), lit(pat), lit(pat.replace("| |", ""))).as("e"),
          col("freq")).persist()
        next.count() // materialize before releasing the parent
        if (words ne words0) words.unpersist()
        words = next
        r += 1
      }
    }
    if (words ne words0) words.unpersist()
    words0.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("round", "lhs", "rhs", "cnt")
  }

  /** [[bpeMerges]]' production-scale tier: ONE distributed aggregation
    * collapses the corpus to the distinct-word frequency table (|vocab|
    * rows — vocabulary-scale, NOT corpus-scale, the same reduction every
    * published tokenizer trainer performs), then the classic exact
    * incremental-pair-count BPE loop (Sennrich et al. 2016 §3; priority
    * structure + per-word delta updates) runs driver-local. A 10k-merge
    * production train is ONE Spark job + a local loop, versus one
    * aggregation job per merge in the distributed loop — which stays as
    * the oracle mode (both are exact; the 3-merge DuckDB gate pins them
    * to the same output).
    *
    * Identical output to [[bpeMerges]] by construction: same greedy
    * leftmost-non-overlapping application, same (count desc, encoded
    * pair asc) tie-break — byte-order parity holds because symbols are
    * ASCII under the default `wordPattern` (both engines compare ASCII
    * identically).
    *
    * `maxWords` bounds driver memory for corpora whose tail vocabulary
    * explodes (the sampled tier: top-`maxWords` by (freq desc, word) —
    * deterministic); `minFreq` prunes hapax noise the same way
    * production trainers do. Defaults keep every word. */
  def bpeMergesLocal(df: DataFrame, textCol: String, n: Int,
                     wordPattern: String = "^[a-z0-9]+$",
                     maxWords: Int = 2000000,
                     minFreq: Long = 1L): DataFrame = {
    require(n >= 1, s"merge count $n must be >= 1")
    val spark = df.sparkSession
    // the ONE distributed action: corpus → (word, freq), deterministically
    // truncated if over budget
    val wordFreq: Array[(String, Long)] = df
      .select(explode(TA.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(wordPattern))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver-local exact BPE: words as symbol arrays; pair → (count,
    // member words) with a sorted view for O(log P) best-pair pulls
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      wordFreq.map(_._1.toCharArray.map(_.toString))
    val freq: Array[Long] = wordFreq.map(_._2)
    def pat(l: String, r: String) = s"|$l| |$r|"
    val counts = mutable.HashMap.empty[(String, String), Long]
    val members = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // sorted by (count desc, encoded pair asc) — the exact distributed
    // tie-break; counts ride inside the key so updates are remove+insert
    implicit val ord: Ordering[(Long, String, (String, String))] =
      Ordering.by(t => (-t._1, t._2))
    val queue = mutable.TreeSet.empty[(Long, String, (String, String))]
    def pairsOf(s: Array[String]): Iterator[(String, String)] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) queue.remove((old, pat(p._1, p._2), p))
      val nw = old + delta
      if (nw != 0L) { counts(p) = nw; queue.add((nw, pat(p._1, p._2), p)) }
      else counts.remove(p)
    }
    for (i <- syms.indices; p <- pairsOf(syms(i))) {
      bump(p, freq(i))
      members.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    def applyMerge(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.toArray
    }
    val merges =
      mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    while (round <= n && queue.nonEmpty) {
      val (cnt, _, best) = queue.head
      val (l, r) = best
      merges += ((round, l, r, cnt))
      val touched = members.getOrElse(best, mutable.Set.empty).toArray
      touched.foreach { wi =>
        val before = syms(wi)
        val after = applyMerge(before, l, r)
        // delta-update: subtract the word's old pair multiset, add the new
        pairsOf(before).foreach { p =>
          bump(p, -freq(wi))
          if (counts.get(p).isEmpty) members.remove(p)
        }
        syms(wi) = after
        pairsOf(after).foreach { p =>
          bump(p, freq(wi))
          members.getOrElseUpdate(p, mutable.Set.empty) += wi
        }
        // membership for pairs still counted but no longer in this word
        pairsOf(before).toSet.diff(pairsOf(after).toSet).foreach(p =>
          members.get(p).foreach(_ -= wi))
      }
      round += 1
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "lhs", "rhs", "cnt")
  }

  /** Apply learned BPE merges to the corpus: each whitespace token
    * matching `wordPattern` is segmented by applying the merges
    * SEQUENTIALLY in learned order (each merge replaces leftmost
    * non-overlapping everywhere — the same greedy scan [[bpeMerges]]
    * trains with, so training data re-encodes to exactly the training
    * segmentation); non-matching tokens pass through whole. Adds
    * `outCol`: the document's subword array.
    *
    * Three equivalent execution tiers (spec-checked equal): for small
    * merge tables the replace chain is inlined as codegen string
    * expressions, one projection per document. Past `exprChainMax` merges
    * (production tokenizers carry 10k+) the merge loop runs once per
    * DISTINCT word — Zipf's law means the same few thousand words account
    * for almost every occurrence, so replaying 10k merges per OCCURRENCE
    * would redo identical work billions of times at corpus scale. The
    * word → subwords table (|vocab| rows, built distributed) then maps
    * occurrences in one broadcast-lookup projection — no corpus shuffle.
    * When the vocabulary exceeds `broadcastVocabMax` (too big to hold on
    * the driver/executors), the same table instead applies as a
    * posexplode → equi-join → ordered regroup: two corpus-linear
    * shuffles, no driver state, arbitrarily large vocabularies. */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)],
                wordPattern: String = "^[a-z0-9]+$",
                outCol: String = "subwords",
                exprChainMax: Int = 64,
                broadcastVocabMax: Long = 2000000L,
                markWordEnd: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Column
    // classic Sennrich/GPT-2 end-of-word marker: appended to each word's
    // LAST subword so the flat subword stream stays losslessly decodable
    // ([[bpeDecode]]); off by default to keep id-space compatibility with
    // marker-free vocabularies.
    def markLastCol(arr: Column): Column =
      concat(slice(arr, lit(1), size(arr) - 1),
        array(concat(element_at(arr, -1), lit(WordEnd))))
    if (merges.size <= exprChainMax) {
      // native codegen kernel: tokenize + per-word merge chain + flatten
      // in ONE generated call (optimization round 20 — the HOF replace
      // chain ran interpreted in every token-span gate; the kernel's
      // fast walk + pipe replay is byte-equal, pinned by
      // [[bpeEncodeHofColumn]] specs)
      df.withColumn(outCol,
        org.apache.spark.sql.graft.BpeEncodeText.column(col(textCol),
          merges, wordPattern, if (markWordEnd) WordEnd else ""))
    } else {
      val merged = merges.toArray
      val pattern = wordPattern.r
      // rank-indexed fast walk (same Plan as the kernel tier, char-unit
      // mode to match this tier's toCharArray split); the literal pipe
      // replay below is the fallback for words/merges the walk's token
      // representation could alias — byte-equal either way (spec-pinned)
      val fastPlan = new org.apache.spark.sql.graft.BpeCore.Plan(
        merges, wordPattern, charMode = true, markSuffix = "")
      def encodeWord(word: String): Seq[String] = {
        val fast = org.apache.spark.sql.graft.BpeCore
          .applyMergesFast(word, fastPlan)
        if (fast != null)
          return scala.collection.immutable.ArraySeq.unsafeWrapArray(fast)
        var e = "|" + word.toCharArray.mkString("| |") + "|"
        merged.foreach { case (l, r) =>
          e = e.replace(s"|$l| |$r|", s"|$l$r|")
        }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          e.split(" ")).map(t => t.substring(1, t.length - 1))
      }
      val encUdf = udf(encodeWord _)
      // the merge loop runs on |vocab| rows, distributed — never per
      // occurrence, never on the driver
      val vocab = df
        .select(explode(TA.tokens(col(textCol))).as("__w"))
        .filter(col("__w").rlike(wordPattern))
        .distinct()
        .select(col("__w"), encUdf(col("__w")).as("__sub"))
        .persist()
      val vocabSize = vocab.count()
      if (vocabSize <= broadcastVocabMax) {
        // map-side lookup: the vocab table broadcasts once; encoding the
        // corpus is a single projection with zero shuffle
        val table = vocab.collect()
          .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
        vocab.unpersist(false) // collected — nothing lazy reads it now
        val bc = df.sparkSession.sparkContext.broadcast(table)
        val mark = markWordEnd
        val apply = udf { (text: String) =>
          if (text == null) Seq.empty[String]
          else text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
            .flatMap { word =>
              val segs =
                if (pattern.findFirstIn(word).isEmpty) Seq(word)
                else bc.value.getOrElse(word, encodeWord(word))
              if (mark) segs.init :+ (segs.last + WordEnd) else segs
            }
        }
        df.withColumn(outCol, apply(col(textCol)))
      } else {
        // vocabulary too large to broadcast: join occurrences to the
        // encoded-word table and regroup in token order. Non-pattern
        // tokens miss the join (the table holds only pattern words) and
        // pass through whole via the coalesce.
        val withId = df.withColumn("__rid", monotonically_increasing_id())
        val occ = withId.select(col("__rid"),
          posexplode(TA.tokens(col(textCol))).as(Seq("__pos", "__w")))
        val rawSub = coalesce(col("__sub"), array(col("__w")))
        val seg = occ.join(vocab, Seq("__w"), "left")
          .select(col("__rid"), col("__pos"),
            (if (markWordEnd) markLastCol(rawSub) else rawSub).as("__sub"))
        val agg = seg.groupBy(col("__rid")).agg(
          flatten(transform(
            array_sort(collect_list(struct(col("__pos"), col("__sub")))),
            s => s.getField("__sub"))).as(outCol))
        val out = withId.join(agg, Seq("__rid"), "left")
          .withColumn(outCol,
            coalesce(col(outCol), array().cast("array<string>")))
          .drop("__rid")
        // materialize before releasing the vocab cache the join reads;
        // the checkpoint blocks are ledger-tracked, swept between queries
        val result = Checkpoints.eager(out)
        vocab.unpersist(false)
        result
      }
    }
  }

  /** HOF formulation of the small-merge-table encode (spec reference —
    * the replace-chain column pipeline the codegen kernel replaced in
    * optimization round 20; [[bpeEncode]] output must stay byte-equal
    * to this, pinned in OperatorsSpec). */
  private[graft] def bpeEncodeHofColumn(textCol: Column,
                                        merges: Seq[(String, String)],
                                        wordPattern: String,
                                        markWordEnd: Boolean): Column = {
    def markLastCol(arr: Column): Column =
      concat(slice(arr, lit(1), size(arr) - 1),
        array(concat(element_at(arr, -1), lit(WordEnd))))
    val encodeWord: Column => Column = { w =>
      val enc0 = rtrim(regexp_replace(w, "(.)", "|$1| "))
      val encN = merges.foldLeft(enc0) { case (e, (l, r)) =>
        replace(e, lit(s"|$l| |$r|"), lit(s"|$l$r|"))
      }
      transform(split(encN, " "), t => t.substr(lit(2), length(t) - 2))
    }
    val perWord: Column => Column = { w =>
      val base = when(w.rlike(wordPattern), encodeWord(w))
        .otherwise(array(w))
      if (markWordEnd) markLastCol(base) else base
    }
    flatten(transform(TA.tokens(textCol), perWord))
  }

  /** [[bpeEncode]] from a [[bpeMerges]] output frame (collected in round
    * order — O(n merges) driver memory). */
  def bpeEncode(df: DataFrame, textCol: String, mergesDf: DataFrame)
  : DataFrame =
    bpeEncode(df, textCol, mergesDf.orderBy("round").collect().toSeq
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))))

  /** End-of-word marker for `markWordEnd` encodes (Sennrich '16 / GPT-2
    * convention — boundary info rides the subword id space, keeping the
    * flat token stream decodable). */
  val WordEnd = "</w>"

  /** Inverse of a `markWordEnd = true` [[bpeEncode]]: concatenate the
    * subword stream and turn each end-of-word marker back into a space —
    * lossless on the whitespace-normalized lowercase token stream the
    * encoder consumed (BPE merges only re-SEGMENT, they never rewrite
    * bytes). Pure codegen string expression, zero shuffle.
    *
    * PRECONDITION: no input token may contain the literal [[WordEnd]]
    * marker string. Words matching `wordPattern` can't (the default
    * pattern admits only `[a-z0-9]`), but a pass-through token that
    * embeds `</w>` would have its embedded marker replaced with a space
    * too, breaking the encode→decode inverse. The GPT-2/Sennrich
    * convention shares this contract — the marker is reserved out of the
    * input alphabet rather than escaped, because global-replace escape
    * chains are order-ambiguous (e.g. `\\m` vs `\` + `\m`) and a true
    * escape would need a per-character scan on the hot decode path. */
  def bpeDecode(subwords: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    rtrim(replace(concat_ws("", subwords), lit(WordEnd), lit(" ")))

  /** Per-document OOV fraction against a vocabulary — the coverage check
    * a pipeline runs after [[build]] (vocab sizing) and before
    * committing a tokenizer: fraction of this document's token
    * occurrences that fall outside `vocab`. The vocabulary broadcasts
    * (it is top-K by construction), so the corpus pays one map-side
    * join + one keyed aggregation; no corpus-sized shuffle beyond the
    * per-doc re-group. Documents with no tokens report n_tokens 0 and
    * null oov_frac. */
  def oovFraction(df: DataFrame, textCol: String, idCol: String,
                  vocab: DataFrame, tokenCol: String = "token")
  : DataFrame = {
    val toks = df.select(col(idCol),
      explode(TA.tokens(col(textCol))).as("token"))
    val joined = toks.join(
      broadcast(vocab.select(col(tokenCol).as("token"),
        lit(1).as("__in"))), Seq("token"), "left")
    val agg = joined.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("__in").isNull, 1).otherwise(0)).cast("long")
        .as("n_oov"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(col("n_oov").cast("double") /
          col("n_tokens").cast("double"), 6).as("oov_frac"))
  }

  /** Tokenizer DATA CARD — fertility (tokens per word) and bytes per
    * token, per corpus slice: the two numbers tokenizer choices are
    * actually judged by. Fertility above ~1.3 on a slice means the
    * merge table undertrained there (every word fragments — training
    * cost per word inflates); bytes/token is the compression rate the
    * context window buys. Words are the whitespace tokens of
    * [[graft.functions.TextAnalysis.tokens]]; token counts run the
    * corpus through [[bpeEncode]] with the caller's merges (same
    * convention as the SFT token spans); bytes are UTF-8 octets of
    * the raw text. Per `groupCol` slice: n_docs, n_words, n_tokens,
    * n_bytes, fertility, bytes_per_token (ratios rounded 6 dp — one
    * IEEE division of exact longs on either engine). Scale shape: one
    * encode projection + ONE keyed agg; nothing driver-side. */
  def fertility(df: DataFrame, textCol: String, groupCol: String,
                merges: Seq[(String, String)],
                wordPattern: String = "^[a-z0-9]+$"): DataFrame =
    bpeEncode(df, textCol, merges, wordPattern, outCol = "__sub")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TA.tokens(col(textCol))).cast("long")).as("n_words"),
        sum(size(col("__sub")).cast("long")).as("n_tokens"),
        sum(octet_length(col(textCol)).cast("long")).as("n_bytes"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .withColumn("bytes_per_token",
        round(col("n_bytes").cast("double") / col("n_tokens"), 6))

  /** Skip-gram co-occurrence counts (the word2vec / GloVe preparation
    * step — Mikolov 2013, Pennington 2014): ordered (center, context)
    * pairs within `window` positions, with both the raw count and the
    * GloVe 1/distance weighting (as an exact 1e6-scaled long, so sums
    * are order-free and engine-exact). Contexts come from slice
    * alignment inside ONE exploded projection — the corpus is scanned
    * once, there is no self-join — followed by one map-side-combined
    * keyed aggregation on the pair. */
  def coocCounts(df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window $window must be >= 1")
    val toks = TA.tokens(col(textCol))
    val n = size(toks)
    val pairs = explode(concat(
      (1 to window).flatMap { d =>
        val len = greatest(n - d, lit(0))
        val a = slice(toks, lit(1), len)
        val b = slice(toks, lit(1 + d), len)
        val w = lit(math.round(1e6 / d))
        Seq(
          zip_with(a, b, (x, y) =>
            struct(x.as("w1"), y.as("w2"), w.as("wu"))),
          zip_with(b, a, (x, y) =>
            struct(x.as("w1"), y.as("w2"), w.as("wu"))))
      }: _*))
    df.select(pairs.as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"), sum(col("p.wu")).as("wcnt_u"))
  }

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
