package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", §A1.1 repetition filters) for training
  * corpora — beyond the reference, which has no corpus-quality surface.
  *
  * Two tiers:
  *  - [[duplicateLineFraction]]: a pure per-row expression (codegen, no
  *    shuffle) over a line/segment delimiter.
  *  - [[ngramRepetition]]: per-document n-gram repetition measured
  *    count-wise (top-gram share and duplicated-gram share of all n-gram
  *    windows). Count-based definitions are tie-free — no "which gram is
  *    the mode" nondeterminism — so the DuckDB oracle can replay them
  *    bit-for-bit. Implemented as two keyed aggregations ((doc, gram)
  *    then doc), which hash-partition and scale; no per-row quadratic
  *    HOF pass.
  */
object Repetition {

  /** Non-empty trimmed segments of `text` split on `delim`. */
  private def segments(text: Column, delim: String): Column =
    filter(transform(split(text, delim), s => trim(s)), s => s =!= "")

  /** Fraction of non-empty lines (segments) that are repeats of an
    * earlier line: 1 - distinct/total, 0 for empty docs. Rounded to 6 dp
    * to keep cross-engine double parity. */
  def duplicateLineFraction(text: Column, delim: String = "\n"): Column = {
    val segs = segments(text, delim)
    val n = size(segs).cast("double")
    round(when(n > 0,
      lit(1.0) - size(array_distinct(segs)).cast("double") / n)
      .otherwise(lit(0.0)), 6)
  }

  /** RefinedWeb-style within-document repetition REMOVAL: keep each
    * distinct segment's FIRST occurrence, in original order, rejoined
    * with `delim` (lines for real web text; any separator the corpus
    * warrants). Pure per-row codegen HOF — no shuffle, no UDF. The fold
    * accumulates the kept-segment array, so the split evaluates ONCE
    * (an `array_position(segs, …)` formulation would re-evaluate the
    * split per element — HOF lambdas get no CSE); the `array_contains`
    * probe is O(kept) per segment, bounded by segments/doc, independent
    * of corpus size. */
  def dedupSegments(text: Column, delim: String = "\n"): Column =
    array_join(
      aggregate(segments(text, delim), array().cast("array<string>"),
        (acc, x) => when(array_contains(acc, x), acc)
          .otherwise(concat(acc, array(x)))),
      delim)

  /** Per-document n-gram repetition: for each `idCol` emits
    * `n_windows` (total n-gram occurrences), `top_frac` (share of
    * occurrences belonging to the single most frequent gram) and
    * `dup_frac` (share of occurrences whose gram occurs more than once).
    * Documents shorter than n tokens count their single whole-text
    * shingle (the corpus-wide shingle convention). */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // Count-based metrics only need gram IDENTITY, so grams travel as
    // 60-bit hashes from the single-pass codegen shingle kernel — the
    // explode/shuffle moves longs, not n-token strings (the string
    // variant benched 9x slower at sf0.1).
    val grams = df.select(col(idCol),
      explode(org.apache.spark.sql.graft.TextHashExprs
        .shingleHash60(TextAnalysis.tokens(col(textCol)), n)).as("__g"))
    val perGram = grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
    perGram.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_windows"),
      round(max(col("__c")).cast("double") /
        sum(col("__c")).cast("double"), 6).as("top_frac"),
      round(coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L))
        .cast("double") / sum(col("__c")).cast("double"), 6).as("dup_frac"))
  }
}
