package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora (beyond the reference): redact
  * email addresses, IPv4 addresses, SSN-style ids and phone-style numbers
  * with typed placeholder tokens, and count the redactions per kind — the
  * standard pre-training privacy pass.
  *
  * Patterns deliberately stay inside the regex subset with IDENTICAL
  * semantics in Java (Spark, codegen'd `regexp_replace`/`regexp_count`)
  * and RE2 (DuckDB, our oracle): ASCII classes, bounded/greedy
  * quantifiers, non-capturing groups, `\b` — no backrefs, no lookaround.
  * That keeps the operator oracle-checkable bit-for-bit AND portable.
  *
  * Scale: pure per-row projections (regex over the text column), no
  * shuffle, whole-stage codegen; cost is one linear scan per rule, so
  * rules-count × corpus — the right profile for a 100 TB pass. Counts are
  * measured per kind on the ORIGINAL text (kinds are independent;
  * replacement order cannot hide a match). */
object Scrub {

  /** One redaction rule: regex → placeholder. */
  final case class Rule(name: String, pattern: String, placeholder: String)

  val Email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val Ipv4: Rule = Rule("ipv4",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
  val SsnId: Rule = Rule("ssn",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>")
  val Phone: Rule = Rule("phone",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>")

  /** Default rule chain; order matters for replacement (earlier rules
    * consume their matches first) but not for counts. */
  val DefaultRules: Seq[Rule] = Seq(Email, Ipv4, SsnId, Phone)

  /** A cheap NECESSARY-condition guard per rule: a text that fails the
    * guard cannot match the rule's pattern, so the regex pass is
    * skipped entirely. Email requires an '@' (one `contains`); the
    * ipv4/ssn/phone patterns all require a digit — detected with ONE
    * codegen'd `translate` pass, no regex. At corpus scale most text
    * is clean, and the guards turn the common case from four regex
    * scans into one contains + one translate. Parity is exact by
    * construction: the guard is implied by the pattern. */
  private def guardOf(t: Column, r: Rule): Column = r.name match {
    case "email" => t.contains("@")
    case "ipv4" | "ssn" | "phone" =>
      length(translate(t, "0123456789", "")) < length(t)
    case _ => lit(true)
  }

  /** The text with every rule's matches replaced by its placeholder. */
  def redact(text: Column, rules: Seq[Rule] = DefaultRules): Column =
    rules.foldLeft(text)((t, r) =>
      when(guardOf(t, r), regexp_replace(t, r.pattern, r.placeholder))
        .otherwise(t))

  /** Matches of one rule in the original text. */
  def countOf(text: Column, rule: Rule): Column =
    regexp_count(text, lit(rule.pattern))

  /** Adds `<textCol>_scrubbed` plus one `n_<rule>` count column per rule.
    * One projection — no shuffle. */
  def scrub(df: DataFrame, textCol: String,
            rules: Seq[Rule] = DefaultRules): DataFrame = {
    val t = col(textCol)
    val counted = rules.foldLeft(df)((d, r) =>
      d.withColumn(s"n_${r.name}", countOf(t, r)))
    counted.withColumn(s"${textCol}_scrubbed", redact(t, rules))
  }

  /** Luhn-validated payment-card scrub — the tier a regex CANNOT
    * express: candidates are maximal 13–19-digit runs (one space/dash
    * allowed between digits), and only runs passing the Luhn mod-10
    * check redact to `<CC>` — order numbers and timestamps survive.
    * Returns a struct (scrubbed, n_candidates, n_valid, valid_cards);
    * native one-scan kernel, whole-stage codegen, no shuffle. */
  def cardScrub(text: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.scrubCards(text)

  /** [[cardScrub]] over a frame: adds `<textCol>_scrubbed`, `n_cc_cand`,
    * `n_cc_valid`. */
  def scrubCards(df: DataFrame, textCol: String): DataFrame = {
    val s = cardScrub(col(textCol))
    df.withColumn("__cc", s)
      .withColumn(s"${textCol}_scrubbed", col("__cc.scrubbed"))
      .withColumn("n_cc_cand", col("__cc.n_candidates"))
      .withColumn("n_cc_valid", col("__cc.n_valid"))
      .drop("__cc")
  }
}
