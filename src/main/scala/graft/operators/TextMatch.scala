package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lucene-subset TEXT_MATCH (reference
  * `pinot-core/.../operator/filter/TextMatchFilterOperator.java` over
  * `pinot-segment-local/.../invertedindex/RealtimeLuceneTextIndex.java`,
  * query shapes from `TextSearchQueriesTest.java`): boolean `AND`/`OR`/
  * `NOT`, `"phrase"` queries, trailing-`*` prefix wildcards, general
  * wildcards (`mid*dle`, `te?m`), fuzzy terms (`term~1`), and
  * parentheses, compiled onto the positional inverted index from
  * [[HybridTable]] instead of a Lucene segment.
  *
  * Supported grammar (uppercase operators, Lucene-style):
  * {{{
  *   expr    := and ((OR)? and)*          -- bare adjacency defaults to OR,
  *                                           except `a NOT b` = a AND NOT b
  *   and     := unary (AND unary)*
  *   unary   := NOT unary | primary
  *   primary := '(' expr ')' | '"w1 w2 …"' | term | prefix* | wild?card
  *            | fuzzy~N
  * }}}
  *
  * Compilation is Spark-first: every leaf is a token-keyed postings lookup
  * (with the index stored bucketed by token, a pruned scan — never a corpus
  * scan); AND is a doc-id semi-join, OR a union-distinct, NOT an anti-join
  * (against the other conjunct when one exists, else against the doc-id
  * universe). All operations stay keyed — nothing materializes on the
  * driver and no cross joins appear at any query size. */
object TextMatch {

  /** Partition prefix of a token — the persisted text index's on-disk
    * layout key ([[graft.sources.TextIndexLifecycle]] writes postings
    * hive-partitioned by it) and the probe's pruning predicate: letter
    * sentinel + the token's first md5 hex char, 16 values. Hash-based
    * (not first-letter) so arbitrary token bytes stay path-safe and the
    * 16 partitions stay balanced under any vocabulary skew. Exact-term
    * and phrase probes prune to their terms' partitions; prefix /
    * wildcard / fuzzy probes scan all 16 by construction (they match
    * unknown tokens) — exactly the reference's Lucene trade, where a
    * wildcard also walks the whole term dictionary. */
  def tpCol(token: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("t"), substring(md5(token), 1, 1))

  /** Driver-side twin of [[tpCol]] for probe literals. */
  def tpOf(term: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    "t" + "%02x".format(d(0)).substring(0, 1)
  }

  sealed trait Node
  final case class Term(t: String) extends Node
  final case class Prefix(p: String) extends Node
  /** General wildcard term: `*` = any run, `?` = one char (Lucene). */
  final case class Wildcard(pattern: String) extends Node
  /** Fuzzy term `t~N`: tokens within N edits (Lucene default 2). */
  final case class Fuzzy(t: String, maxEdits: Int) extends Node
  final case class Phrase(terms: Seq[String]) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(q: Node) extends Node

  // ---- parser -----------------------------------------------------------

  private val TokRe = "\"[^\"]*\"|\\(|\\)|[^\\s()\"]+".r
  private val FuzzyRe = "([^~]+)~(\\d*)".r

  /** Lucene wildcard → SQL LIKE (escape %/_/\, then * → %, ? → _). */
  private[operators] def likePattern(w: String): String =
    w.flatMap {
      case '%' => "\\%"
      case '_' => "\\_"
      case '\\' => "\\\\"
      case '*' => "%"
      case '?' => "_"
      case c => c.toString
    }

  /** Parse a Lucene-subset query string into a [[Node]] tree. */
  def parse(query: String): Node = {
    val toks = TokRe.findAllIn(query).toList
    require(toks.nonEmpty, s"empty TEXT_MATCH query: '$query'")
    var rest = toks

    def peek: Option[String] = rest.headOption
    def next(): String = { val h = rest.head; rest = rest.tail; h }

    def primary(): Node = next() match {
      case "(" =>
        val e = expr()
        require(peek.contains(")"), s"unbalanced parens in '$query'")
        next(); e
      case q if q.startsWith("\"") =>
        val words = q.stripPrefix("\"").stripSuffix("\"").toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq
        require(words.nonEmpty, s"empty phrase in '$query'")
        if (words.length == 1) Term(words.head) else Phrase(words)
      case FuzzyRe(base, edits) =>
        Fuzzy(base.toLowerCase, if (edits.isEmpty) 2 else edits.toInt)
      case w if w.endsWith("*") && w.length > 1 &&
          !w.dropRight(1).exists(c => c == '*' || c == '?') =>
        Prefix(w.dropRight(1).toLowerCase) // pure trailing-* fast path
      case w if w.exists(c => c == '*' || c == '?') =>
        require(w.exists(c => c != '*' && c != '?'),
          s"bare wildcard in '$query'")
        Wildcard(w.toLowerCase)
      case w =>
        require(w != ")" && w != "AND" && w != "OR",
          s"unexpected '$w' in '$query'")
        Term(w.toLowerCase)
    }

    def unary(): Node =
      if (peek.contains("NOT")) { next(); Not(unary()) } else primary()

    def and(): Node = {
      var acc = unary()
      while (peek.contains("AND")) { next(); acc = And(acc, unary()) }
      acc
    }

    def expr(): Node = {
      var acc = and()
      var done = false
      while (!done) peek match {
        case Some("OR") => next(); acc = Or(acc, and())
        case Some(t) if t != ")" =>
          // bare adjacency: Lucene's `a NOT b` means a AND NOT b;
          // any other adjacent clause defaults to OR
          val nxt = and()
          acc = nxt match {
            case Not(_) => And(acc, nxt)
            case _ => Or(acc, nxt)
          }
        case _ => done = true
      }
      acc
    }

    val out = expr()
    require(rest.isEmpty, s"trailing tokens ${rest.mkString(" ")} in '$query'")
    out
  }

  // ---- compiler ---------------------------------------------------------

  /** Compile a parsed query to the matching doc ids.
    *
    * @param posIndex positional postings (id, token, pos) from
    *                 [[HybridTable.positionalTextIndex]]
    * @param universe distinct doc ids (needed only for NOT without a
    *                 positive conjunct)
    * @param vocab    optional persisted term dictionary (a `token`
    *                 column; [[graft.sources.TextIndexLifecycle.loadVocab]])
    *                 — dictionary-shaped probes (prefix/wildcard/fuzzy)
    *                 resolve candidate tokens there instead of scanning
    *                 the postings' distinct tokens
    */
  def compile(posIndex: DataFrame, universe: DataFrame, idCol: String,
              q: Node, vocab: Option[DataFrame] = None): DataFrame = {
    // partition pruning for known-term probes: when the postings carry
    // the tp layout column (persisted index), restrict the scan to the
    // terms' partitions BEFORE the token filter — the directory-pruned
    // read. In-session indexes without tp scan as before.
    val hasTp = posIndex.columns.contains("tp")
    def byTp(terms: Seq[String]): DataFrame =
      if (hasTp) posIndex.filter(col("tp").isin(terms.map(tpOf): _*))
      else posIndex
    // Lucene's term dictionary: dictionary-shaped probes (prefix /
    // wildcard / fuzzy — the ones that cannot hash their target tokens)
    // resolve candidate TOKENS on the persisted vocabulary when one is
    // supplied (|vocab| ≪ |postings|), then semi-join back onto the
    // postings keyed by token (tp rides along when present, so even the
    // postings side of the semi-join prunes). Without a vocab the
    // distinct-token set derives from the postings — correct, one
    // corpus-postings scan per dictionary probe.
    def byDict(tokens: DataFrame): DataFrame =
      posIndex.join(tokens, Seq("token"), "left_semi")
        .select(col(idCol)).distinct()
    // token-pattern probe: with a dictionary, match TOKENS there and
    // semi-join the postings; without one, the direct postings filter is
    // one scan (deriving a distinct-token set first would cost more)
    def byPattern(f: Column => Column): DataFrame = vocab match {
      case Some(v) => byDict(v.select(col("token")).distinct()
        .filter(f(col("token"))))
      case None => posIndex.filter(f(col("token")))
        .select(col(idCol)).distinct()
    }
    def ids(n: Node): DataFrame = n match {
      case Term(t) =>
        byTp(Seq(t)).filter(col("token") === t).select(col(idCol)).distinct()
      case Prefix(p) => byPattern(_.startsWith(p))
      case Wildcard(p) =>
        // Lucene WildcardQuery analog: the LIKE probe runs over the term
        // dictionary (or the postings' token column), never the corpus
        // text.
        byPattern(_.like(likePattern(p)))
      case Fuzzy(t, d) =>
        // Lucene FuzzyQuery analog: edit-distance match resolved on the
        // vocabulary (persisted term dictionary when supplied, else the
        // postings' distinct tokens), then a keyed semi-join back onto
        // the postings — levenshtein never runs per-posting-row.
        // (Classic Levenshtein; Lucene additionally counts a
        // transposition as one edit — documented divergence.)
        val dict = vocab.getOrElse(posIndex.select(col("token")))
          .select(col("token")).distinct()
        byDict(dict.filter(levenshtein(col("token"), lit(t)) <= d))
      case Phrase(ts) => HybridTable.matchPhrase(byTp(ts), idCol, ts)
      case And(l, Not(r)) => ids(l).join(ids(r), Seq(idCol), "left_anti")
      case And(Not(l), r) => ids(r).join(ids(l), Seq(idCol), "left_anti")
      case And(l, r) => ids(l).join(ids(r), Seq(idCol), "left_semi")
      case Or(l, r) => ids(l).unionByName(ids(r)).distinct()
      case Not(inner) => universe.join(ids(inner), Seq(idCol), "left_anti")
    }
    ids(q)
  }

  /** Per-row expression compile of the same grammar: a boolean Column
    * over the text column itself, for contexts without a postings index
    * (the SQL dialect's TEXT_MATCH(col, '…') — reference evaluates those
    * against the realtime Lucene index; here the filter fuses into the
    * scan). Terms/prefixes probe the token array; phrases are a
    * whitespace-bounded regex on the lowered text (tokens are whitespace
    * splits, so the two formulations agree with the postings plan).
    * Leaves are TWO-VALUED: NULL text collapses to false (the reference
    * stores nulls as the default empty string — an empty doc matches no
    * term), which makes `NOT` here agree with [[compile]]'s universe
    * anti-join on null-text docs too, not just on non-matching ones. */
  def columnFor(text: org.apache.spark.sql.Column, query: String)
  : org.apache.spark.sql.Column = {
    val toks = graft.functions.TextAnalysis.tokens(text)
    def leaf(x: org.apache.spark.sql.Column) = coalesce(x, lit(false))
    def c(n: Node): org.apache.spark.sql.Column = n match {
      case Term(t) => leaf(array_contains(toks, t))
      case Prefix(p) => leaf(exists(toks, x => x.startsWith(p)))
      case Wildcard(p) => leaf(exists(toks, x => x.like(likePattern(p))))
      case Fuzzy(t, d) => leaf(exists(toks, x => levenshtein(x, lit(t)) <= d))
      case Phrase(ts) =>
        val body = ts.map(java.util.regex.Pattern.quote).mkString("\\s+")
        leaf(lower(text).rlike(s"(^|\\s)$body(\\s|$$)"))
      case And(l, r) => c(l) && c(r)
      case Or(l, r) => c(l) || c(r)
      case Not(inner) => !c(inner)
    }
    c(parse(query))
  }

  /** End-to-end TEXT_MATCH: docs whose `textCol` matches the Lucene-subset
    * `query`. Builds the positional index inline — at scale, pre-build it
    * once (bucketed by token) and call [[compile]] directly. */
  def luceneMatch(docs: DataFrame, textCol: String, idCol: String,
                  query: String): DataFrame = {
    val idx = HybridTable.positionalTextIndex(docs, textCol, idCol)
    val universe = docs.select(col(idCol)).distinct()
    compile(idx, universe, idCol, parse(query))
  }
}
