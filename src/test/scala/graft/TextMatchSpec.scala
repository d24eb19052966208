package graft

import graft.operators.TextMatch
import graft.operators.TextMatch._

class TextMatchSpec extends SparkSpec {

  test("parser: operators, precedence, adjacency, phrase, prefix") {
    // AND binds tighter than OR
    assert(parse("a AND b OR c") ==
      Or(And(Term("a"), Term("b")), Term("c")))
    // bare adjacency defaults to OR …
    assert(parse("a b") == Or(Term("a"), Term("b")))
    // … except `a NOT b` which is Lucene's a AND NOT b
    assert(parse("a NOT b") == And(Term("a"), Not(Term("b"))))
    // parens override precedence
    assert(parse("a AND (b OR c)") ==
      And(Term("a"), Or(Term("b"), Term("c"))))
    // phrase + prefix leaves; terms lowercase to match the index
    assert(parse("\"Hash Join\" AND Spar*") ==
      And(Phrase(Seq("hash", "join")), Prefix("spar")))
    // single-word phrase degrades to a term
    assert(parse("\"spark\"") == Term("spark"))
    // unary NOT chains
    assert(parse("NOT NOT a") == Not(Not(Term("a"))))
    // malformed input is rejected, not mis-parsed
    intercept[IllegalArgumentException](parse("(a OR b"))
    intercept[IllegalArgumentException](parse(""))
    // wildcard + fuzzy leaves
    assert(parse("mid*dle") == Wildcard("mid*dle"))
    assert(parse("te?m") == Wildcard("te?m"))
    assert(parse("Term~1") == Fuzzy("term", 1))
    assert(parse("term~") == Fuzzy("term", 2))   // Lucene default edits
    // trailing-* stays on the Prefix fast path
    assert(parse("stream*") == Prefix("stream"))
    intercept[IllegalArgumentException](parse("*"))  // bare wildcard
  }

  test("compile: boolean/phrase/prefix semantics against hand sets") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "hash join table scan"),
      (2L, "merge join stream"),
      (3L, "hash table stream fast"),
      (4L, "slow scan only"),
      (5L, "join hash order")) // "hash join" phrase NOT here (order swapped)
      .toDF("doc_id", "text")

    def run(q: String): Set[Long] =
      TextMatch.luceneMatch(docs, "text", "doc_id", q)
        .collect().map(_.getLong(0)).toSet

    assert(run("\"hash join\"") == Set(1L))            // positional phrase
    assert(run("hash AND stream") == Set(3L))          // conjunction
    assert(run("merge OR slow") == Set(2L, 4L))        // disjunction
    assert(run("str*") == Set(2L, 3L))                 // prefix wildcard
    assert(run("hash NOT scan") == Set(3L, 5L))        // AND NOT adjacency
    assert(run("NOT join") == Set(3L, 4L))             // universe minus
    assert(run("\"hash join\" OR (stream AND NOT merge)") == Set(1L, 3L))
    assert(run("join table") == Set(1L, 2L, 3L, 5L))   // adjacency = OR
    assert(run("\"hash table stream\"") == Set(3L))    // 3-term phrase
  }

  test("compile + columnFor: wildcard and fuzzy semantics") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "stream table merge"),
      (2L, "steam engine term"),
      (3L, "storm term strem"),
      (4L, "unrelated words here"),
      (5L, "team slalom")) .toDF("doc_id", "text")

    def run(q: String): Set[Long] =
      TextMatch.luceneMatch(docs, "text", "doc_id", q)
        .collect().map(_.getLong(0)).toSet
    def runRow(q: String): Set[Long] =
      docs.filter(TextMatch.columnFor(org.apache.spark.sql.functions.col("text"), q))
        .select("doc_id").collect().map(_.getLong(0)).toSet

    val cases = Seq(
      "st*m" -> Set(1L, 2L, 3L),      // stream, steam, storm, strem
      "te?m" -> Set(2L, 3L, 5L),      // term, team
      "s*m" -> Set(1L, 2L, 3L, 5L),   // + slalom
      "term~1" -> Set(2L, 3L, 5L),    // term exact, team 1 edit
      "strem~1" -> Set(1L, 3L),       // stream (1 insertion), strem exact
      "term~1 AND engine" -> Set(2L),
      "NOT te?m" -> Set(1L, 4L))
    for ((q, want) <- cases) {
      assert(run(q) == want, s"postings plan for '$q'")
      assert(runRow(q) == want, s"per-row plan for '$q'")
    }
  }

  test("compile: no cartesian products in any compiled plan") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val plans = Seq("a AND b", "a OR b", "NOT a", "\"a b\" AND c*",
      "a NOT b").map(q =>
      TextMatch.luceneMatch(docs, "text", "doc_id", q)
        .queryExecution.executedPlan.toString)
    plans.foreach(p =>
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p"))
  }
}
