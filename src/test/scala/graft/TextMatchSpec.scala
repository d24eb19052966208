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
