package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes classifier: predictions, smoothing, priors,
  * tie-breaks, and the zero-token prior-only path. */
class ClassifierSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def corpus = Seq(
    // "en" docs dominated by en-tokens, "fr" by fr-tokens
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog ate the food"),
    (3L, "en", "cat and dog and mat"),
    (4L, "fr", "le chat et le chien"),
    (5L, "fr", "le chien mange le pain"),
    (6L, "fr", "chat et pain et chien")
  ).toDF("doc_id", "lang", "text")

  test("nbClassify: distinctive vocabulary recovers the label") {
    val te = Seq(
      (10L, "the cat and the dog"),   // en vocabulary
      (11L, "le chat et le pain")     // fr vocabulary
    ).toDF("doc_id", "text")
    val got = Classifier.nbClassify(corpus, te, "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(10L -> "en", 11L -> "fr"))
    assert(got.forall(_.getLong(3) == 5L)) // n_tokens
  }

  test("nbClassify: zero-token doc classifies by prior alone") {
    // skew priors: 3 extra en docs -> P(en) > P(fr)
    val tr = corpus.unionAll(Seq(
      (7L, "en", "mat food dog"), (8L, "en", "cat food"),
      (9L, "en", "dog mat")).toDF("doc_id", "lang", "text"))
    val te = Seq((20L, "")).toDF("doc_id", "text")
    val got = Classifier.nbClassify(tr, te, "text", "lang", "doc_id")
      .collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "en")
    assert(got.head.getLong(3) == 0L)
  }

  test("nbClassify: unseen tokens only -> smoothed-zero likelihoods, " +
    "deterministic label-ascending tie-break on equal scores") {
    // both classes have identical token totals and doc counts, so a doc
    // of entirely-unseen tokens scores identically under each class and
    // the tie must break to the ascending label
    val tr = Seq(
      (1L, "aa", "x x x"), (2L, "aa", "y y y"),
      (3L, "bb", "p p p"), (4L, "bb", "q q q")
    ).toDF("doc_id", "lang", "text")
    val te = Seq((30L, "zz ww")).toDF("doc_id", "text")
    val got = Classifier.nbClassify(tr, te, "text", "lang", "doc_id")
      .collect()
    assert(got.head.getString(1) == "aa")
    assert(got.head.getLong(3) == 2L)
  }

  test("nbClassify: minCount prunes the vocabulary (V, totals, counts)") {
    // "cat" appears 3×, "mat" 2×, "rare" 1× in train; minCount=2 keeps
    // {the×?…}: every token with total count >= 2 survives, "rare" and
    // other singletons leave V and the label token-mass
    val tr = Seq(
      (1L, "en", "cat cat mat"), (2L, "en", "cat mat rare"),
      (3L, "fr", "chien chien chat"), (4L, "fr", "chien chat solo")
    ).toDF("doc_id", "lang", "text")
    val te = Seq((50L, "cat mat"), (51L, "chien chat")).toDF("doc_id", "text")
    val pruned = Classifier.nbClassify(tr, te, "text", "lang", "doc_id",
      minCount = 2L).orderBy("doc_id").collect()
    assert(pruned.map(_.getString(1)).toSeq == Seq("en", "fr"))
    // hand-check doc 50 under the pruned model: vocab {cat,mat,chien,
    // chat} → V=4; en totals = 3+2 = 5 (rare pruned); p(cat|en) =
    // (3+1)/(5+4), p(mat|en) = (2+1)/(5+4); prior ln(0.5)
    def u6(x: Double) = math.round(math.rint(math.log(x) * 1e6))
    val expect50 = u6(0.5) + u6(4.0 / 9) + u6(3.0 / 9)
    assert(pruned.head.getLong(2) == expect50,
      s"got ${pruned.head.getLong(2)}, want $expect50")
    // minCount=1 default is the unpruned model: scores differ (V=6)
    val full = Classifier.nbClassify(tr, te, "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    assert(full.head.getLong(2) != expect50)
    // a pruned-away token scores as unseen: smoothed zero, still counted
    val te2 = Seq((60L, "rare rare")).toDF("doc_id", "text")
    val g2 = Classifier.nbClassify(tr, te2, "text", "lang", "doc_id",
      minCount = 2L).collect()
    assert(g2.head.getLong(3) == 2L)
  }

  test("nbClassify: a fully-pruned class survives on its prior; " +
    "all-pruned vocabulary degrades to prior-only") {
    // class "bb"'s tokens are all singletons: minCount=2 prunes its
    // entire token mass, but the class must stay in the model — its
    // prior (3 of 4 docs) has to beat "aa" for an all-unseen test doc
    val tr = Seq(
      (1L, "aa", "x x x"),
      (2L, "bb", "p q"), (3L, "bb", "r t"), (4L, "bb", "u w")
    ).toDF("doc_id", "lang", "text")
    val te = Seq((80L, "zz ww")).toDF("doc_id", "text")
    val got = Classifier.nbClassify(tr, te, "text", "lang", "doc_id",
      minCount = 2L).collect()
    assert(got.length == 1 && got.head.getString(1) == "bb",
      s"pruned-out class must still win on prior: ${got.toSeq}")
    // minCount above EVERY token's count: empty vocabulary — every doc
    // classifies by prior alone, nothing divides by zero
    val got2 = Classifier.nbClassify(tr, te, "text", "lang", "doc_id",
      minCount = 100L).collect()
    assert(got2.head.getString(1) == "bb")
    // prior-only score: ln(3/4) scaled
    val expect = math.round(math.rint(math.log(0.75) * 1e6))
    assert(got2.head.getLong(2) == expect)
  }

  test("nbClassify: count-table join is broadcast under the guard, " +
    "shuffle-join above it") {
    // the result frame is checkpointed (plan truncated), so the guard is
    // asserted behaviorally: both join shapes must produce bit-identical
    // scores — the hint changes the plan, never the result
    val te = Seq((70L, "the cat"), (71L, "le chat")).toDF("doc_id", "text")
    val wide = Classifier.nbClassify(corpus, te, "text", "lang", "doc_id",
      broadcastCountMax = 5000000L).orderBy("doc_id").collect()
    val narrow = Classifier.nbClassify(corpus, te, "text", "lang", "doc_id",
      broadcastCountMax = 0L).orderBy("doc_id").collect()
    assert(wide.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == narrow.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
    assert(wide.head.getString(1) == "en")
  }

  test("nbClassify: scores are integer-scaled and order-free") {
    val te = Seq((40L, "the cat"), (41L, "le chat")).toDF("doc_id", "text")
    val a = Classifier.nbClassify(corpus, te, "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    // repartitioned input must produce the identical scaled scores
    val b = Classifier.nbClassify(corpus.repartition(7), te.repartition(3),
        "text", "lang", "doc_id")
      .orderBy("doc_id").collect()
    assert(a.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
  }
}
