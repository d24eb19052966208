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
