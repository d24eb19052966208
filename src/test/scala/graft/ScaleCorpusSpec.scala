package graft

import graft.sources.ScaleCorpus
import org.apache.spark.sql.functions._

/** Deterministic scale-stress expansion: replicas must preserve internal
  * structure exactly (that is what makes the scale curves attributable to
  * the operators) while staying mutually disjoint (so true dup/pair mass
  * scales linearly with the factor). */
class ScaleCorpusSpec extends SparkSpec {

  test("expandDocuments: factor× rows, disjoint ids, disjoint token " +
      "namespaces, replica-internal dup structure preserved") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat", "en", "web", 11L),
      (2L, "the cat sat", "en", "web", 11L), // exact dup of 1
      (3L, "something else", "en", "web", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val x = ScaleCorpus.expandDocuments(docs, 3)
    assert(x.count() == 9)
    assert(x.select("doc_id").distinct().count() == 9)
    // replica 0 is the ORIGINAL rows, byte-identical
    assert(x.filter(col("doc_id") <= 3L).collect().map(_.toSeq).toSet ==
      docs.collect().map(_.toSeq).toSet)
    // no token crosses replica namespaces
    val tokensByRep = x.select(
        (col("doc_id") / ScaleCorpus.IdStride).cast("int").as("rep"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count_distinct(col("rep")).as("n"))
    assert(tokensByRep.filter(col("n") > 1).count() == 0)
    // the exact-dup group replicates per replica: 3 groups of 2
    val dups = x.groupBy("text").count().filter(col("count") > 1)
    assert(dups.count() == 3)
    // deterministic: a second expansion is identical
    assert(ScaleCorpus.expandDocuments(docs, 3).collect().map(_.toSeq).toSet
      == x.collect().map(_.toSeq).toSet)
  }

  test("expandEmbeddings: sign-flip isometry preserves norms and " +
      "replica-internal distances; distinct replicas differ") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f), 0),
      (2L, Array(-1f, 0.5f, 2f, -3f, 1f, 0f, 2f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
    val x = ScaleCorpus.expandEmbeddings(emb, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(x.size == 8)
    def norm(v: Seq[Float]) = math.sqrt(v.map(a => a * a.toDouble).sum)
    def dist(a: Seq[Float], b: Seq[Float]) =
      math.sqrt(a.zip(b).map { case (p, q) => (p - q) * (p - q).toDouble }.sum)
    for (r <- 1 until 4) {
      val o = ScaleCorpus.IdStride * r
      // norms preserved exactly (sign flips only)
      assert(math.abs(norm(x(1L + o)) - norm(x(1L))) < 1e-6)
      // within-replica distance == original distance (isometry)
      assert(math.abs(dist(x(1L + o), x(2L + o)) - dist(x(1L), x(2L))) < 1e-5)
      // but the replica is NOT the original vector
      assert(x(1L + o) != x(1L))
    }
    // distinct replicas differ from each other too
    assert(x(1L + ScaleCorpus.IdStride) != x(1L + 2 * ScaleCorpus.IdStride))
  }
}
