package graft

import graft.operators.{HybridTable, TextMatch}
import graft.rules.TextIndexCatalog
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

class TextMatchRouteSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = TextIndexCatalog.clear()

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "hash join table scan"),
      (2L, "merge join stream"),
      (3L, "hash table stream fast"),
      (4L, "slow scan only"),
      (5L, "join hash order")).toDF("doc_id", "text")
  }

  private def registered(): Unit = TextIndexCatalog.register(
    "text", "doc_id",
    HybridTable.positionalTextIndex(docs, "text", "doc_id"),
    docs.select(col("doc_id")).distinct())

  test("SQL text_match routes onto the postings index as a semi-join") {
    registered()
    docs.createOrReplaceTempView("tm_docs")
    val q = spark.sql(
      "SELECT doc_id FROM tm_docs WHERE text_match(text, 'hash AND stream')")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join plan:\n$plan")
    // the routed plan consults the index, not the text column per row
    assert(!plan.contains("array_contains"), s"per-row probe leaked:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("routed results match per-row results across the grammar") {
    registered()
    docs.createOrReplaceTempView("tm_docs")
    val queries = Seq(
      "hash AND stream", "merge OR slow", "\"hash join\"", "str*",
      "hash NOT scan", "NOT join", "st*m", "te?m OR f?st", "strem~1")
    for (g <- queries) {
      val viaSql = spark.sql(
        s"SELECT doc_id FROM tm_docs WHERE text_match(text, '$g')")
        .collect().map(_.getLong(0)).toSet
      val viaPerRow = docs
        .filter(TextMatch.columnFor(col("text"), g))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaSql == viaPerRow, s"route/per-row disagree on '$g'")
    }
  }

  test("no covering index → per-row lowering still answers") {
    // nothing registered: same SQL, same results, no join in the plan
    docs.createOrReplaceTempView("tm_docs")
    val q = spark.sql(
      "SELECT doc_id FROM tm_docs WHERE text_match(text, 'hash AND stream')")
    assert(!q.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(q.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("marker outside a routable conjunct keeps per-row semantics") {
    registered()
    docs.createOrReplaceTempView("tm_docs")
    // projection position and OR-disjunct position can't semi-join
    val proj = spark.sql(
      "SELECT doc_id, text_match(text, 'hash') AS m FROM tm_docs")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(proj == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true))
    val disj = spark.sql(
      """SELECT doc_id FROM tm_docs
         WHERE text_match(text, 'merge') OR doc_id = 4""")
      .collect().map(_.getLong(0)).toSet
    assert(disj == Set(2L, 4L))
  }

  test("bad grammar fails at resolution, not mid-execution") {
    docs.createOrReplaceTempView("tm_docs")
    val e = intercept[Exception](spark.sql(
      "SELECT doc_id FROM tm_docs WHERE text_match(text, '(a OR b')"))
    assert(e.getMessage.contains("unbalanced") ||
      Option(e.getCause).exists(_.getMessage.contains("unbalanced")))
  }

  test("pinot dialect TEXT_MATCH accepts the full grammar end-to-end") {
    registered()
    docs.createOrReplaceTempView("tm_docs")
    spark.conf.set("spark.graft.sql.dialect", "pinot")
    try {
      val q = spark.sql(
        "SELECT doc_id FROM tm_docs WHERE TEXT_MATCH(text, 'st*m AND NOT merge')")
      assert(q.queryExecution.executedPlan.toString.contains("LeftSemi"))
      assert(q.collect().map(_.getLong(0)).toSet == Set(3L))
    } finally spark.conf.unset("spark.graft.sql.dialect")
  }
}
