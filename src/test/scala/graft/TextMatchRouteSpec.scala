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

  private def registered(): Unit = {
    val d = docs
    TextIndexCatalog.register(d, "text", "doc_id",
      HybridTable.positionalTextIndex(d, "text", "doc_id"),
      d.select(col("doc_id")).distinct())
  }

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

  test("mixed marker-OR-ordinary disjunctions: routed results match " +
    "per-row across randomized residuals and marker terms") {
    registered()
    docs.createOrReplaceTempView("tm_docs")
    val terms = Seq("hash", "stream", "\"merge join\"", "sc*", "jion~1")
    val residuals = Seq("doc_id = 4", "doc_id > 3", "doc_id < 2",
      "doc_id % 2 = 0", "doc_id > 99", "length(text) < 18")
    for (t <- terms; r <- residuals) {
      val routed = spark.sql(
        s"""SELECT doc_id FROM tm_docs
            WHERE text_match(text, '${t.replace("'", "''")}') OR $r""")
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"'$t OR $r' did not route:\n$plan")
      val perRow = docs.filter(
        TextMatch.columnFor(col("text"), t) || expr(r))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(routed.collect().map(_.getLong(0)).toSet == perRow,
        s"route/per-row disagree on '$t OR $r'")
    }
  }

  test("an unrelated table with identical column names is NOT routed") {
    registered()
    val s = spark
    import s.implicits._
    // same column names (doc_id, text), different relation + data — the
    // registered index must not answer for it
    Seq((10L, "hash table stream"), (11L, "nothing relevant"))
      .toDF("doc_id", "text").createOrReplaceTempView("tm_other")
    val q = spark.sql(
      "SELECT doc_id FROM tm_other WHERE text_match(text, 'hash AND stream')")
    assert(!q.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "foreign table must lower per-row, not semi-join the wrong index")
    assert(q.collect().map(_.getLong(0)).toSet == Set(10L))
  }

  test("a computed column named like the indexed one is NOT routed") {
    registered()
    // same relation, but 'text' is now a TRANSFORMED column — the raw-text
    // index must not answer for it
    docs.select(col("doc_id"), concat(col("text"), lit(" merge stream"))
      .as("text")).createOrReplaceTempView("tm_derived")
    val q = spark.sql(
      "SELECT doc_id FROM tm_derived WHERE text_match(text, 'merge AND stream')")
    assert(!q.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "computed column must lower per-row")
    // every row gained 'merge stream' — per-row semantics see it
    assert(q.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
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

  test("AND/OR trees of markers route as posting-set algebra, " +
    "including across two indexed columns") {
    val s = spark
    import s.implicits._
    registered()
    docs.createOrReplaceTempView("tm_docs")
    // OR of two separate text_match calls routes (union of id sets):
    // merge → {2}; slow → {4}
    val disj = spark.sql(
      """SELECT doc_id FROM tm_docs
         WHERE text_match(text, 'merge') OR text_match(text, 'slow')""")
    val plan = disj.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join plan:\n$plan")
    assert(disj.collect().map(_.getLong(0)).toSet == Set(2L, 4L))
    // (hash AND stream) OR slow: ({1,3,5} ∩ {2,3}) ∪ {4} = {3,4}
    val tree = spark.sql(
      """SELECT doc_id FROM tm_docs
         WHERE (text_match(text, 'hash') AND text_match(text, 'stream'))
            OR text_match(text, 'slow')""")
    assert(tree.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(tree.collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // TWO indexed columns fused in one OR — a shape a single Lucene
    // query string cannot express: title hits {10}, body hits {11}
    val two = Seq(
      (10L, "alpha report", "nothing here"),
      (11L, "other title", "alpha inside body"),
      (12L, "plain", "plain")).toDF("id", "title", "body")
    TextIndexCatalog.register(two, "title", "id",
      HybridTable.positionalTextIndex(two, "title", "id"),
      two.select(col("id")).distinct())
    TextIndexCatalog.register(two, "body", "id",
      HybridTable.positionalTextIndex(two, "body", "id"),
      two.select(col("id")).distinct())
    two.createOrReplaceTempView("tm_two")
    val multi = spark.sql(
      """SELECT id FROM tm_two
         WHERE text_match(title, 'alpha') OR text_match(body, 'alpha')""")
    assert(multi.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(multi.collect().map(_.getLong(0)).toSet == Set(10L, 11L))
  }

  test("plan-level NOT routes as a universe complement, null text included") {
    val s = spark
    import s.implicits._
    // a NULL-text doc: absent from the postings, present in the universe —
    // NOT must include it (reference stores nulls as the empty string; an
    // empty doc matches no term), and the per-row tier must agree
    val d = Seq((1L, "hash join scan"), (2L, "merge stream"),
      (3L, null.asInstanceOf[String]), (4L, "join order"))
      .toDF("doc_id", "text")
    TextIndexCatalog.register(d, "text", "doc_id",
      HybridTable.positionalTextIndex(d, "text", "doc_id"),
      d.select(col("doc_id")).distinct())
    d.createOrReplaceTempView("tm_not")
    val q = spark.sql(
      "SELECT doc_id FROM tm_not WHERE NOT text_match(text, 'join')")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected routed complement:\n$plan")
    assert(!plan.contains("array_contains"), s"per-row probe leaked:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // per-row twin (no index consulted) agrees row for row
    val perRow = d.filter(!TextMatch.columnFor(col("text"), "join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(perRow == Set(2L, 3L), "two-valued per-row NOT must agree")
    // De Morgan over a composite: NOT (hash OR merge) = {3,4}
    val dm = spark.sql(
      """SELECT doc_id FROM tm_not
         WHERE NOT (text_match(text, 'hash') OR text_match(text, 'merge'))""")
    assert(dm.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(dm.collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // mixed positive AND NOT: join AND NOT hash = {4}
    val mix = spark.sql(
      """SELECT doc_id FROM tm_not
         WHERE text_match(text, 'join') AND NOT text_match(text, 'hash')""")
    assert(mix.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(mix.collect().map(_.getLong(0)).toSet == Set(4L))
  }

  test("NOT over a TWO-COLUMN marker tree routes as one complement") {
    val s = spark
    import s.implicits._
    // the complement's universe is threaded through the set-algebra fold
    // across candidates from two different index entries (title, body) —
    // a doc is in the result iff NEITHER column matches
    val two = Seq(
      (10L, "alpha report", "nothing here"),
      (11L, "other title", "alpha inside body"),
      (12L, "plain", "plain"),
      (13L, null.asInstanceOf[String], "no title text")) // null title
      .toDF("id", "title", "body")
    TextIndexCatalog.register(two, "title", "id",
      HybridTable.positionalTextIndex(two, "title", "id"),
      two.select(col("id")).distinct())
    TextIndexCatalog.register(two, "body", "id",
      HybridTable.positionalTextIndex(two, "body", "id"),
      two.select(col("id")).distinct())
    two.createOrReplaceTempView("tm_two_not")
    val q = spark.sql(
      """SELECT id FROM tm_two_not
         WHERE NOT (text_match(title, 'alpha') OR text_match(body, 'alpha'))""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected routed complement:\n$plan")
    assert(!plan.contains("array_contains"), s"per-row probe leaked:\n$plan")
    // 10 matches via title, 11 via body; 12 and 13 (null title counts as
    // an empty doc) fall in the complement
    assert(q.collect().map(_.getLong(0)).toSet == Set(12L, 13L))
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
      // plan-level NOT through the dialect routes as the complement too
      val n = spark.sql(
        "SELECT doc_id FROM tm_docs WHERE NOT TEXT_MATCH(text, 'merge')")
      assert(n.queryExecution.executedPlan.toString.contains("LeftSemi"))
      assert(n.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 5L))
    } finally spark.conf.unset("spark.graft.sql.dialect")
  }
}
