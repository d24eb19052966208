package graft

import graft.operators.JsonIndex
import graft.rules.JsonIndexCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.BeforeAndAfterEach

class JsonIndexRouteSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = JsonIndexCatalog.clear()

  private val schema = StructType.fromDDL(
    "pri string, tags array<struct<p:string,n:double>>")

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, """{"pri":"HIGH","tags":[{"p":"F","n":1}]}"""),
      (2L, """{"pri":"LOW","tags":[{"p":"F","n":4}]}"""),
      (3L, """{"pri":"HIGH","tags":[{"p":"O","n":5}]}"""),
      (4L, """{"pri":"LOW","tags":[]}"""),
      (5L, """{"pri":"HIGH","tags":[{"p":"F","n":9},{"p":"O","n":0}]}"""))
      .toDF("id", "doc")
  }

  private def registered(): Unit = {
    val d = docs
    JsonIndexCatalog.register(d, "doc", "id",
      JsonIndex.postings(d, "doc", "id", schema),
      d.select(col("id")).distinct())
  }

  test("SQL json_match routes onto the posting table as a semi-join") {
    registered()
    docs.createOrReplaceTempView("jm_docs")
    val q = spark.sql(
      """SELECT id FROM jm_docs WHERE json_match(doc, '"$.pri" = ''HIGH''')
         AND json_match(doc, '"$.tags[*].n" > 3')""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join plan:\n$plan")
    assert(!plan.contains("get_json_object"), s"per-row probe leaked:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSet == Set(3L, 5L))
  }

  test("routed results match per-row results across predicate shapes") {
    registered()
    docs.createOrReplaceTempView("jm_docs")
    val preds = Seq(
      """"$.pri" = 'HIGH'""",
      """"$.tags[*].p" = 'F'""",
      """"$.tags[*].n" > 3""",
      """"$.tags[*].n" <= 1""",
      """"$.pri" != 'LOW'""",
      """"$.tags[*].p" IS NOT NULL""",
      """"$.tags[*].p" IS NULL""")
    for (p <- preds) {
      val viaSql = spark.sql(
        s"SELECT id FROM jm_docs WHERE json_match(doc, '${p.replace("'", "''")}')")
        .collect().map(_.getLong(0)).toSet
      val viaPerRow = docs
        .filter(graft.functions.Scalars.jsonMatch(col("doc"), p))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(viaSql == viaPerRow, s"route/per-row disagree on '$p'")
    }
  }

  test("an unrelated table with identical column names is NOT routed") {
    registered()
    val s = spark
    import s.implicits._
    Seq((10L, """{"pri":"HIGH","tags":[]}"""), (11L, """{"pri":"X","tags":[]}"""))
      .toDF("id", "doc").createOrReplaceTempView("jm_other")
    val q = spark.sql(
      """SELECT id FROM jm_other WHERE json_match(doc, '"$.pri" = ''HIGH''')""")
    assert(!q.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "foreign table must lower per-row, not semi-join the wrong index")
    assert(q.collect().map(_.getLong(0)).toSet == Set(10L))
  }

  test("no covering index → per-row lowering still answers") {
    docs.createOrReplaceTempView("jm_docs")
    val q = spark.sql(
      """SELECT id FROM jm_docs WHERE json_match(doc, '"$.pri" = ''HIGH''')""")
    assert(!q.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(q.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
  }

  test("marker outside a routable conjunct keeps per-row semantics") {
    registered()
    docs.createOrReplaceTempView("jm_docs")
    val disj = spark.sql(
      """SELECT id FROM jm_docs
         WHERE json_match(doc, '"$.pri" = ''HIGH''') OR id = 4""")
      .collect().map(_.getLong(0)).toSet
    assert(disj == Set(1L, 3L, 4L, 5L))
    val proj = spark.sql(
      """SELECT id, json_match(doc, '"$.tags[*].p" = ''O''') AS m
         FROM jm_docs""")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    // empty tags (id 4): the jsonpath yields no values — TWO-VALUED
    // collapse to false ("no posting"), so the per-row lowering agrees
    // with the index tier everywhere, including under NOT
    assert(proj == Map(1L -> Some(false), 2L -> Some(false),
      3L -> Some(true), 4L -> Some(false), 5L -> Some(true)))
  }

  test("AND/OR trees of markers route as posting-set algebra") {
    registered()
    docs.createOrReplaceTempView("jm_docs")
    // (p=F AND n>3) OR pri=HIGH — the disjunctive shape that used to
    // lower per-row; now ids(F) ∩ ids(n>3) ∪ ids(HIGH), one semi-join
    val q = spark.sql(
      """SELECT id FROM jm_docs
         WHERE (json_match(doc, '"$.tags[*].p" = ''F''')
            AND json_match(doc, '"$.tags[*].n" > 3'))
            OR json_match(doc, '"$.pri" = ''HIGH''')""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join plan:\n$plan")
    assert(!plan.contains("get_json_object"), s"per-row probe leaked:\n$plan")
    // ground truth: 2 (F,4>3), 5 (F,9>3 + HIGH), 1/3 (HIGH)
    assert(q.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
    // per-row twin agrees
    val perRow = docs.filter(
      (graft.functions.Scalars.jsonMatch(col("doc"), """"$.tags[*].p" = 'F'""") &&
        graft.functions.Scalars.jsonMatch(col("doc"), """"$.tags[*].n" > 3""")) ||
      graft.functions.Scalars.jsonMatch(col("doc"), """"$.pri" = 'HIGH'"""))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(perRow == Set(1L, 2L, 3L, 5L))
    // a marker OR'd with a NON-marker predicate routes too (round 13 —
    // the reference's OrFilterOperator unions a bitmap child with a
    // scan child): ids(marker) ∪ ids(σ residual), one semi-join
    val mixed = spark.sql(
      """SELECT id FROM jm_docs
         WHERE json_match(doc, '"$.pri" = ''HIGH''') OR id = 4""")
    assert(mixed.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(mixed.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 5L))
    // …but NOT over a mixed tree falls back per-row: the complement of
    // a three-valued residual would wrongly admit NULL-valued rows
    val notMixed = spark.sql(
      """SELECT id FROM jm_docs
         WHERE NOT (json_match(doc, '"$.pri" = ''HIGH''') OR id = 4)""")
    assert(!notMixed.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(notMixed.collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("plan-level NOT routes as a universe complement; missing path and " +
    "NULL doc behave as no-posting (false) in both tiers") {
    val s = spark
    import s.implicits._
    // doc 6 lacks $.pri entirely, doc 7 is a NULL document: neither has a
    // posting, so a positive match is false and its NOT is true — the
    // universe complement and the two-valued per-row lowering agree
    val d = Seq(
      (1L, """{"pri":"HIGH","tags":[{"p":"F","n":1}]}"""),
      (2L, """{"pri":"LOW","tags":[{"p":"F","n":4}]}"""),
      (6L, """{"tags":[{"p":"O","n":2}]}"""),
      (7L, null.asInstanceOf[String])).toDF("id", "doc")
    JsonIndexCatalog.register(d, "doc", "id",
      JsonIndex.postings(d, "doc", "id", schema),
      d.select(col("id")).distinct())
    d.createOrReplaceTempView("jm_not")
    val q = spark.sql(
      """SELECT id FROM jm_not WHERE NOT json_match(doc, '"$.pri" = ''HIGH''')""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected routed complement:\n$plan")
    assert(!plan.contains("get_json_object"), s"per-row probe leaked:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSet == Set(2L, 6L, 7L))
    // per-row tier (no index): identical rows, including 6 and 7
    JsonIndexCatalog.clear()
    val pr = spark.sql(
      """SELECT id FROM jm_not WHERE NOT json_match(doc, '"$.pri" = ''HIGH''')""")
    assert(!pr.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(pr.collect().map(_.getLong(0)).toSet == Set(2L, 6L, 7L))
    // De Morgan across markers: NOT (pri=HIGH OR n>3) = {6,7} ∪ … docs
    // with neither posting — {6,7}; doc 1 has pri=HIGH, doc 2 has n=4
    JsonIndexCatalog.register(d, "doc", "id",
      JsonIndex.postings(d, "doc", "id", schema),
      d.select(col("id")).distinct())
    val dm = spark.sql(
      """SELECT id FROM jm_not
         WHERE NOT (json_match(doc, '"$.pri" = ''HIGH''')
                 OR json_match(doc, '"$.tags[*].n" > 3'))""")
    assert(dm.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(dm.collect().map(_.getLong(0)).toSet == Set(6L, 7L))
  }

  test("bad grammar fails at resolution, not mid-execution") {
    docs.createOrReplaceTempView("jm_docs")
    val e = intercept[Exception](spark.sql(
      """SELECT id FROM jm_docs WHERE json_match(doc, 'pri == HIGH')"""))
    assert(e.getMessage.contains("JSON_MATCH") ||
      Option(e.getCause).exists(_.getMessage.contains("JSON_MATCH")))
  }
}
