package graft

import graft.operators.NullHandling
import graft.sql.PinotSql
import org.apache.spark.sql.functions._

class PinotSqlSpec extends SparkSpec {

  test("dialect: TEXT_MATCH (Lucene) / TEXT_CONTAINS / JSON_MATCH") {
    val s = spark
    import s.implicits._
    Seq((1L, "hash join table", """{"a":{"b":"v"},"xs":[{"k":"z"}]}"""),
      (2L, "merge sort", """{"a":{"b":"w"},"xs":[{"k":"y"}]}"""))
      .toDF("id", "txt", "j").createOrReplaceTempView("dial_t")
    def one(q: String): Set[Long] =
      PinotSql.sql(spark, q).collect().map(_.getLong(0)).toSet
    assert(one("SELECT id FROM dial_t WHERE TEXT_CONTAINS(txt, 'join')")
      == Set(1L))
    // TEXT_MATCH is the reference's Lucene grammar, not a regex
    assert(one(
      "SELECT id FROM dial_t WHERE TEXT_MATCH(txt, '\"hash join\" OR mer*')")
      == Set(1L, 2L))
    assert(one("SELECT id FROM dial_t WHERE TEXT_MATCH(txt, 'table NOT sort')")
      == Set(1L))
    assert(one("SELECT id FROM dial_t WHERE REGEXP_LIKE(txt, '^m.*t$')")
      == Set(2L))
    assert(one(
      "SELECT id FROM dial_t WHERE JSON_MATCH(j, '\"$.a.b\" = ''v''')")
      == Set(1L))
    // array wildcard predicates reach the SQL dialect too
    assert(one(
      "SELECT id FROM dial_t WHERE JSON_MATCH(j, '\"$.xs[*].k\" = ''y''')")
      == Set(2L))
  }

  test("dialect: DISTINCTCOUNT (nested args) / PERCENTILE / default limit") {
    Tables.registerAll(spark, sfDir)
    // nested call arguments parse natively — the old regex hazard
    val nested = PinotSql.sql(spark,
      """SELECT DISTINCTCOUNT(lower(o_orderpriority)) AS nd,
         MINMAXRANGE(o_totalprice) AS rng FROM orders""").head()
    assert(nested.getLong(0) == 5L)
    assert(nested.getDouble(1) > 0)
    // PERCENTILE fraction is 0-100 in the dialect
    val p = PinotSql.sql(spark,
      "SELECT PERCENTILE(o_totalprice, 100) AS p100 FROM orders").head()
    val mx = PinotSql.sql(spark,
      "SELECT MAX(o_totalprice) AS mx FROM orders").head()
    assert(p.getDouble(0) == mx.getDouble(0))
    // default LIMIT 10 on selections; explicit limits kept; plain agg free
    assert(PinotSql.sql(spark, "SELECT o_orderkey FROM orders").count() == 10)
    assert(PinotSql.sql(spark,
      "SELECT o_orderkey FROM orders LIMIT 7").count() == 7)
    assert(PinotSql.sql(spark,
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey").count() == 10)
    // group-by selections are capped too (reference default)
    assert(PinotSql.sql(spark,
      "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey")
      .count() == 10)
    // CTE-wrapped shapes look through the UnresolvedWith root: a plain
    // aggregate stays uncapped, an explicit CTE limit is NOT re-capped
    val cteAgg = PinotSql.sql(spark,
      """WITH t AS (SELECT * FROM orders)
         SELECT COUNT(*) AS n FROM t""").head()
    assert(cteAgg.getLong(0) > 10L, "CTE plain agg must not take LIMIT 10")
    assert(PinotSql.sql(spark,
      """WITH t AS (SELECT * FROM orders)
         SELECT o_orderkey FROM t LIMIT 13""").count() == 13)
    // a CTE selection without a limit still gets the default cap
    assert(PinotSql.sql(spark,
      """WITH t AS (SELECT * FROM orders)
         SELECT o_orderkey FROM t""").count() == 10)
    // ORDER BY around a plain agg stays uncapped too
    assert(PinotSql.sql(spark,
      "SELECT COUNT(*) AS n FROM orders ORDER BY n").head().getLong(0) > 10L)
    // IN_SUBQUERY lowers in the parse tree (its arg IS sql text)
    assert(PinotSql.sql(spark,
      """SELECT COUNT(*) AS n FROM orders WHERE IN_SUBQUERY(o_custkey,
        'SELECT c_custkey FROM customer WHERE c_nationkey = 1') = 1""")
      .head().getLong(0) > 0)
  }

  test("IN_SUBQUERY: parse-tree lowering handles nested quoted literals, " +
      "= 0 negation, and reversed operands") {
    Tables.registerAll(spark, sfDir)
    // a quoted string literal INSIDE the subquery text (doubled quotes) —
    // the old regex splice truncated at the first inner quote
    val n1 = PinotSql.sql(spark,
      """SELECT COUNT(*) AS n FROM orders WHERE IN_SUBQUERY(o_custkey,
        'SELECT c_custkey FROM customer WHERE c_mktsegment = ''BUILDING''') = 1""")
      .head().getLong(0)
    val direct = spark.sql(
      """SELECT COUNT(*) AS n FROM orders WHERE o_custkey IN
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""")
      .head().getLong(0)
    assert(n1 == direct && n1 > 0)
    // = 0 negates; 1 = IN_SUBQUERY(...) (reversed operands) also lowers
    val total = spark.sql("SELECT COUNT(*) FROM orders").head().getLong(0)
    val n0 = PinotSql.sql(spark,
      """SELECT COUNT(*) AS n FROM orders WHERE IN_SUBQUERY(o_custkey,
        'SELECT c_custkey FROM customer WHERE c_mktsegment = ''BUILDING''') = 0""")
      .head().getLong(0)
    assert(n0 == total - n1)
    assert(PinotSql.sql(spark,
      """SELECT COUNT(*) AS n FROM orders WHERE 1 = IN_SUBQUERY(o_custkey,
        'SELECT c_custkey FROM customer WHERE c_nationkey = 1')""")
      .head().getLong(0) > 0)
    // any comparand other than 1/0 must NOT silently lower to NOT IN —
    // the reference function yields 1/0, so `= 5` is a constant-false
    // predicate; the rewrite leaves it alone and it fails naturally at
    // analysis (no runtime in_subquery function exists)
    val e = intercept[Exception] {
      PinotSql.sql(spark,
        """SELECT COUNT(*) AS n FROM orders WHERE IN_SUBQUERY(o_custkey,
          'SELECT c_custkey FROM customer WHERE c_nationkey = 1') = 5""")
        .head()
    }
    assert(e.getMessage.toLowerCase.contains("in_subquery"), e.getMessage)
  }

  test("OPTION(...) clauses strip, land as confs, and gate star-tree") {
    Tables.registerAll(spark, sfDir)
    // trailing OPTION parses instead of erroring; options become confs
    assert(PinotSql.sql(spark,
      "SELECT o_orderkey FROM orders OPTION(timeoutMs=1000)").count() == 10)
    assert(spark.conf.get("spark.graft.option.timeoutMs") == "1000")
    // multiple entries + stacked clauses + quoted values
    assert(PinotSql.sql(spark,
      """SELECT COUNT(*) AS n FROM orders
         OPTION(numReplicaGroupsToQuery=2, maxExecutionThreads=4)
         OPTION(explainAskingServers='true')""").head().getLong(0) > 0)
    assert(spark.conf.get("spark.graft.option.maxExecutionThreads") == "4")
    assert(spark.conf.get("spark.graft.option.explainAskingServers") == "true")
    // malformed entries are rejected loudly
    intercept[IllegalArgumentException](PinotSql.sql(spark,
      "SELECT 1 OPTION(nonsense)"))
    // modern form: leading SET k=v; statements, quoted or bare values
    assert(PinotSql.sql(spark,
      """SET useMultistageEngine=true; SET workloadName='adhoc';
         SELECT COUNT(*) AS n FROM orders""").head().getLong(0) > 0)
    assert(spark.conf.get("spark.graft.option.useMultistageEngine") == "true")
    assert(spark.conf.get("spark.graft.option.workloadName") == "adhoc")

    // useStarTree=false disables summary routing for the session
    val factPath = s"$sfDir/lineitem.parquet"
    val facts = spark.read.parquet(factPath)
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft-st-opt").toString
    graft.operators.StarTree.build(facts,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.operators.StarTree.Metric("l_quantity", Seq("sum"))))
      .write.mode("overwrite").parquet(s"$sumDir/sum")
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
    try {
      graft.rules.StarTreeCatalog.register(Set(s"file:$factPath"),
        Set("l_returnflag", "l_linestatus"),
        spark.read.parquet(s"$sumDir/sum"))
      // queryExecution memoizes the optimized plan — build a fresh
      // aggregate per probe
      def agg = facts.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"))
      assert(scannedFiles(agg).exists(_.contains("graft-st-opt")),
        "baseline: fitting aggregate routes to the summary")
      PinotSql.sql(spark, "SELECT 1 OPTION(useStarTree=false)").collect()
      assert(scannedFiles(agg).exists(_.contains("lineitem")),
        "useStarTree=false must scan the facts")
      PinotSql.sql(spark, "SELECT 1 OPTION(useStarTree=true)").collect()
      assert(scannedFiles(agg).exists(_.contains("graft-st-opt")),
        "useStarTree=true restores routing")
    } finally {
      graft.rules.StarTreeCatalog.clear()
      spark.conf.unset("spark.graft.option.useStarTree")
    }
  }

  test("plan-bound options: interleaved statements keep their own options") {
    Tables.registerAll(spark, sfDir)
    val factPath = s"$sfDir/lineitem.parquet"
    val facts = spark.read.parquet(factPath)
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft-st-bind").toString
    graft.operators.StarTree.build(facts,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.operators.StarTree.Metric("l_quantity", Seq("sum"))))
      .write.mode("overwrite").parquet(s"$sumDir/sum")
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
    try {
      graft.rules.StarTreeCatalog.register(Set(s"file:$factPath"),
        Set("l_returnflag", "l_linestatus"),
        spark.read.parquet(s"$sumDir/sum"))
      val q = """SELECT l_returnflag, SUM(l_quantity) AS s
                 FROM lineitem GROUP BY l_returnflag"""
      // statement 1 parses with useStarTree=false…
      val noSt = PinotSql.sql(spark, s"$q OPTION(useStarTree=false)")
      // …then statement 2 parses with useStarTree=true BEFORE 1 executes.
      // Conf-only semantics would leak 2's options into 1's optimization;
      // plan-bound options keep each statement's own.
      val withSt = PinotSql.sql(spark, s"$q OPTION(useStarTree=true)")
      assert(spark.conf.get("spark.graft.option.useStarTree") == "true")
      assert(scannedFiles(noSt).exists(_.contains("lineitem")),
        "statement parsed with useStarTree=false must scan facts even " +
          "after a later statement parsed useStarTree=true")
      assert(scannedFiles(withSt).exists(_.contains("graft-st-bind")),
        "statement parsed with useStarTree=true routes to the summary")
      // both still execute correctly (marker erased at physical planning)
      assert(noSt.collect().map(_.getString(0)).sorted.toSeq ==
        withSt.collect().map(_.getString(0)).sorted.toSeq)
      // DataFrame-API plans (no statement) still follow the session conf
      def apiAgg = facts.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"))
      assert(scannedFiles(apiAgg).exists(_.contains("graft-st-bind")),
        "conf fallback: API plan routes while conf says true")
    } finally {
      graft.rules.StarTreeCatalog.clear()
      spark.conf.unset("spark.graft.option.useStarTree")
    }
  }

  test("Pinot datetime transforms resolve through the SQL registry") {
    // 2024-03-15 12:34:56 UTC = 1710506096000 ms
    val r = spark.sql(
      """SELECT
         TIMECONVERT(1710506096, 'SECONDS', 'MILLISECONDS') AS ms,
         TIMECONVERT(1710506096000, 'MILLISECONDS', 'HOURS') AS hrs,
         DATETRUNC('day', 1710506096000) AS day_ms,
         DATETRUNC('hour', 1710506096, 'SECONDS') AS hour_s,
         TODATETIME(1710506096000, 'yyyy-MM-dd HH:mm') AS fmt,
         FROMDATETIME('2024-03-15 12:34:56', 'yyyy-MM-dd HH:mm:ss') AS back,
         DATETIMECONVERT(1710506096000, '1:MILLISECONDS:EPOCH',
           '1:HOURS:EPOCH', '1:HOURS') AS dtc_hrs,
         YEAROFWEEK(TIMESTAMP '2021-01-01 00:00:00') AS yow
      """).head()
    assert(r.getLong(0) == 1710506096000L)
    assert(r.getLong(1) == 1710506096000L / 3600000L)
    assert(r.getLong(2) == 1710460800000L) // 2024-03-15 00:00 UTC
    assert(r.getLong(3) == 1710504000L)    // 12:00 UTC, in seconds
    assert(r.getString(4) == "2024-03-15 12:34")
    assert(r.getLong(5) == 1710506096000L)
    assert(r.getLong(6) == 1710506096000L / 3600000L)
    assert(r.getInt(7) == 2020) // ISO week 53 of 2020
  }

  test("options-only statement applies options, yields empty result") {
    // standalone `SET k=v;` — nothing left after extraction: no parse of ""
    val out = PinotSql.sql(spark, "SET timeoutMs=5000;")
    assert(out.count() == 0)
    assert(spark.conf.get("spark.graft.option.timeoutMs") == "5000")
    // dialect parser path: same statement through spark.sql
    spark.conf.set("spark.graft.sql.dialect", "pinot")
    try {
      assert(spark.sql("SET workloadName='x';").count() == 0)
      assert(spark.conf.get("spark.graft.option.workloadName") == "x")
    } finally spark.conf.unset("spark.graft.sql.dialect")
    // per-statement scoping: the NEXT statement resets stale option keys
    PinotSql.sql(spark, "SELECT 1 AS x OPTION(useStarTree=false)").collect()
    assert(spark.conf.getOption("spark.graft.option.timeoutMs").isEmpty,
      "stale options must not leak into later statements")
    assert(spark.conf.getOption("spark.graft.option.workloadName").isEmpty)
    assert(spark.conf.get("spark.graft.option.useStarTree") == "false")
    // an option-free statement starts from defaults too
    PinotSql.sql(spark, "SELECT 1 AS x").collect()
    assert(spark.conf.getOption("spark.graft.option.useStarTree").isEmpty)
  }

  test("GAPFILL SQL routes to the spine+window gapfill plan") {
    val s = spark
    import s.implicits._
    Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 3.0),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 5.0))
      .toDF("k", "bucket", "v").createOrReplaceTempView("gf_t")
    val out = PinotSql.sql(spark,
      """SELECT GAPFILL(bucket, '2024-01-01 00:00:00',
        '2024-01-01 02:00:00', 3600), k,
        FILL(v, 'FILL_PREVIOUS_VALUE') FROM gf_t""")
      .orderBy(col("k"), col("bucket")).collect()
    assert(out.length == 6) // 2 keys × 3 hourly buckets
    val aRow1 = out(1) // a @ 01:00 — gap, fills from 00:00
    assert(aRow1.getAs[Double]("v") == 1.0)
    val bRow0 = out(3) // b @ 00:00 — nothing previous, stays null
    assert(bRow0.isNullAt(bRow0.fieldIndex("v")))
  }

  test("GAPFILL FILL mode matching is case-insensitive") {
    val s = spark
    import s.implicits._
    Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "bucket", "v").createOrReplaceTempView("gf_ci")
    val out = PinotSql.sql(spark,
      """SELECT GAPFILL(bucket, '2024-01-01 00:00:00',
        '2024-01-01 01:00:00', 3600), k,
        fill(v, 'fill_previous_value') FROM gf_ci""")
      .orderBy(col("bucket")).collect()
    assert(out.length == 2 && out(1).getAs[Double]("v") == 1.0)
  }

  test("injectParser: Pinot dialect gated on spark.graft.sql.dialect") {
    Tables.registerAll(spark, sfDir)
    // dialect off: statement-level Pinot-isms are NOT intercepted —
    // percentile keeps Spark's [0,1] fraction contract and rejects 95
    intercept[Exception] {
      spark.sql("SELECT percentile(o_totalprice, 95) FROM orders").collect()
    }
    // dialect off: no default LIMIT injection
    assert(spark.sql("SELECT o_orderkey FROM orders").count() > 10)
    spark.conf.set("spark.graft.sql.dialect", "pinot")
    try {
      val r = spark.sql(
        """SELECT o_orderpriority, DISTINCTCOUNT(o_custkey) AS nd,
           MINMAXRANGE(o_totalprice) AS rng
           FROM orders GROUP BY o_orderpriority""").collect()
      assert(r.length <= 10 && r.length > 0) // default LIMIT 10 applied
      assert(r.forall(_.getLong(1) > 0))
      // theta mapping parses and runs through the same path
      val t = spark.sql(
        "SELECT DISTINCTCOUNTTHETASKETCH(o_custkey) AS nd FROM orders")
        .head().getLong(0)
      val exact = spark.sql(
        "SELECT COUNT(DISTINCT o_custkey) AS nd FROM orders")
        .head().getLong(0)
      assert(t == exact) // exact mode under the nominal-entry budget
    } finally spark.conf.unset("spark.graft.sql.dialect")
    // gate restored: standard SQL untouched again
    assert(spark.sql("SELECT 1 AS one").head().getInt(0) == 1)
  }

  test("GraftExtensions: engine functions resolve from spark.sql by name") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F,2.0F), array(2.0F,3.0F)) AS d, " +
        "hash60('abc') AS h, strcmp('a','b') AS c, " +
        "lang_id('the cat is on the mat') AS l, " +
        "token_count('a b c') AS t").head()
    assert(r.getDouble(0) == 8.0)
    assert(r.getLong(1) == 648541476951500027L)
    assert(r.getInt(2) == -1)
    assert(r.getString(3) == "en")
    assert(r.getInt(4) == 3)
    val r2 = spark.sql(
      "SELECT subword_count('alpha beta gamma') AS sw, " +
        "hamming64(simhash16('a b c'), simhash16('a b c')) AS h0").head()
    assert(r2.getLong(0) == 5L) // ceil(5/4)+ceil(4/4)+ceil(5/4) = 2+1+2
    assert(r2.getAs[Number](1).longValue == 0L)
    val r3 = spark.sql(
      "SELECT gopher_signals('the cat and the dog have fun') AS g, " +
        "image_hash(CAST('junk' AS BINARY)) AS ih").head()
    assert(r3.getStruct(0).getAs[Int]("stop_hits") == 3)
    assert(r3.isNullAt(1)) // undecodable binary → null hash
    val r4 = spark.sql(
      "SELECT canonicalize('  Héllo,  WORLD_9!  ') AS c").head()
    assert(r4.getString(0) == "h llo world 9")
  }

  test("dialect: FIRSTWITHTIME / LASTWITHTIME / renames resolve") {
    Tables.registerAll(spark, sfDir)
    val df = PinotSql.sql(spark,
      "SELECT user_id, LASTWITHTIME(\"value\", ts, 'DOUBLE') AS lv, " +
        "FIRSTWITHTIME(\"value\", ts, 'DOUBLE') AS fv " +
        "FROM events GROUP BY user_id")
    assert(df.count() > 0)
    val r = PinotSql.sql(spark,
      "SELECT DISTINCTCOUNTBITMAP(o_custkey) AS ndb, " +
        "DISTINCTCOUNTHLL(o_custkey) AS ndh, " +
        "ARRAYLENGTH(array(1,2,3)) AS al, " +
        "TOEPOCHSECONDS(TIMESTAMP '1970-01-01 00:01:40') AS es " +
        "FROM orders").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getInt(2) == 3 && r.getLong(3) == 100L)
  }

  test("pinot-dialect query runs end-to-end") {
    Tables.registerAll(spark, sfDir)
    val df = PinotSql.sql(spark,
      "SELECT l_returnflag, DISTINCTCOUNT(l_partkey) AS nd FROM lineitem " +
        "GROUP BY l_returnflag")
    assert(df.count() > 0)
  }

  test("sentinel fill applies Pinot defaults, withNulls reverses") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1), Some("a")), (None, None))
      .toDF("m", "d")
    val filled = NullHandling.sentinelFill(df, metrics = Set("m"))
    val r = filled.orderBy(col("m")).collect()
    assert(r.map(_.get(0)).toSet == Set(0, 1))
    assert(r.map(_.get(1)).toSet == Set("a", "null"))
    val restored = filled.select(
      NullHandling.withNulls(col("m"),
        org.apache.spark.sql.types.IntegerType, metric = true).as("m"))
    assert(restored.filter(col("m").isNull).count() == 1)
  }
}
