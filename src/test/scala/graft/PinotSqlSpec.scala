package graft

import graft.operators.NullHandling
import graft.sql.PinotSql
import org.apache.spark.sql.functions._

class PinotSqlSpec extends SparkSpec {

  test("rewrite: TEXT_MATCH / TEXT_CONTAINS / REGEXP_LIKE / JSON_MATCH") {
    assert(PinotSql.rewrite("SELECT * FROM t WHERE TEXT_CONTAINS(txt, 'ab')")
      .contains("contains(txt, 'ab')"))
    assert(PinotSql.rewrite("SELECT * FROM t WHERE TEXT_MATCH(txt, 'a.*b')")
      .contains("txt RLIKE 'a.*b'"))
    assert(PinotSql.rewrite("SELECT * FROM t WHERE REGEXP_LIKE(c, '^x')")
      .contains("c RLIKE '^x'"))
    assert(PinotSql.rewrite(
      "SELECT * FROM t WHERE JSON_MATCH(j, '\"$.a.b\" = ''v''')")
      .contains("get_json_object(j, '$.a.b') = 'v'"))
  }

  test("rewrite: DISTINCTCOUNT / PERCENTILE / MINMAXRANGE / default limit") {
    val s = PinotSql.rewrite(
      "SELECT DISTINCTCOUNT(a) FROM t GROUP BY b")
    assert(s.contains("COUNT(DISTINCT a)"))
    assert(s.endsWith("LIMIT 10"))
    assert(PinotSql.rewrite("SELECT PERCENTILE(x, 95) FROM t")
      .contains("percentile(x, 95 / 100.0)"))
    assert(PinotSql.rewrite("SELECT MINMAXRANGE(x) FROM t")
      .contains("(max(x) - min(x))"))
    // plain aggregations don't get the limit; explicit limits are kept
    assert(!PinotSql.rewrite("SELECT SUM(x) FROM t").contains("LIMIT"))
    assert(PinotSql.rewrite("SELECT a FROM t LIMIT 7").endsWith("LIMIT 7"))
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
    // dialect off: Pinot-isms are NOT intercepted
    intercept[Exception] {
      spark.sql("SELECT DISTINCTCOUNT(o_custkey) FROM orders").collect()
    }
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
  }

  test("rewrite: FIRSTWITHTIME / LASTWITHTIME / renames") {
    assert(PinotSql.rewrite("SELECT LASTWITHTIME(v, ts, 'DOUBLE') FROM t")
      .contains("max_by(v, ts)"))
    assert(PinotSql.rewrite("SELECT FIRSTWITHTIME(v, ts) FROM t")
      .contains("min_by(v, ts)"))
    assert(PinotSql.rewrite("SELECT DISTINCTCOUNTBITMAP(x) FROM t")
      .contains("COUNT(DISTINCT x)"))
    assert(PinotSql.rewrite("SELECT TOEPOCHSECONDS(ts) FROM t")
      .contains("unix_timestamp(ts)"))
    Tables.registerAll(spark, sfDir)
    val df = PinotSql.sql(spark,
      "SELECT user_id, LASTWITHTIME(\"value\", ts, 'DOUBLE') AS lv " +
        "FROM events GROUP BY user_id")
    assert(df.count() > 0)
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
