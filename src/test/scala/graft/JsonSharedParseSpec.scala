package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GetJsonObject, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{JsonExtractMulti, JsonKernels}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The shared-parse rewrite is only admissible if JsonExtractMulti is
  * BIT-identical to per-call get_json_object on every input — including
  * the rows it answers by delegating to a real GetJsonObject (field on
  * array, wildcard over non-arrays, nested arrays under a wildcard,
  * unparseable documents). */
class JsonSharedParseSpec extends SparkSpec {

  private def gjo(doc: String, path: String): Any =
    GetJsonObject(BoundReference(0, StringType, nullable = false),
      Literal(UTF8String.fromString(path), StringType))
      .eval(InternalRow(UTF8String.fromString(doc)))

  test("kernel parity: JsonExtractMulti == get_json_object per path " +
      "over scalars, arrays, wildcards, fallback regimes, bad json") {
    val docs = Seq(
      """{"k": 69, "s": "plain", "m": {"pri": "1-URGENT", "n": 2}}""",
      """{"tags": [{"p":"F","n":1},{"p":"O","n":7}], "k": "x"}""",
      """{"tags": [{"p":"F"}], "k": 0.50}""",          // single wildcard hit
      """{"tags": [], "k": 1e7}""",                     // empty array
      """{"a": {"b": [1,2,3]}, "t": true, "z": null}""",
      """{"s": "quote\" and \\ and é é", "n": -3.25}""",
      """{"a": [[1,2],[3]]}""",                         // nested arrays → fallback
      """{"a": [1,2], "a2": {"f": 5}}""",               // field-on-array → fallback
      """[1, 2, 3]""",                                  // array root
      """"bare string"""",
      """{"k": 123456789012345678}""",                  // long fidelity
      """not json at all""",                            // unparseable
      """{"deep": {"x": {"y": "v"}}}""")
    val paths = Seq("$.k", "$.s", "$.m.pri", "$.m.n", "$.missing",
      "$.tags[*].p", "$.tags[*].n", "$.tags[0].p", "$.tags[1]",
      "$.a.b", "$.a.b[1]", "$.a.b[*]", "$.a[*]", "$.a.f", "$.a2.f",
      "$.t", "$.z", "$[0]", "$[*]", "$.deep.x", "$.deep.x.y")
    val multi = JsonExtractMulti(
      BoundReference(0, StringType, nullable = false), paths)
    docs.foreach { d =>
      val got = multi.eval(InternalRow(UTF8String.fromString(d)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      paths.zipWithIndex.foreach { case (p, i) =>
        val expect = gjo(d, p)
        val actual = if (got.isNullAt(i)) null else got.getUTF8String(i)
        assert(actual == expect,
          s"path $p over $d: got $actual expected $expect")
      }
    }
  }

  test("kernel parity over the real corpus columns (events.props, " +
      "orders json doc)") {
    val s = spark
    val evDocs = Tables.events(s, sfDir).select(col("props"))
      .collect().map(_.getString(0))
    val ordDocs = Tables.orders(s, sfDir).limit(200).select(concat(
        lit("""{"tags": [{"p": """"), col("o_orderstatus"),
        lit("""", "n": """), col("o_custkey") % 5,
        lit("""}], "meta": {"pri": """"), col("o_orderpriority"),
        lit(""""}}""")).as("doc"))
      .collect().map(_.getString(0))
    val paths = Seq("$.k", "$.missing", "$.tags[*].p", "$.tags[*].n",
      "$.meta.pri")
    val multi = JsonExtractMulti(
      BoundReference(0, StringType, nullable = false), paths)
    (evDocs ++ ordDocs).foreach { d =>
      val got = multi.eval(InternalRow(UTF8String.fromString(d)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      paths.zipWithIndex.foreach { case (p, i) =>
        val actual = if (got.isNullAt(i)) null else got.getUTF8String(i)
        assert(actual == gjo(d, p), s"path $p over $d")
      }
    }
  }

  test("rule: a multi-path projection optimizes to ONE shared parse; " +
      "a multi-predicate filter plants the parse under the filter; " +
      "results unchanged") {
    val s = spark
    val df = s.range(100).select(col("id"), concat(
      lit("""{"k": """), col("id"),
      lit(""", "m": {"pri": "p"""), col("id") % 3, lit(""""}}"""))
      .as("doc"))

    val proj = df.select(col("id"),
      get_json_object(col("doc"), "$.k").as("k"),
      get_json_object(col("doc"), "$.m.pri").as("pri"),
      get_json_object(col("doc"), "$.missing").as("mi"))
    val projPlan = proj.queryExecution.optimizedPlan
    val multis = projPlan.expressions.flatMap(_.collect {
      case m: JsonExtractMulti => m })
    assert(multis.nonEmpty, "projection rewrite did not fire")
    assert(multis.map(_.canonicalized).distinct.size == 1,
      "all extractions must share ONE multi-parse expression")
    assert(projPlan.expressions.forall(_.collect {
      case g: GetJsonObject => g }.isEmpty),
      "no per-path parses may remain in the projection")
    val rows = proj.orderBy(col("id")).collect()
    assert(rows.length == 100)
    assert(rows(7).getString(1) == "7" && rows(7).getString(2) == "p1"
      && rows(7).isNullAt(3))

    val filt = df.filter(
      get_json_object(col("doc"), "$.k") === "3" ||
        get_json_object(col("doc"), "$.m.pri") === "p2")
    val opt = filt.queryExecution.optimizedPlan
    val fMultis = opt.flatMap(_.expressions).flatMap(_.collect {
      case m: JsonExtractMulti => m })
    assert(fMultis.nonEmpty &&
      fMultis.map(_.canonicalized).distinct.size == 1,
      s"filter rewrite must produce one shared extraction:\n" +
        opt.treeString)
    // the sharing pin: 100 rows through a 2-reference predicate must
    // parse 100 documents, not 200 — the other reference hits the
    // kernel's per-thread row memo (plan surgery can't guarantee this;
    // Spark's late pushdown batch re-inlines planted aliases)
    JsonKernels.parses.reset()
    assert(filt.count() == 1 + 33) // id=3, plus ids ≡ 2 (mod 3)
    assert(JsonKernels.parses.sum == 100L,
      s"expected 100 parses for 100 rows, got ${JsonKernels.parses.sum}")
  }

  test("rule leaves single-path and unsupported-path calls alone") {
    val s = spark
    val df = s.range(10).select(concat(lit("""{"k":"""), col("id"),
      lit("}")).as("doc"))
    // one supported path only → no group, stock GetJsonObject remains
    val single = df.select(get_json_object(col("doc"), "$.k").as("k"))
    assert(single.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[GetJsonObject])))
    // "$" is unsupported; the other two still group and share
    assert(JsonKernels.compile("$").isEmpty)
    val mixed = df.select(
      get_json_object(col("doc"), "$").as("whole"),
      get_json_object(col("doc"), "$.k").as("k"),
      get_json_object(col("doc"), "$.j").as("j"))
    val plan = mixed.queryExecution.optimizedPlan
    assert(plan.expressions.exists(
      _.exists(_.isInstanceOf[JsonExtractMulti])))
    assert(plan.expressions.exists(_.exists {
      case GetJsonObject(_, Literal(p: UTF8String, StringType)) =>
        p.toString == "$"
      case _ => false
    }), "the unsupported '$' call must stay on GetJsonObject")
  }
}
