package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The interpreted-expression tripwire itself must be trustworthy: a
  * detector that misses HOFs re-opens the round-13 hole (a 24.9 s close
  * headline from silent per-row interpreted eval), one that cries wolf
  * on clean codegen plans would train everyone to ignore the block. */
class PlanLintSpec extends SparkSpec {

  test("PlanLint: clean codegen plan is empty; planted HOF and " +
      "from_json are named; detector sees through AQE") {
    val s = spark
    // a Range source, not a local relation: ConvertToLocalRelation
    // constant-folds projections over literal rows and the lint would
    // (correctly) see nothing
    val df = s.range(3).select(col("id"),
      array(col("id"), col("id") + 1).as("xs"),
      concat(lit("""{"a":"""), col("id"), lit("}")).as("js"))

    // arithmetic/string projections stay inside whole-stage codegen
    val clean = df.select((col("id") * 2).as("x"),
      length(col("js")).as("n"))
    assert(PlanLint.interpreted(clean.queryExecution.executedPlan)
      .isEmpty, "clean plan must lint empty")

    // a higher-order function is interpreted per row — the exact class
    // that shipped the round-13 close cliff
    val hof = df.select(transform(col("xs"), x => x + 1).as("y"))
    val f1 = PlanLint.interpreted(hof.queryExecution.executedPlan)
    assert(f1.contains("ArrayTransform"), s"got $f1")

    // from_json is CodegenFallback (the json-family creep suspect)
    val js = df.select(
      from_json(col("js"), StructType.fromDDL("a INT")).as("o"))
    val f2 = PlanLint.interpreted(js.queryExecution.executedPlan)
    assert(f2.contains("JsonToStructs"), s"got $f2")

    // through AQE: a shuffle forces an AdaptiveSparkPlanExec wrapper
    // (leaf node — the detector must unwrap to reach the real tree)
    val agg = df.groupBy(col("id"))
      .agg(sum(aggregate(col("xs"), lit(0L), (a, x) => a + x)).as("t"))
    agg.write.format("noop").mode("overwrite").save()
    val f3 = PlanLint.interpreted(agg.queryExecution.executedPlan)
    assert(f3.contains("ArrayAggregate"), s"got $f3")
  }

  test("Bench.InterpretedWhitelist names only registered gates") {
    val names = queries.Registry.all.map(_.name).toSet ++
      Set("q_stream_bloomdedup", "q_stream_neardup",
        "q_stream_textindex", "q_stream_paradedup")
    val unknown = Bench.InterpretedWhitelist.keySet.filterNot(names)
    assert(unknown.isEmpty, s"whitelist entries for unknown gates: " +
      s"${unknown.mkString(", ")}")
  }
}
