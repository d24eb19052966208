package graft

/** Every registered query executes end-to-end at sf0.001 (correctness vs
  * the DuckDB oracle is the driver's gate; this guards regressions fast). */
class QueriesSmokeSpec extends SparkSpec {
  queries.Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.run(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
