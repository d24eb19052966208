package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan audit: the properties that decide whether a query survives
  * a 100× scale-up, asserted on the actual plans (not trusted by
  * convention). A query that works at sf0.01 but ships a cartesian product,
  * a full-column scan, or a global sort would pass every value check and
  * still be wrong at 100 TB — these specs are the regression net for that
  * dimension. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String = {
    val q = queries.Registry.all.find(_.name == name)
      .getOrElse(fail(s"no query named $name"))
    q.run(spark, sfDir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
  }

  test("dimension chain joins broadcast; no cartesian products") {
    val p = plan("q_join_inner")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 3, s"customer/nation/region should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("NO query in the registry plans a cartesian product") {
    // the whole inventory: an unbroadcast cross join anywhere is a
    // 100 TB-scale bug regardless of whether the query "passes"
    val offenders = queries.Registry.all.flatMap { q =>
      val p = q.run(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      if (p.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("aggregates are partial-then-final (map-side combine present)") {
    val p = plan("q_agg_tpch_q1")
    // partial + final hash aggregate around one exchange on the group keys
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("Exchange"))
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q_sort_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("filters and projections reach the parquet scan") {
    val p = plan("q_filter_time_range")
    assert(p.contains("PushedFilters: ["), p)
    // column pruning: a two-column projection must not read the wide text
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    val dp = docs.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val readSchema = dp.linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("text"),
      s"projection should prune the text column: $readSchema")
  }

  test("scalar pipelines stay inside whole-stage codegen") {
    Seq("q_scalar_arith", "q_scalar_string", "q_scalar_case_cast",
      "q_text_fingerprint", "q_dedup_simhash").foreach { n =>
      val p = plan(n)
      // formatted mode stars whole-stage-codegen nodes; the projection
      // carrying the scalar work must be starred
      val starredProject = p.linesIterator.exists(l =>
        l.contains("* Project") || l.contains("* HashAggregate"))
      assert(starredProject, s"$n fell out of codegen:\n$p")
    }
  }

  test("windows shuffle once on the partition keys") {
    val p = plan("q_window_partition")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p)
  }
}
