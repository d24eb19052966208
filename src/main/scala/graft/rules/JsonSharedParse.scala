package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Expression, GetArrayItem, GetJsonObject, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.{JsonExtractMulti, JsonKernels}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** JsonStatementOptimizer analog (reference: pinot-core/.../optimizer/
  * statement/JsonStatementOptimizer.java): a statement extracting N
  * json paths from the same document column should parse the document
  * once per row, not N times — `get_json_object` re-parses per call, so
  * a four-path projection pays 4 full parses per row and a three-
  * predicate JSON_MATCH filter pays 3.
  *
  * Rewrite: within one Project list or Filter condition, every
  * supported `GetJsonObject(doc, path_i)` over the same (canonicalized)
  * doc expression becomes `JsonExtractMulti(doc, paths)[i]` — one
  * shared parse ([[org.apache.spark.sql.graft.JsonKernels]], bit-parity
  * with per-row GetJsonObject fallback).
  *
  * The rewrite is IN PLACE in both node kinds — occurrences become
  * structurally identical JsonExtractMulti subtrees read at different
  * indexes. Sharing is guaranteed by two mechanisms: Project lists get
  * whole-stage-codegen subexpression elimination (one evaluation per
  * row); and for every shape the optimizer can still produce — filter
  * predicates have no subexpression elimination, and plan surgery is
  * not robust here (Spark's late "Pushdown Filters from
  * PartitionPruning" batch re-inlines any alias planted under a
  * Filter one copy per reference; Catalyst's own `With`/
  * RewriteWithExpression batch precedes every extension injection
  * point, so a `With` built by an injected rule reaches codegen
  * unevaluable) — the kernel keeps a per-thread last-row memo: equal
  * path sets on the same row parse once, the other occurrences hit the
  * cache ([[org.apache.spark.sql.graft.JsonKernels]], spec-pinned by a
  * parse counter). Worst case everywhere: one parse per occurrence —
  * never more than the un-rewritten plan. */
case class JsonSharedParse() extends Rule[LogicalPlan] {

  /** canonicalized doc → (original doc expr, ordered distinct supported
    * paths), keeping only groups that actually share (≥2 paths). */
  private def groups(exprs: Seq[Expression])
  : Seq[(Expression, Expression, Seq[String])] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[
      Expression,
      (Expression, scala.collection.mutable.LinkedHashSet[String])]
    exprs.foreach(_.foreach {
      case GetJsonObject(j, Literal(p: UTF8String, StringType))
          if p != null && j.deterministic &&
            JsonKernels.supported(p.toString) =>
        m.getOrElseUpdate(j.canonicalized,
          (j, scala.collection.mutable.LinkedHashSet.empty[String]))
          ._2 += p.toString
      case _ => ()
    })
    m.iterator.collect {
      case (canon, (j, ps)) if ps.size >= 2 => (canon, j, ps.toSeq)
    }.toSeq
  }

  /** Replace the group's GetJsonObject occurrences in `e` with indexed
    * reads of `multi` (the shared array). */
  private def replace(e: Expression, canon: Expression,
                      paths: Seq[String], multi: Expression): Expression =
    e.transform {
      case g @ GetJsonObject(j, Literal(p: UTF8String, StringType))
          if p != null && j.canonicalized == canon =>
        val i = paths.indexOf(p.toString)
        if (i < 0) g
        else GetArrayItem(multi, Literal(i), failOnError = false)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.json.sharedParse", "true")
      .equalsIgnoreCase("true")) plan
    else applyShared(plan)

  private def applyShared(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val gs = groups(Seq(cond))
      if (gs.isEmpty) f
      else Filter(gs.foldLeft(cond) { case (c, (canon, j, paths)) =>
        replace(c, canon, paths, JsonExtractMulti(j, paths))
      }, child)

    case pr @ Project(list, child) =>
      val gs = groups(list)
      if (gs.isEmpty) pr
      else Project(list.map { item =>
        gs.foldLeft(item: Expression) { case (e, (canon, j, paths)) =>
          replace(e, canon, paths, JsonExtractMulti(j, paths))
        }.asInstanceOf[NamedExpression]
      }, child)
  }
}
