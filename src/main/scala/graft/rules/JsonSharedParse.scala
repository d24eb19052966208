package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GetArrayItem, GetJsonObject, Literal, NamedExpression}
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
  * Sharing mechanism differs by node, deliberately:
  *  - Project: the rewritten items reference STRUCTURALLY IDENTICAL
  *    JsonExtractMulti subtrees; (whole-stage codegen and interpreted)
  *    subexpression elimination evaluates one per row. No plan-shape
  *    change, so pushdown/pruning around the Project are untouched.
  *    (Worst case — CSE off — each item still costs exactly one parse,
  *    never more than before.)
  *  - Filter: predicate evaluation has no subexpression elimination, so
  *    the shared parse is planted as an ALIAS in a Project under the
  *    filter and the condition reads the attribute — guaranteed
  *    once-per-row. Registered via injectPreCBORule (NOT the operator-
  *    optimization fixpoint) so this runs after predicate pushdown:
  *    PushPredicateThroughProject would otherwise push the filter back
  *    through the planted Project, re-inlining one full parse per
  *    reference. Catalyst's own `With`/RewriteWithExpression mechanism
  *    is not usable here — its rewrite batch precedes every extension
  *    injection point, so a `With` built by this rule would reach
  *    codegen unevaluable. */
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val gs = groups(Seq(cond))
      if (gs.isEmpty) f
      else {
        val aliases = gs.map { case (_, j, paths) =>
          Alias(JsonExtractMulti(j, paths), "_json_shared")() }
        val newCond = gs.zip(aliases).foldLeft(cond) {
          case (c, ((canon, _, paths), a)) =>
            replace(c, canon, paths, a.toAttribute)
        }
        Project(child.output,
          Filter(newCond, Project(child.output ++ aliases, child)))
      }

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
