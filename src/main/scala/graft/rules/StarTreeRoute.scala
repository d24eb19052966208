package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Star-tree plan routing (SURVEY §4.3; reference
  * `AggregationPlanNode.java:133-140` swaps the star-tree executor into the
  * per-segment plan when `StarTreeUtils.isFitForStarTree` — the query's
  * filter+agg columns fit a materialized tree).
  *
  * Spark analog: a registered summary table (built by `StarTree.build`,
  * materialized to parquet) answers fitting aggregates over the fact scan.
  * This rule rewrites `Aggregate(dims ⊆ summaryDims, {sum/min/max/count}
  * over summary metrics, Scan(factPath))` to the same aggregate over the
  * summary relation — |summary| ≪ |facts| I/O, same results (metrics are
  * mergeable partials). Conservative fit test: no filters, plain attribute
  * groupings, only re-aggregable functions, every metric pre-computed.
  * Output attribute ids and types are preserved exactly (optimizer rules
  * must not change plan schema). */
object StarTreeCatalog {
  final case class Entry(factPaths: Set[String], dims: Set[String],
                         summary: DataFrame)
  @volatile private var entries: List[Entry] = Nil
  /** Register a materialized summary for a fact table's file paths. */
  def register(factPaths: Set[String], dims: Set[String],
               summary: DataFrame): Unit =
    entries = Entry(factPaths, dims, summary) :: entries
  def clear(): Unit = entries = Nil
  def all: List[Entry] = entries
}

case class StarTreeRoute(dummy: Boolean = true) extends Rule[LogicalPlan] {

  private def scanPaths(plan: LogicalPlan): Option[Set[String]] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }
    case Project(projectList, child)
      if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanPaths(child)
    case _ => None
  }

  /** The reference's `useStarTree` query option (default true) disables
    * star-tree answering per query. Statement plans carry their options in
    * a [[graft.sql.GraftOptionsNode]] (strictly per-statement, like the
    * reference's QueryContext options); the session conf is the fallback
    * for DataFrame-API plans that never went through the parser. */
  private def starTreeEnabled(plan: LogicalPlan): Boolean =
    graft.sql.GraftOptionsNode.boundIn(plan)
      .flatMap(_.get("useStarTree"))
      .getOrElse(conf.getConfString("spark.graft.option.useStarTree", "true"))
      .equalsIgnoreCase("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    // empty-catalog fast path (round 15): with nothing registered the
    // transform is a guaranteed no-op — skip the whole-plan traversal
    // (and the options lookup) the other ~290 gates would otherwise pay
    // on every optimizer run
    if (StarTreeCatalog.all.isEmpty || !starTreeEnabled(plan)) plan
    else plan transform {
      case agg: Aggregate if scanPaths(agg.child).nonEmpty =>
        val paths = scanPaths(agg.child).get
        StarTreeCatalog.all.find(_.factPaths == paths) match {
          case Some(entry) =>
            tryRoute(agg, agg.groupingExpressions,
              agg.aggregateExpressions, entry).getOrElse(agg)
          case None => agg
        }
    }

  private def tryRoute(agg: Aggregate, groupings: Seq[Expression],
                       aggExprs: Seq[NamedExpression],
                       entry: StarTreeCatalog.Entry): Option[LogicalPlan] = {
    val summaryPlan = entry.summary.queryExecution.analyzed
    val byName = summaryPlan.output.map(a => a.name -> a).toMap

    // groupings: plain attributes, all registered dims with summary twins
    val dimAttrs = groupings.map {
      case a: AttributeReference
        if entry.dims.contains(a.name) && byName.contains(a.name) => a
      case _ => return None
    }

    def metric(prefix: String, col: String): Option[Attribute] =
      byName.get(s"$prefix$col")

    val rewritten = aggExprs.map {
      case a: AttributeReference => // grouping passthrough
        byName.get(a.name) match {
          case Some(s) => Alias(s, a.name)(exprId = a.exprId)
          case None => return None
        }
      case al @ Alias(ae: AggregateExpression, name)
        if !ae.isDistinct && ae.filter.isEmpty =>
        val inner: Option[Expression] = ae.aggregateFunction match {
          case Sum(c: AttributeReference, _) =>
            metric("sum_", c.name).map { s =>
              val re = Sum(s).toAggregateExpression()
              // summing pre-summed decimals widens precision again; cast
              // back so the routed plan's schema matches the original
              if (re.dataType == al.dataType) re
              else Cast(re, al.dataType)
            }
          case Min(c: AttributeReference) =>
            metric("min_", c.name).map(s => Min(s).toAggregateExpression())
          case Max(c: AttributeReference) =>
            metric("max_", c.name).map(s => Max(s).toAggregateExpression())
          case Count(Seq(Literal(_, _))) =>
            // COUNT(*) is non-null 0 on empty input, but SUM(n_rows) would
            // be NULL for an ungrouped aggregate over an empty summary —
            // coalesce to 0 (Literal non-nullable makes Coalesce non-null,
            // preserving the original plan's output nullability)
            byName.get("n_rows").map { s =>
              val summed = Sum(s).toAggregateExpression()
              Coalesce(Seq(
                if (summed.dataType == al.dataType) summed
                else Cast(summed, al.dataType),
                Literal.create(0L, al.dataType)))
            }
          case _ => None
        }
        inner match {
          case Some(e) => Alias(e, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }

    val newGroupings = dimAttrs.map(a => byName(a.name))
    Some(agg.copy(groupingExpressions = newGroupings,
      aggregateExpressions = rewritten, child = summaryPlan))
  }
}
