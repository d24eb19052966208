package graft.sql

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Per-statement query options BOUND INTO THE PLAN at parse time.
  *
  * The reference's query options are strictly statement-scoped: the broker
  * carries them alongside the compiled query (`QueryContext#getQueryOptions`),
  * so two in-flight queries never see each other's options. Landing them
  * only as session confs (`spark.graft.option.*`) almost replicates that —
  * but Spark evaluates lazily, so an optimize-time rule consulting the conf
  * sees the LATEST parsed statement's options, not those of the statement
  * that built the DataFrame (round-6 documented divergence). This node
  * closes the gap: the parser wraps each option-bearing statement's plan in
  * a [[GraftOptionsNode]], optimize-time consumers ([[graft.rules.StarTreeRoute]])
  * read the nearest marker with the conf as DataFrame-API fallback, and
  * [[GraftOptionsStrategy]] erases the marker at physical planning.
  *
  * The marker survives the whole optimizer (erasing it mid-fixed-point
  * would re-expose the conf race on the next rule iteration) and sits at
  * the statement ROOT, so it never blocks pushdown/pruning below it. */
case class GraftOptionsNode(child: LogicalPlan,
                            options: Map[String, String]) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : GraftOptionsNode = copy(child = newChild)
}

object GraftOptionsNode {
  /** Wrap a parsed statement's plan with its options. Commands (DDL,
    * SET, …) execute eagerly through their own node types and never reach
    * optimize-time consumers — left unwrapped. */
  def bind(plan: LogicalPlan, options: Map[String, String]): LogicalPlan =
    if (options.isEmpty || plan.isInstanceOf[Command]) plan
    else GraftOptionsNode(plan, options)

  /** The options bound to `plan`'s statement, if any (outermost marker). */
  def boundIn(plan: LogicalPlan): Option[Map[String, String]] =
    plan.collectFirst { case g: GraftOptionsNode => g.options }
}

/** Physical planning erases the marker — by here every optimize-time
  * consumer has read it; the child plans as if the node never existed. */
object GraftOptionsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GraftOptionsNode => planLater(g.child) :: Nil
    case _ => Nil
  }
}
