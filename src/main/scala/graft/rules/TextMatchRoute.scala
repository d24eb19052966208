package graft.rules

import graft.operators.TextMatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftExpressions
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Marker the SQL `text_match` function resolves to. [[TextMatchRoute]]
  * lowers it during optimization — onto the registered postings index when
  * one covers the column (the reference ALWAYS answers TEXT_MATCH from the
  * Lucene index, `TextMatchFilterOperator`), else into the per-row
  * expression tree. Unevaluable: by execution time the rule has always
  * replaced it. */
case class TextMatchMarker(text: Expression, query: String)
    extends UnaryExpression with Unevaluable {
  override def child: Expression = text
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): TextMatchMarker =
    copy(text = c)
}

/** Registered positional text indexes (analog of table index config: which
  * columns carry a TEXT_INDEX). Keyed by text column name; the id column
  * must be present in the query plan for the route to apply. */
object TextIndexCatalog {
  final case class Entry(textCol: String, idCol: String,
                         posIndex: DataFrame, universe: DataFrame)
  @volatile private var entries: List[Entry] = Nil
  def register(textCol: String, idCol: String, posIndex: DataFrame,
               universe: DataFrame): Unit =
    entries = Entry(textCol, idCol, posIndex, universe) :: entries
  def clear(): Unit = entries = Nil
  def all: List[Entry] = entries
}

/** Routes `WHERE text_match(col, '…')` onto the registered postings index:
  * the filter conjunct becomes a LEFT SEMI join against the compiled
  * doc-id set (postings lookups + keyed set algebra — [[TextMatch.compile]]),
  * exactly the reference's filter-operator-over-inverted-index plan. At
  * scale the semi-join touches ~|matching postings|, not the corpus text.
  * Markers with no covering index — or outside a routable filter conjunct
  * (projections, disjunctions) — lower to the per-row expression tree,
  * which fuses into the scan. */
case class TextMatchRoute(dummy: Boolean = true) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def isMarker(e: Expression): Boolean =
    e.isInstanceOf[TextMatchMarker]

  // ANALYSIS-time lowering (injectResolutionRule): the per-row tree is a
  // Column-built fragment with unresolved function invocations — the
  // analyzer iterations that follow this rule resolve them. (An optimizer
  // placement would hand the executor unresolved expressions.)
  private def perRow(m: TextMatchMarker): Expression =
    GraftExpressions.toExpression(TextMatch.columnFor(
      GraftExpressions.asColumn(m.text), m.query))

  private def lowerNested(e: Expression): Expression = e.transform {
    case m: TextMatchMarker => perRow(m)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, child)
        if child.resolved && cond.exists(isMarker) =>
      val (markers, rest0) = conjuncts(cond).partition(isMarker)
      // markers nested under OR/NOT can't semi-join — per-row semantics
      val rest = rest0.map(lowerNested)
      var base: LogicalPlan =
        if (rest.isEmpty) child else Filter(rest.reduce(And), child)
      var leftover: Seq[Expression] = Nil
      markers.foreach { case m @ TextMatchMarker(attr, q) =>
        val entry = attr match {
          case a: AttributeReference => TextIndexCatalog.all.find(e =>
            e.textCol == a.name && child.output.exists(_.name == e.idCol))
          case _ => None
        }
        entry match {
          case Some(e) =>
            val ids = TextMatch.compile(e.posIndex, e.universe, e.idCol,
              TextMatch.parse(q))
            val idsPlan = ids.queryExecution.analyzed
            // fresh output attribute so the injected side can never
            // collide with the probe side's expr ids (self-lineage case)
            val alias = Alias(idsPlan.output.head, e.idCol)()
            val right = Project(Seq(alias), idsPlan)
            val leftId = base.output.find(_.name == e.idCol).get
            base = Join(base, right, LeftSemi,
              Some(EqualTo(leftId, alias.toAttribute)), JoinHint.NONE)
          case None => leftover :+= perRow(m)
        }
      }
      if (leftover.isEmpty) base else Filter(leftover.reduce(And), base)

    // markers outside a filter conjunct (projections, aggregates, …):
    // always per-row
    case other if !other.isInstanceOf[Filter] && other.childrenResolved &&
        other.expressions.exists(_.exists(isMarker)) =>
      other.transformExpressions { case m: TextMatchMarker => perRow(m) }
  }
}
