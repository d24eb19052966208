package graft.rules

import graft.functions.Scalars
import graft.operators.JsonIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftExpressions
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Marker the SQL `json_match` function resolves to. [[JsonIndexRoute]]
  * lowers it during analysis — onto a registered json posting table when
  * one covers the column (the reference always answers JSON_MATCH from the
  * json index, `JsonMatchFilterOperator`), else into the per-row jsonpath
  * predicate tree. Unevaluable: by execution time the rule has always
  * replaced it. */
case class JsonMatchMarker(json: Expression, predicate: String)
    extends UnaryExpression with Unevaluable {
  override def child: Expression = json
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): JsonMatchMarker =
    copy(json = c)
}

/** Registered json posting tables (analog of table index config: which
  * columns carry a JSON index). Entries bind to the leaf relation +
  * ordinals of the indexed plan, exactly like [[TextIndexCatalog]]: a
  * different table — or a computed column — with matching names lowers
  * per-row instead of consulting the wrong index. */
object JsonIndexCatalog {
  final case class Entry(jsonCol: String, idCol: String,
                         index: DataFrame, universe: DataFrame,
                         sourceLeaf: LogicalPlan, jsonOrd: Int, idOrd: Int)
  @volatile private var entries: List[Entry] = Nil

  /** Register a posting table ([[JsonIndex.postings]] shape) built over
    * `indexed`'s `jsonCol`. `universe` = distinct ids (consulted for
    * IS NULL anti-joins). */
  def register(indexed: DataFrame, jsonCol: String, idCol: String,
               index: DataFrame, universe: DataFrame): Unit = {
    val plan = indexed.queryExecution.analyzed
    val bound = for {
      j <- plan.output.find(_.name == jsonCol)
      i <- plan.output.find(_.name == idCol)
      lj <- TextMatchRoute.traceToLeaf(plan, j.exprId)
      li <- TextMatchRoute.traceToLeaf(plan, i.exprId)
      if lj._1 eq li._1
    } yield (lj._1, lj._2, li._2)
    val (leaf, jOrd, iOrd) = bound.getOrElse(throw new IllegalArgumentException(
      s"cannot bind json index registration: columns '$jsonCol'/'$idCol' do " +
        s"not trace to one leaf relation of the indexed plan:\n$plan"))
    entries = Entry(jsonCol, idCol, index, universe, leaf, jOrd, iOrd) ::
      entries
  }
  def clear(): Unit = entries = Nil
  def all: List[Entry] = entries
}

/** Routes `WHERE json_match(col, '…')` onto the registered json posting
  * table: the filter conjunct becomes a LEFT SEMI join against the
  * matching doc-id set ([[JsonIndex.matchIds]] — a pruned postings lookup,
  * one path partition when the index is disk-materialized). At scale the
  * semi-join touches ~|matching postings|, not the json corpus. Markers
  * with no covering index — or outside a routable filter conjunct
  * (projections, disjunctions) — lower to the per-row jsonpath tree, which
  * fuses into the scan. */
case class JsonIndexRoute(dummy: Boolean = true) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def isMarker(e: Expression): Boolean =
    e.isInstanceOf[JsonMatchMarker]

  // analysis-time lowering: the per-row tree is a Column-built fragment —
  // the analyzer iterations after this rule resolve it
  private def perRow(m: JsonMatchMarker): Expression =
    GraftExpressions.toExpression(Scalars.jsonMatch(
      GraftExpressions.asColumn(m.json), m.predicate))

  private def lowerNested(e: Expression): Expression = e.transform {
    case m: JsonMatchMarker => perRow(m)
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
      markers.foreach { case m @ JsonMatchMarker(attr, pred) =>
        val entry = attr match {
          case a: AttributeReference =>
            JsonIndexCatalog.all.iterator.flatMap { e =>
              if (a.name != e.jsonCol) Iterator.empty
              else TextMatchRoute.traceToLeaf(child, a.exprId) match {
                case Some((l, ord)) if ord == e.jsonOrd &&
                    l.sameResult(e.sourceLeaf) =>
                  child.output.iterator.filter(o => o.name == e.idCol &&
                    TextMatchRoute.traceToLeaf(child, o.exprId).exists {
                      case (l2, o2) => (l2 eq l) && o2 == e.idOrd })
                    .map(idAttr => (e, idAttr))
                case _ => Iterator.empty
              }
            }.nextOption()
          case _ => None
        }
        entry match {
          case Some((e, idAttr)) =>
            val ids = JsonIndex.matchIds(e.index, e.universe, e.idCol, pred)
            val idsPlan = ids.queryExecution.analyzed
            // fresh output attribute so the injected side can never
            // collide with the probe side's expr ids (self-lineage case)
            val alias = Alias(idsPlan.output.head, e.idCol)()
            val right = Project(Seq(alias), idsPlan)
            base = Join(base, right, LeftSemi,
              Some(EqualTo(idAttr, alias.toAttribute)), JoinHint.NONE)
          case None => leftover :+= perRow(m)
        }
      }
      if (leftover.isEmpty) base else Filter(leftover.reduce(And), base)

    // markers outside a filter conjunct (projections, aggregates, …):
    // always per-row
    case other if !other.isInstanceOf[Filter] && other.childrenResolved &&
        other.expressions.exists(_.exists(isMarker)) =>
      other.transformExpressions { case m: JsonMatchMarker => perRow(m) }
  }
}
