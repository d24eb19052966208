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
  * columns carry a TEXT_INDEX). An entry is bound to the relation it was
  * built over: registration traces the text/id columns of the INDEXED
  * DataFrame down to their leaf relation + ordinal, and the route only
  * fires when the query's columns trace to a sameResult leaf at the same
  * ordinals — never to an unrelated table whose columns happen to share
  * names. */
object TextIndexCatalog {
  /** `sourceLeaf` + ordinals locate the indexed columns IN the leaf
    * relation — the identity that survives re-reads (fresh exprIds) of the
    * same table. */
  final case class Entry(textCol: String, idCol: String,
                         posIndex: DataFrame, universe: DataFrame,
                         sourceLeaf: LogicalPlan, textOrd: Int, idOrd: Int,
                         vocab: Option[DataFrame] = None)
  @volatile private var entries: List[Entry] = Nil

  /** Register a positional index built over `indexed`'s `textCol`.
    * `vocab` (optional persisted term dictionary) lets routed
    * prefix/wildcard/fuzzy probes resolve candidate tokens there
    * instead of scanning the postings' distinct tokens. */
  def register(indexed: DataFrame, textCol: String, idCol: String,
               posIndex: DataFrame, universe: DataFrame,
               vocab: Option[DataFrame] = None): Unit = {
    val plan = indexed.queryExecution.analyzed
    val bound = for {
      t <- plan.output.find(_.name == textCol)
      i <- plan.output.find(_.name == idCol)
      lt <- TextMatchRoute.traceToLeaf(plan, t.exprId)
      li <- TextMatchRoute.traceToLeaf(plan, i.exprId)
      if lt._1 eq li._1
    } yield (lt._1, lt._2, li._2)
    val (leaf, tOrd, iOrd) = bound.getOrElse(throw new IllegalArgumentException(
      s"cannot bind index registration: columns '$textCol'/'$idCol' do not " +
        s"trace to one leaf relation of the indexed plan:\n$plan"))
    entries = Entry(textCol, idCol, posIndex, universe, leaf, tOrd, iOrd,
      vocab) :: entries
  }
  def clear(): Unit = entries = Nil
  def all: List[Entry] = entries
}

/** Routes `WHERE text_match(col, '…')` onto the registered postings index:
  * each routable filter conjunct becomes a LEFT SEMI join against the
  * compiled doc-id set (postings lookups + keyed set algebra —
  * [[TextMatch.compile]]), exactly the reference's
  * filter-operator-over-inverted-index plan. At scale the semi-join
  * touches ~|matching postings|, not the corpus text.
  *
  * A routable conjunct is any AND/OR tree whose LEAVES are all covered
  * markers probing the same id column (round 12, same treatment as
  * [[JsonIndexRoute]]): `text_match(a,…) OR text_match(b,…)` compiles to
  * an id-set union, AND to a keyed semi-join — which also makes
  * MULTI-COLUMN trees routable (title-index OR body-index), a shape one
  * Lucene query string cannot express. Markers with no covering index,
  * under NOT, or mixed with non-marker predicates lower to the per-row
  * expression tree, which fuses into the scan (NOT keeps per-row
  * three-valued NULL semantics; the GRAMMAR's own NOT inside one
  * predicate string still routes — [[TextMatch.compile]] answers it
  * with the universe anti-join). */
object TextMatchRoute {
  /** Trace an attribute's lineage down to the leaf relation that produces
    * it: follows pass-through nodes and Project aliases of plain column
    * references; returns the leaf + the column's ordinal there. None for
    * computed columns (an index over raw text doesn't answer for a
    * transformed column) or aggregate/generated outputs. */
  private[graft] def traceToLeaf(plan: LogicalPlan, id: ExprId)
  : Option[(LogicalPlan, Int)] = plan match {
    case l if l.children.isEmpty =>
      val i = l.output.indexWhere(_.exprId == id)
      if (i >= 0) Some((l, i)) else None
    case p: Project =>
      p.projectList.find(_.exprId == id) match {
        case Some(a: Alias) => a.child match {
          case ar: AttributeReference => traceToLeaf(p.child, ar.exprId)
          case _ => None
        }
        case Some(ar: AttributeReference) => traceToLeaf(p.child, ar.exprId)
        case Some(_) => None
        case None => traceToLeaf(p.child, id)
      }
    // pass-through nodes (SubqueryAlias, Filter, Join, Deduplicate, …):
    // the exprId flows unchanged — search the children. Nodes that mint
    // new exprIds (Aggregate/Window aliases, Generate) simply won't find
    // the id below and yield None.
    case other =>
      other.children.iterator
        .flatMap(c => traceToLeaf(c, id).iterator).nextOption()
  }
}

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
      // Bind one marker by lineage, not by name: the marker's column must
      // trace (through aliases/projections) to the same leaf relation +
      // ordinal the index was registered over, and the id column in the
      // plan's output must trace to that leaf's id ordinal. A different
      // table with identically-named columns falls through to per-row
      // lowering.
      def resolve(m: TextMatchMarker)
      : Option[(TextIndexCatalog.Entry, Attribute)] = m.text match {
        case a: AttributeReference =>
          TextIndexCatalog.all.iterator.flatMap { e =>
            if (a.name != e.textCol) Iterator.empty
            else TextMatchRoute.traceToLeaf(child, a.exprId) match {
              case Some((l, ord)) if ord == e.textOrd &&
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
      // compile an AND/OR tree of markers into one id set — same
      // posting-set algebra as JsonIndexRoute (∩ = keyed semi-join,
      // ∪ = union + distinct); None when any leaf is unresolvable,
      // under a NOT, or not a marker
      def treeIds(e: Expression): Option[(DataFrame, Attribute)] = e match {
        case m: TextMatchMarker => resolve(m).map { case (en, idAttr) =>
          (TextMatch.compile(en.posIndex, en.universe, en.idCol,
            TextMatch.parse(m.query), en.vocab).toDF(idAttr.name), idAttr)
        }
        case And(l, r) =>
          for { (dl, al) <- treeIds(l); (dr, ar) <- treeIds(r)
                if al.exprId == ar.exprId }
            yield (dl.join(dr, Seq(al.name), "left_semi"), al)
        case Or(l, r) =>
          for { (dl, al) <- treeIds(l); (dr, ar) <- treeIds(r)
                if al.exprId == ar.exprId }
            yield (dl.unionByName(dr).distinct(), al)
        case _ => None
      }
      val parts = conjuncts(cond).map { c =>
        (c, if (c.exists(isMarker)) treeIds(c) else None)
      }
      val rest = parts.collect { case (c, None) => lowerNested(c) }
      var base: LogicalPlan =
        if (rest.isEmpty) child else Filter(rest.reduce(And), child)
      parts.foreach {
        case (_, Some((ids, idAttr))) =>
          val idsPlan = ids.queryExecution.analyzed
          // fresh output attribute so the injected side can never
          // collide with the probe side's expr ids (self-lineage case)
          val alias = Alias(idsPlan.output.head, idAttr.name)()
          val right = Project(Seq(alias), idsPlan)
          base = Join(base, right, LeftSemi,
            Some(EqualTo(idAttr, alias.toAttribute)), JoinHint.NONE)
        case _ => ()
      }
      base

    // markers outside a filter conjunct (projections, aggregates, …):
    // always per-row
    case other if !other.isInstanceOf[Filter] && other.childrenResolved &&
        other.expressions.exists(_.exists(isMarker)) =>
      other.transformExpressions { case m: TextMatchMarker => perRow(m) }
  }
}
