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
  * table: each routable filter conjunct becomes a LEFT SEMI join against
  * a matching doc-id set ([[JsonIndex.matchIds]] — a pruned postings
  * lookup, one path partition when the index is disk-materialized). At
  * scale the semi-join touches ~|matching postings|, not the json corpus.
  *
  * A routable conjunct is any AND/OR tree whose LEAVES are all
  * json_match markers covered by one index and probing the same id
  * column — the set-algebra compilation the reference's
  * `JsonMatchFilterOperator` does on posting bitmaps (AND = bitmap
  * intersect = keyed semi-join of id sets; OR = bitmap union = id-set
  * union). So `(jm(A) AND jm(B)) OR jm(C)` routes as
  * `(ids(A) ∩ ids(B)) ∪ ids(C)` — one semi-join against the combined
  * set. Markers with no covering index, under NOT, or mixed into a tree
  * with non-marker predicates lower to the per-row jsonpath tree, which
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
      // bind one marker to its covering index entry + the probe-side id
      // attribute (the marker's json column and the entry's id column
      // must trace to the SAME leaf relation the index was built over)
      def resolve(m: JsonMatchMarker)
      : Option[(JsonIndexCatalog.Entry, Attribute)] = m.json match {
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
      // compile an AND/OR tree of markers into one id set (set algebra
      // over the postings); None when any leaf is unresolvable, under a
      // NOT, or not a marker — those trees keep per-row semantics
      def treeIds(e: Expression): Option[(DataFrame, Attribute)] = e match {
        case m: JsonMatchMarker => resolve(m).map { case (en, idAttr) =>
          (JsonIndex.matchIds(en.index, en.universe, en.idCol, m.predicate)
            .toDF(idAttr.name), idAttr)
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
      other.transformExpressions { case m: JsonMatchMarker => perRow(m) }
  }
}
