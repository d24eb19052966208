package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Shared lineage tooling + one index-candidate shape for the
  * marker-routing rules ([[TextMatchRoute]], [[JsonIndexRoute]]). */
object MarkerRoute {

  /** Trace an attribute's lineage down to the leaf relation that produces
    * it: follows pass-through nodes and Project aliases of plain column
    * references; returns the leaf + the column's ordinal there. None for
    * computed columns (an index over raw data doesn't answer for a
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

  /** One covering-index candidate, reduced to what the routing skeleton
    * needs: the indexed column's identity (leaf relation + ordinal), the
    * probe id column's identity, a compile function from the marker's
    * query string to the matching single-column id DataFrame, and the
    * registered id universe (distinct ids of the indexed frame) — the
    * complement base for NOT routing, exactly the universe the in-grammar
    * NOT already consults inside compile. */
  final case class Candidate(colName: String, idCol: String,
                             sourceLeaf: LogicalPlan, colOrd: Int, idOrd: Int,
                             compile: String => DataFrame,
                             universe: DataFrame)
}

/** The routing skeleton both marker rules share: routable filter
  * conjuncts — AND/OR/NOT trees whose LEAVES are all covered markers
  * probing the same id column — compile to posting-set algebra (AND =
  * keyed semi-join of id sets, OR = id-set union, NOT = anti-join
  * against the registered id universe; the reference's bitmap AND/OR/
  * ANDNOT in its filter operators) and probe ONE combined id set with a
  * single LEFT SEMI join. NOT over a sub-TREE is pushed to the leaves in
  * set space (De Morgan — sound in Kleene logic, and the marker leaves
  * are two-valued: their per-row lowerings collapse NULL input to false,
  * matching "absent from the postings", so set complement against the
  * universe is EXACTLY the per-row negation). Markers with no covering
  * index or mixed with non-marker predicates lower to the per-row
  * expression tree, which fuses into the scan.
  *
  * Subclasses supply the marker type, its probed column + query string,
  * the per-row lowering, and the live index candidates — everything
  * else (lineage-bound resolution, tree compilation, semi-join
  * injection) lives here exactly once. */
abstract class MarkerRoute[M <: Expression](implicit
    ct: scala.reflect.ClassTag[M]) extends Rule[LogicalPlan] {

  /** The marker's probed column expression. */
  protected def markerColumn(m: M): Expression
  /** The marker's query / predicate string. */
  protected def markerQuery(m: M): String
  /** ANALYSIS-time per-row lowering of one marker: a Column-built
    * fragment with unresolved function invocations — the analyzer
    * iterations after this rule resolve them. (An optimizer placement
    * would hand the executor unresolved expressions.) */
  protected def perRow(m: M): Expression
  /** Live covering-index candidates (read per rule firing — catalogs
    * are session-mutable). */
  protected def candidates: List[MarkerRoute.Candidate]

  private def asMarker(e: Expression): Option[M] = e match {
    case m if ct.runtimeClass.isInstance(m) => Some(m.asInstanceOf[M])
    case _ => None
  }

  private def isMarker(e: Expression): Boolean =
    ct.runtimeClass.isInstance(e)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def lowerNested(e: Expression): Expression = e.transform {
    case m if ct.runtimeClass.isInstance(m) => perRow(m.asInstanceOf[M])
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case Filter(cond, child) if child.resolved && cond.exists(isMarker) =>
      // Bind one marker by lineage, not by name: the marker's column must
      // trace (through aliases/projections) to the same leaf relation +
      // ordinal the index was registered over, and the id column in the
      // plan's output must trace to that leaf's id ordinal. A different
      // table with identically-named columns falls through to per-row
      // lowering.
      def resolve(m: M): Option[(MarkerRoute.Candidate, Attribute)] =
        markerColumn(m) match {
          case a: AttributeReference =>
            candidates.iterator.flatMap { e =>
              if (a.name != e.colName) Iterator.empty
              else MarkerRoute.traceToLeaf(child, a.exprId) match {
                case Some((l, ord)) if ord == e.colOrd &&
                    l.sameResult(e.sourceLeaf) =>
                  child.output.iterator.filter(o => o.name == e.idCol &&
                    MarkerRoute.traceToLeaf(child, o.exprId).exists {
                      case (l2, o2) => (l2 eq l) && o2 == e.idOrd })
                    .map(idAttr => (e, idAttr))
                case _ => Iterator.empty
              }
            }.nextOption()
          case _ => None
        }
      // compile an AND/OR/NOT tree of markers into one id set (set
      // algebra over the postings); None when any leaf is unresolvable
      // or not a marker — those trees keep per-row semantics. NOT at
      // ANY tree level is ONE complement of the inner set against the
      // registered universe (threaded through the fold — never one
      // universe scan per negated leaf, which a leaf-level De Morgan
      // push would cost). Sound because the marker leaves are
      // two-valued (NULL input ≡ no posting ≡ false) and every probe
      // row's id lies in the universe, so complement-of-matches is
      // exactly the per-row negation — in classical logic over
      // two-valued leaves, which Kleene three-valued logic collapses
      // to.
      //
      // Marker-OR-ordinary disjunctions (the reference's
      // OrFilterOperator unioning a bitmap child with a scan child,
      // pinot-core/…/operator/filter/OrFilterOperator.java): an OR leg
      // with NO markers at all contributes ids(σ residual over the
      // probe child) — the residual filter stays a pushable scan
      // predicate on its own branch, and the union joins the posting
      // set in id space. Positive positions only: under a routed NOT
      // the complement of a three-valued residual would admit
      // NULL-valued rows that per-row NOT(unknown) drops, so mixed
      // trees under NOT fall back per-row (allowResidual=false).
      //
      // ID-UNIQUENESS CONTRACT: routing evaluates the whole disjunction
      // as a semi-join on the probe id column, so the id must be a
      // row-unique key of the probe child. Marker predicates are
      // functionally determined by the id (the postings ARE keyed by
      // it), but an arbitrary residual predicate is not: with duplicate
      // ids, a row failing BOTH legs would survive because a same-id
      // sibling satisfies the residual. This matches the
      // index-registration contract (candidates register a key column);
      // registering a non-unique id column is out of contract for
      // residual routing.
      def residualIds(e: Expression, idAttr: Attribute)
      : Option[DataFrame] =
        if (e.exists(isMarker) || !e.deterministic ||
            e.exists(_.isInstanceOf[PlanExpression[_]])) None
        else Some(org.apache.spark.sql.graft.PlanBridge.ofRows(
          org.apache.spark.sql.SparkSession.active,
          Project(Seq(idAttr), Filter(e, child))).distinct())
      def treeIds(e: Expression, allowResidual: Boolean = true)
      : Option[(DataFrame, Attribute, DataFrame)] = e match {
        case m if isMarker(m) =>
          asMarker(m).flatMap(mm => resolve(mm).map { case (en, idAttr) =>
            (en.compile(markerQuery(mm)).toDF(idAttr.name), idAttr,
              en.universe.toDF(idAttr.name))
          })
        // FRESHNESS CONTRACT of the complement: the postings must cover
        // every id in the registered universe. Under positive routing a
        // stale persisted index merely misses late rows (false
        // negatives); under NOT, an id the index never saw falls into
        // the complement even when the row matches the negated term —
        // staleness becomes false POSITIVES. Candidates therefore must
        // register universe and postings from the same snapshot (the
        // catalogs here derive both from the registered frame; a
        // persisted-index registration must pair the on-disk postings
        // with the ids they were built over, not a live re-read).
        case Not(x) =>
          treeIds(x, allowResidual = false).map { case (dx, ax, u) =>
            (u.join(dx, Seq(ax.name), "left_anti"), ax, u)
          }
        case And(l, r) =>
          for { (dl, al, ul) <- treeIds(l, allowResidual)
                (dr, ar, _) <- treeIds(r, allowResidual)
                if al.exprId == ar.exprId }
            yield (dl.join(dr, Seq(al.name), "left_semi"), al, ul)
        case Or(l, r) =>
          (treeIds(l, allowResidual), treeIds(r, allowResidual)) match {
            case (Some((dl, al, ul)), Some((dr, ar, _)))
                if al.exprId == ar.exprId =>
              Some((dl.unionByName(dr).distinct(), al, ul))
            case (Some((dl, al, ul)), None) if allowResidual =>
              residualIds(r, al).map(dr =>
                (dl.unionByName(dr).distinct(), al, ul))
            case (None, Some((dr, ar, ur))) if allowResidual =>
              residualIds(l, ar).map(dl =>
                (dl.unionByName(dr).distinct(), ar, ur))
            case _ => None
          }
        case _ => None
      }
      val parts = conjuncts(cond).map { c =>
        (c, if (c.exists(isMarker)) treeIds(c) else None)
      }
      val rest = parts.collect { case (c, None) => lowerNested(c) }
      var base: LogicalPlan =
        if (rest.isEmpty) child else Filter(rest.reduce(And), child)
      parts.foreach {
        case (_, Some((ids, idAttr, _))) =>
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
      other.transformExpressions {
        case m if ct.runtimeClass.isInstance(m) => perRow(m.asInstanceOf[M])
      }
  }
}
