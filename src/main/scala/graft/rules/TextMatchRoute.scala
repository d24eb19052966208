package graft.rules

import graft.operators.TextMatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
    * `idCol` must be a KEY of the indexed frame (non-null, one row per
    * id — the reference's docId): routing answers by id membership, so
    * duplicate ids would blur rows together and null ids never match a
    * probe join. `vocab` (optional persisted term dictionary) lets
    * routed prefix/wildcard/fuzzy probes resolve candidate tokens there
    * instead of scanning the postings' distinct tokens. */
  def register(indexed: DataFrame, textCol: String, idCol: String,
               posIndex: DataFrame, universe: DataFrame,
               vocab: Option[DataFrame] = None): Unit = {
    val plan = indexed.queryExecution.analyzed
    val bound = for {
      t <- plan.output.find(_.name == textCol)
      i <- plan.output.find(_.name == idCol)
      lt <- MarkerRoute.traceToLeaf(plan, t.exprId)
      li <- MarkerRoute.traceToLeaf(plan, i.exprId)
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

/** Back-compat alias for the lineage tracer's original home (the
  * catalogs and specs historically reached it here). */
object TextMatchRoute {
  private[graft] def traceToLeaf(plan: LogicalPlan, id: ExprId)
  : Option[(LogicalPlan, Int)] = MarkerRoute.traceToLeaf(plan, id)
}

/** Routes `WHERE text_match(col, '…')` onto the registered postings index
  * via the shared [[MarkerRoute]] skeleton: routable AND/OR trees of
  * covered markers compile to posting-set algebra ([[TextMatch.compile]]
  * per leaf; ∩ = keyed semi-join, ∪ = id-set union) and probe one LEFT
  * SEMI id set — exactly the reference's
  * filter-operator-over-inverted-index plan. At scale the semi-join
  * touches ~|matching postings|, not the corpus text. Multi-column trees
  * (title-index OR body-index) route too — a shape one Lucene query
  * string cannot express. NOT routes at BOTH levels with one semantics:
  * the grammar's own NOT inside a predicate string ([[TextMatch.compile]]
  * answers it with the universe anti-join) and a plan-level
  * `NOT text_match(…)` (the skeleton's set complement against the same
  * registered universe). [[TextMatch.columnFor]]'s leaves are two-valued
  * (NULL text ≡ empty doc — the reference stores nulls as the default
  * empty string), so the complement and the per-row negation agree row
  * for row. */
case class TextMatchRoute(dummy: Boolean = true)
    extends MarkerRoute[TextMatchMarker] {

  override protected def markerColumn(m: TextMatchMarker): Expression = m.text
  override protected def markerQuery(m: TextMatchMarker): String = m.query

  override protected def perRow(m: TextMatchMarker): Expression =
    GraftExpressions.toExpression(TextMatch.columnFor(
      GraftExpressions.asColumn(m.text), m.query))

  override protected def candidates: List[MarkerRoute.Candidate] =
    TextIndexCatalog.all.map(e => MarkerRoute.Candidate(
      e.textCol, e.idCol, e.sourceLeaf, e.textOrd, e.idOrd,
      q => TextMatch.compile(e.posIndex, e.universe, e.idCol,
        TextMatch.parse(q), e.vocab), e.universe))
}
