package graft.rules

import graft.functions.Scalars
import graft.operators.JsonIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
    * `indexed`'s `jsonCol`. `idCol` must be a KEY of the indexed frame
    * (non-null, one row per id — the reference's docId): routing
    * answers by id membership. `universe` = distinct ids (consulted
    * for IS NULL and NOT anti-joins). */
  def register(indexed: DataFrame, jsonCol: String, idCol: String,
               index: DataFrame, universe: DataFrame): Unit = {
    val plan = indexed.queryExecution.analyzed
    val bound = for {
      j <- plan.output.find(_.name == jsonCol)
      i <- plan.output.find(_.name == idCol)
      lj <- MarkerRoute.traceToLeaf(plan, j.exprId)
      li <- MarkerRoute.traceToLeaf(plan, i.exprId)
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
  * table via the shared [[MarkerRoute]] skeleton: routable AND/OR trees
  * of covered markers compile to posting-set algebra
  * ([[JsonIndex.matchIds]] per leaf — a pruned postings lookup, one path
  * partition when the index is disk-materialized; AND = bitmap intersect
  * = keyed semi-join of id sets, OR = bitmap union = id-set union, the
  * compilation the reference's `JsonMatchFilterOperator` does on posting
  * bitmaps) and probe one LEFT SEMI id set. So
  * `(jm(A) AND jm(B)) OR jm(C)` routes as `(ids(A) ∩ ids(B)) ∪ ids(C)`.
  * At scale the semi-join touches ~|matching postings|, not the json
  * corpus. */
case class JsonIndexRoute(dummy: Boolean = true)
    extends MarkerRoute[JsonMatchMarker] {

  override protected def markerColumn(m: JsonMatchMarker): Expression = m.json
  override protected def markerQuery(m: JsonMatchMarker): String =
    m.predicate

  override protected def perRow(m: JsonMatchMarker): Expression =
    // two-valued collapse (NULL doc / missing path ⇒ false): matches
    // "no posting row" in the index tier, so a routed NOT (universe
    // anti-join) and the per-row negation agree row for row — the
    // reference's JSON_MATCH is a filter-only construct with exactly
    // these no-posting semantics
    GraftExpressions.toExpression(org.apache.spark.sql.functions.coalesce(
      Scalars.jsonMatch(GraftExpressions.asColumn(m.json), m.predicate),
      org.apache.spark.sql.functions.lit(false)))

  override protected def candidates: List[MarkerRoute.Candidate] =
    JsonIndexCatalog.all.map(e => MarkerRoute.Candidate(
      e.jsonCol, e.idCol, e.sourceLeaf, e.jsonOrd, e.idOrd,
      p => JsonIndex.matchIds(e.index, e.universe, e.idCol, p), e.universe))
}
