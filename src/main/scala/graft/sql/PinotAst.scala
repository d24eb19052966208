package graft.sql

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Divide, EqualTo, Expression, InSubquery, ListQuery, Literal, Not}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{IntegerType, StringType}

/** AST-level Pinot-dialect rewrites (the reference's broker rewriters,
  * `QueryRewriterFactory.java:36-39`, operate on the Calcite parse tree —
  * this is the Spark parse-tree equivalent).
  *
  * Most Pinot-named functions need NO rewriting at all: they are
  * registered in the session FunctionRegistry ([[graft.GraftExtensions]])
  * and SQL function resolution is case-insensitive, so
  * `DISTINCTCOUNT(lower(x))` parses like any function call — nested
  * arguments, string literals with parens, whatever — with zero string
  * surgery. The only transforms left here are the ones that can't be
  * plain registrations:
  *
  *  - `PERCENTILE(x, p)` — collides with Spark's own `percentile`, whose
  *    fraction is in [0,1] while Pinot's is in [0,100]; in the Pinot
  *    dialect the second argument is divided by 100.
  *  - the default `LIMIT 10` (`query.thrift:34`) — a statement-level
  *    property, applied to the parsed plan root.
  */
object PinotAst {
  /** Names whose presence in a non-GROUP-BY projection marks the query as
    * a plain aggregation (single-row result — the reference doesn't apply
    * its default limit there in any meaningful way, and tests pin this). */
  private val AggNames = Set("sum", "count", "min", "max", "avg",
    "distinctcount", "distinctcountbitmap", "distinctcounthll",
    "distinctcountthetasketch", "minmaxrange", "percentile",
    "percentileest", "percentiletdigest", "firstwithtime", "lastwithtime")

  def rewrite(plan: LogicalPlan): LogicalPlan =
    addDefaultLimit(rewriteNested(plan))

  /** The expression-level dialect rewrites (everything except the default
    * LIMIT, which is a top-level-statement property) — also applied to
    * nested parse contexts (views, subquery text). */
  def rewriteNested(plan: LogicalPlan): LogicalPlan =
    rewritePercentile(rewriteInSubquery(plan))

  /** Pinot PERCENTILE's fraction is 0-100; Spark's percentile wants 0-1. */
  private[sql] def rewritePercentile(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case f: UnresolvedFunction
          if f.nameParts.lengthCompare(1) == 0 &&
            f.nameParts.head.equalsIgnoreCase("percentile") &&
            f.arguments.lengthCompare(2) == 0 =>
        f.copy(arguments =
          Seq(f.arguments.head, Divide(f.arguments(1), Literal(100.0))))
    }

  /** `IN_SUBQUERY(col, 'inner sql') = 1|0` → `col [NOT] IN (inner)` — a
    * PARSE-TREE lowering. The reference compiles this broker-side into an
    * IdSet filter (`BaseBrokerRequestHandler.java:813`); here the inner
    * text (which reaches this point as ONE string literal, so doubled
    * single-quotes inside it are already unescaped by the outer parse —
    * the hazard that made the old string splice break on quoted literals)
    * parses with the Catalyst parser and lowers onto [[InSubquery]]. The
    * nested rewrites recurse into the inner plan (it may itself use
    * PERCENTILE or IN_SUBQUERY), but the default LIMIT does not — it
    * would silently truncate the id set. */
  private[sql] def rewriteInSubquery(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // ONLY `= 1` and `= 0` lower (to IN / NOT IN). The reference
      // function yields 1/0, so any other comparand (`= 5`, a typo'd
      // `= 10`) is a constant-false predicate — left unrewritten here so
      // it evaluates (or fails) naturally instead of silently flipping
      // the membership test.
      case EqualTo(f: UnresolvedFunction, Literal(v, IntegerType))
          if isInSubqueryCall(f) && (v == 1 || v == 0) =>
        lowerInSubquery(f, positive = v == 1)
      case EqualTo(Literal(v, IntegerType), f: UnresolvedFunction)
          if isInSubqueryCall(f) && (v == 1 || v == 0) =>
        lowerInSubquery(f, positive = v == 1)
    }

  private def isInSubqueryCall(f: UnresolvedFunction): Boolean =
    f.nameParts.lengthCompare(1) == 0 &&
      f.nameParts.head.equalsIgnoreCase("in_subquery") &&
      f.arguments.lengthCompare(2) == 0

  private def lowerInSubquery(f: UnresolvedFunction, positive: Boolean)
  : Expression = {
    val sqlText = f.arguments(1) match {
      case Literal(s, _: StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"IN_SUBQUERY's second argument must be a SQL string literal, " +
          s"got: ${other.sql}")
    }
    val inner = rewriteNested(CatalystSqlParser.parsePlan(sqlText))
    val in = InSubquery(Seq(f.arguments.head), ListQuery(inner))
    if (positive) in else Not(in)
  }

  /** The reference caps every selection at LIMIT 10 unless an explicit
    * limit is present; aggregations without GROUP BY are left alone.
    * Non-query statements (INSERT INTO … SELECT parses to a
    * ParsedStatement, not a Command, pre-analysis) and CTE/ORDER BY
    * wrappers around an explicit limit or a plain aggregate are all
    * looked through — none of them take a spurious LIMIT 10. */
  private[sql] def addDefaultLimit(plan: LogicalPlan): LogicalPlan =
    plan match {
      case _: Command => plan          // SET / DDL — not a selection
      case _: ParsedStatement => plan  // INSERT INTO … SELECT et al.
      case p if hasExplicitLimit(p) => plan
      case p if isPlainAgg(p) => plan
      case p => Limit(Literal(10), p)
    }

  private def hasExplicitLimit(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit => true
    case w: UnresolvedWith => hasExplicitLimit(w.child)
    case _ => false
  }

  // Pre-analysis, SELECT agg FROM t parses as a Project whose list holds
  // aggregate UnresolvedFunctions (the Aggregate node only appears for
  // explicit GROUP BY or after analysis) — detect by function name,
  // looking through CTE and ORDER BY wrappers.
  private def isPlainAgg(p: LogicalPlan): Boolean = p match {
    case proj: Project => proj.projectList.exists(containsAgg)
    case s: Sort => isPlainAgg(s.child)
    case w: UnresolvedWith => isPlainAgg(w.child)
    case _ => false
  }

  private def containsAgg(e: Expression): Boolean = e.exists {
    case f: UnresolvedFunction =>
      AggNames.contains(f.nameParts.last.toLowerCase)
    case _ => false
  }
}
