package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StructType}

/** Session-parser extension making the Pinot dialect first-class in
  * `spark.sql(...)` (the reference's broker accepts only its dialect;
  * `sql/QueryCompiler` + `QueryRewriterFactory.java:36-39`).
  *
  * Registered via `SparkSessionExtensions.injectParser` and gated on
  * `SET spark.graft.sql.dialect=pinot` — with the conf unset every query
  * string reaches the delegate untouched, so the extension is a strict
  * no-op for standard Spark SQL (statement-level rewrites must never
  * change semantics of a dialect they weren't asked to parse). Only
  * whole statements (parsePlan/parseQuery) are rewritten; identifiers,
  * types, and expressions keep Spark syntax. */
class PinotParser(delegate: ParserInterface) extends ParserInterface {
  private def dialectOn: Boolean = {
    val dialect =
      try SQLConf.get.getConfString("spark.graft.sql.dialect", "spark")
      catch { case _: Throwable => "spark" }
    dialect.equalsIgnoreCase("pinot")
  }

  /** Pinot-dialect parse, unconditionally: trailing OPTION(...) clauses
    * are extracted into `spark.graft.option.*` confs (the reference
    * strips them before Calcite sees the text), then AST rewrites on the
    * parsed plan ([[PinotAst]] — PERCENTILE fraction, IN_SUBQUERY
    * lowering, default LIMIT). Function names (DISTINCTCOUNT, TEXT_MATCH,
    * …) resolve via the registry, so nested arguments parse natively. */
  def parsePinot(sqlText: String): LogicalPlan = {
    val (clean, opts) = PinotSql.extractOptions(sqlText)
    // per-statement scoping: stale option keys reset before these apply
    PinotSql.applyOptions(SQLConf.get, opts)
    if (clean.trim.isEmpty)
      // options-only statement (`SET k=v;`): nothing left to parse — the
      // options applied; yield an empty no-op relation
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(Nil)
    // options also bind INTO the plan so optimize-time consumers see this
    // statement's options even after later statements parse (GraftOptions)
    else GraftOptionsNode.bind(parseClean(clean), opts)
  }

  /** Parse an option-free statement (options already extracted+applied by
    * the caller — [[PinotSql.sql]]); no conf side effects here. */
  private[sql] def parseClean(clean: String): LogicalPlan =
    PinotAst.rewrite(delegate.parsePlan(clean))

  override def parsePlan(sqlText: String): LogicalPlan =
    if (dialectOn) parsePinot(sqlText) else delegate.parsePlan(sqlText)
  // parseQuery feeds nested contexts (views, subquery text): function +
  // fraction + IN_SUBQUERY rewrites apply, but the default LIMIT is a
  // top-level-statement property and stays out
  override def parseQuery(sqlText: String): LogicalPlan =
    if (dialectOn) PinotAst.rewriteNested(delegate.parseQuery(sqlText))
    else delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
