package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinot SQL dialect shim (SURVEY §7 step 4).
  *
  * The reference compiles SQL through Calcite's babel parser with a handful
  * of broker-side rewrites (`QueryRewriterFactory.java:36-39`) and dialect
  * quirks. The dialect is layered:
  *
  *  1. FUNCTIONS — DISTINCTCOUNT*, MINMAXRANGE, FIRSTWITHTIME,
  *     TEXT_MATCH, JSON_MATCH, jsonExtractScalar, … are registered in the
  *     session FunctionRegistry ([[graft.GraftExtensions]]); SQL name
  *     resolution is case-insensitive, so they parse with arbitrary
  *     nested arguments — no string surgery, no nested-paren hazards.
  *  2. AST — PERCENTILE's 0-100 fraction, IN_SUBQUERY lowering (its
  *     argument IS a SQL string, parsed recursively — the outer parse has
  *     already unescaped doubled quotes, so nested literals survive), and
  *     the default LIMIT 10 are parse-tree rewrites ([[PinotAst]]),
  *     applied by [[PinotParser]] when `spark.graft.sql.dialect=pinot`,
  *     or by [[sql]] directly. No string-level surgery remains.
  *  3. PLAN ROUTE — GAPFILL selections compile onto the
  *     [[graft.operators.Gapfill]] spine+window plan, not SQL at all. */
object PinotSql {

  // Trailing `OPTION(k1=v1, k2=v2)` clauses (reference
  // `CalciteSqlParser.java:87-88` OPTIONS_REGEX_PATTEN — extracted and
  // removed before Calcite parses; `extractOptionsMap`).
  private val OptionRe =
    "(?is)\\s*option\\s*\\(([^)]+)\\)\\s*;?\\s*\\z".r
  // Leading `SET key = value;` statements — the modern options form the
  // reference splits out of the statement list
  // (`CalciteSqlParser.extractSqlNodeAndOptions`, SqlSetOption nodes).
  private val SetRe =
    "(?is)\\A\\s*set\\s+(\\w+)\\s*=\\s*('[^']*'|[^;\\s]+)\\s*;".r

  /** Strip trailing OPTION(...) clauses (several stack, like the
    * reference's replaceAll) and leading `SET k=v;` statements; return
    * (clean sql, options map). */
  private[sql] def extractOptions(sql: String)
  : (String, Map[String, String]) = {
    var clean = sql
    var opts = Map.empty[String, String]
    var found = true
    while (found) OptionRe.findFirstMatchIn(clean) match {
      case Some(m) =>
        opts ++= m.group(1).split(",").iterator.map(_.trim)
          .filter(_.nonEmpty).map { kv =>
            val eq = kv.indexOf('=')
            require(eq > 0, s"bad OPTION entry '$kv' in: $sql")
            kv.take(eq).trim -> kv.drop(eq + 1).trim.stripPrefix("'")
              .stripSuffix("'")
          }
        clean = clean.substring(0, m.start)
      case None => found = false
    }
    found = true
    while (found) SetRe.findFirstMatchIn(clean) match {
      case Some(m) =>
        opts += m.group(1) ->
          m.group(2).stripPrefix("'").stripSuffix("'")
        clean = clean.substring(m.end)
      case None => found = false
    }
    (clean, opts)
  }

  private val OptionConfPrefix = "spark.graft.option."

  /** Query options land as session confs under `spark.graft.option.<k>`
    * where plan rules consult them — `useStarTree=false` gates
    * [[graft.rules.StarTreeRoute]] exactly like the reference's query
    * option gates `StarTreeUtils.isFitForStarTree`. Each statement starts
    * from defaults: stale `spark.graft.option.*` keys are cleared before
    * this statement's options apply, so a parsed-but-never-run or failed
    * query can't flip behavior for its successors (the reference's options
    * are strictly per-query). The conf is the DataFrame-API fallback only:
    * statement plans ALSO carry their options in a [[GraftOptionsNode]],
    * so optimize-time rules see the options of the statement that built
    * the DataFrame regardless of what parsed since (the round-6
    * lazy-evaluation divergence is closed). */
  private[sql] def applyOptions(conf: org.apache.spark.sql.internal.SQLConf,
                                opts: Map[String, String]): Unit = {
    conf.getAllConfs.keysIterator
      .filter(_.startsWith(OptionConfPrefix)).toList
      .foreach(conf.unsetConf)
    opts.foreach { case (k, v) => conf.setConfString(OptionConfPrefix + k, v) }
  }

  /** Run a Pinot-dialect query against registered temp views, regardless
    * of the session dialect conf. GAPFILL selections route to the
    * [[graft.operators.Gapfill]] plan; everything else parses through the
    * delegate parser and gets the [[PinotAst]] rewrites exactly once. */
  def sql(spark: SparkSession, pinotSql: String): DataFrame = {
    val (clean, opts) = extractOptions(pinotSql)
    applyOptions(spark.sessionState.conf, opts)
    // a statement that is ONLY options (`SET k=v;`, bare OPTION(...)) has
    // no query left — the options applied; return an empty result rather
    // than parsing ""
    if (clean.trim.isEmpty) return spark.emptyDataFrame
    gapfillPlan(spark, clean).getOrElse {
      val plan = spark.sessionState.sqlParser match {
        // options were extracted+applied above — parse the clean text
        // without re-running option handling (which resets stale keys).
        // With the graft extensions installed (PinotParser present ⇒
        // GraftOptionsStrategy injected) options ALSO bind into the plan,
        // fixing the lazy-evaluation divergence; the plain-session path
        // keeps conf-only semantics (no strategy to erase the marker).
        case p: PinotParser => GraftOptionsNode.bind(p.parseClean(clean), opts)
        case p => PinotAst.rewrite(p.parsePlan(clean))
      }
      org.apache.spark.sql.graft.PlanBridge.ofRows(spark, plan)
    }
  }

  // GAPFILL(bucketCol, 'start', 'end', stepSec), key..., FILL(col,
  // 'FILL_PREVIOUS_VALUE' | 'FILL_DEFAULT_VALUE'[, default])... FROM table
  // — the canonical single-table shape of the reference's gapfill SQL
  // (GapfillUtils/GapfillProcessor), routed onto the spine+window plan.
  private val GapfillRe =
    ("(?is)^\\s*SELECT\\s+GAPFILL\\(\\s*([\\w.]+)\\s*,\\s*'([^']+)'\\s*," +
      "\\s*'([^']+)'\\s*,\\s*(\\d+)\\s*\\)\\s*,(.*?)\\s+FROM\\s+([\\w.]+)" +
      "\\s*$").r
  private val FillRe =
    "(?i)^FILL\\(\\s*([\\w.]+)\\s*,\\s*'FILL_(PREVIOUS_VALUE|DEFAULT_VALUE)'\\s*(?:,\\s*([^)]+))?\\)$".r

  /** Split on top-level commas (FILL(...) args keep their commas). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  private def gapfillPlan(spark: SparkSession, pinotSql: String)
  : Option[DataFrame] = pinotSql match {
    case GapfillRe(bucketCol, start, end, stepSec, items, table) =>
      import graft.operators.Gapfill
      import org.apache.spark.sql.functions.{expr, lit}
      val (fills, keys) = splitTop(items).partition(
        _.toUpperCase.startsWith("FILL("))
      val fillModes = fills.map {
        // the regex is (?i): normalize the captured mode before matching
        case FillRe(c, mode, d) => mode.toUpperCase match {
          case "PREVIOUS_VALUE" => c -> Gapfill.FillPrevious
          case "DEFAULT_VALUE" =>
            c -> Gapfill.FillDefault(if (d == null) lit(null) else expr(d))
          case other =>
            throw new IllegalArgumentException(s"bad FILL mode: $other")
        }
        case other =>
          throw new IllegalArgumentException(s"bad FILL spec: $other")
      }.toMap
      Some(Gapfill.gapfill(spark.table(table), bucketCol, keys,
        java.sql.Timestamp.valueOf(start), java.sql.Timestamp.valueOf(end),
        stepSec.toLong, fillModes))
    case _ => None
  }
}
